package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: media as opaque `binary` payloads with
  * typed metadata, and batched per-partition feature extraction.
  *
  * The container has no image/audio codecs, so the DECODE STEP IS A
  * DETERMINISTIC STUB: features are per-residue byte sums (position mod
  * 8) of the payload. Everything around it — binary column, metadata
  * schema, partition-iterator batch shape (the Scala analog of a batched
  * pandas UDF), feature-vector schema — is real. A production decoder
  * replaces only the inner loop in [[extract]].
  *
  * Payloads are derived from `documents.text` (UTF-8 bytes) so the stub
  * is byte-for-byte reproducible by the DuckDB oracle via char codes.
  */
object Multimodal {

  final case class MediaFeatures(
      doc_id: Long, mime: String, byte_len: Long,
      f0: Long, f1: Long, f2: Long, f3: Long,
      f4: Long, f5: Long, f6: Long, f7: Long)

  /** STUB decoder: replace this loop with a real codec (image resize,
    * audio frame sample, …). Signature and batch shape are the real
    * contract: one iterator per partition, records streamed through.
    */
  private def extract(id: Long, mime: String, payload: Array[Byte]): MediaFeatures = {
    val f = new Array[Long](8)
    var p = 0
    while (p < payload.length) { f(p % 8) += payload(p) & 0xff; p += 1 }
    MediaFeatures(id, mime, payload.length.toLong, f(0), f(1), f(2), f(3), f(4), f(5), f(6), f(7))
  }

  def features(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Eval.fanOut(
      Tables(s, dir, "documents")
        .select(col("doc_id"), lit("text/plain").as("mime"), encode(col("text"), "UTF-8").as("payload")))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, mime, payload) => extract(id, mime, payload) })
      .toDF()
      .orderBy("doc_id")
  }

  final case class ImageMeta(
      doc_id: Long, mime: String, format: String,
      width: Int, height: Int, byte_len: Long)

  /** REAL decoder for real image payloads: header parse (format +
    * dimensions) via javax.imageio, which ships in the JDK for
    * PNG/JPEG/GIF/BMP. Reads only the header plane — `getWidth(0)` on an
    * ImageReader does NOT decode pixel data, so a 100 MB scan stays a
    * header-sized read per record. Unrecognized payloads degrade to
    * format "unknown" with -1 dimensions instead of failing the batch
    * (a poisoned record must not kill a 100 TB pipeline stage).
    */
  def decodeImage(id: Long, mime: String, payload: Array[Byte]): ImageMeta = {
    import javax.imageio.ImageIO
    val in = ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(payload))
    try {
      val readers = ImageIO.getImageReaders(in)
      if (readers.hasNext) {
        val r = readers.next()
        try {
          r.setInput(in)
          ImageMeta(id, mime, r.getFormatName.toLowerCase,
            r.getWidth(0), r.getHeight(0), payload.length.toLong)
        } finally r.dispose()
      } else ImageMeta(id, mime, "unknown", -1, -1, payload.length.toLong)
    } finally in.close()
  }

  /** Distributed image-metadata extraction over a (doc_id, mime, payload)
    * frame — the same per-partition batch shape as [[features]], with the
    * real codec in the inner loop.
    */
  def imageMeta(s: SparkSession, images: DataFrame): DataFrame = {
    import s.implicits._
    images
      .select(col("doc_id").cast("long"), col("mime").cast("string"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, mime, payload) => decodeImage(id, mime, payload) })
      .toDF()
  }

  final case class AudioMeta(
      doc_id: Long, format: String, channels: Int, sample_rate: Int,
      bits_per_sample: Int, n_samples: Long, duration_ms: Long)

  /** Minimal canonical RIFF/WAVE writer (44-byte header + PCM data) used
    * to synthesize test payloads from document bytes. Little-endian
    * throughout, as the format requires.
    */
  def wavBytes(pcm: Array[Byte], sampleRate: Int = 16000, channels: Short = 1,
      bitsPerSample: Short = 8): Array[Byte] = {
    val blockAlign = (channels * bitsPerSample / 8).toShort
    val bb = java.nio.ByteBuffer
      .allocate(44 + pcm.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + pcm.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels).putInt(sampleRate)
      .putInt(sampleRate * blockAlign).putShort(blockAlign).putShort(bitsPerSample)
      .put("data".getBytes("US-ASCII")).putInt(pcm.length)
      .put(pcm)
    bb.array()
  }

  /** REAL RIFF/WAVE header parser: verifies the RIFF/WAVE magic, then
    * walks the chunk list (word-aligned, unknown chunks skipped) for
    * `fmt ` and `data`, so files with extra LIST/INFO/fact chunks parse
    * correctly — not just our own writer's canonical layout. Reads only
    * chunk headers plus the 16-byte fmt body; the PCM payload is never
    * touched, so cost per record is O(#chunks), not O(bytes). Malformed
    * payloads degrade to format "unknown" with -1 fields (a poisoned
    * record must not kill a 100 TB pipeline stage).
    */
  def decodeWav(id: Long, payload: Array[Byte]): AudioMeta = {
    val bad = AudioMeta(id, "unknown", -1, -1, -1, -1L, -1L)
    if (payload.length < 12) return bad
    val bb = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII")
    }
    if (fourcc() != "RIFF") return bad
    bb.getInt() // declared RIFF size; trust actual buffer bounds instead
    if (fourcc() != "WAVE") return bad
    var channels, sampleRate, bits = -1
    var dataLen = -1L
    var blockAlign = -1
    while (bb.remaining() >= 8 && (dataLen < 0 || channels < 0)) {
      val id4 = fourcc()
      val size = bb.getInt()
      if (size < 0 || size > bb.remaining()) return bad
      // chunks are word-aligned, but a final odd-sized chunk may omit
      // its pad byte — clamp the skip to the buffer end
      val next = math.min(bb.limit(), bb.position() + size + (size & 1))
      id4 match {
        case "fmt " if size >= 16 =>
          bb.getShort() // audio format tag
          channels = bb.getShort().toInt
          sampleRate = bb.getInt()
          bb.getInt() // byte rate
          blockAlign = bb.getShort().toInt
          bits = bb.getShort().toInt
        case "data" =>
          dataLen = size.toLong
        case _ => ()
      }
      bb.position(next)
    }
    if (channels <= 0 || sampleRate <= 0 || blockAlign <= 0 || dataLen < 0) bad
    else {
      val nSamples = dataLen / blockAlign
      AudioMeta(id, "wav", channels, sampleRate, bits, nSamples,
        nSamples * 1000L / sampleRate)
    }
  }

  /** Distributed audio-metadata extraction: same per-partition batch
    * shape as [[imageMeta]], with the RIFF walker in the inner loop.
    */
  def audioMeta(s: SparkSession, audio: DataFrame): DataFrame = {
    import s.implicits._
    audio
      .select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) => decodeWav(id, payload) })
      .toDF()
  }

  final case class MediaFrames(
      doc_id: Long, mime: String, n_frames: Long,
      frame_lens: Seq[Long], thumb: Array[Byte])

  /** STUB frame-sampler + resizer: "frames" are n contiguous payload
    * slices, the "thumbnail" subsamples every k-th byte to 64 bytes. A
    * real codec replaces the slicing; the schema (array of per-frame
    * metadata + fixed-size binary) and per-partition batch shape are the
    * production contract.
    */
  def frames(s: SparkSession, dir: String, n: Int = 4): DataFrame = {
    import s.implicits._
    Eval.fanOut(
      Tables(s, dir, "documents")
        .select(col("doc_id"), lit("video/fake").as("mime"), encode(col("text"), "UTF-8").as("payload")))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, mime, payload) =>
        val L = payload.length
        val lens = (0 until n).map(i => ((L + n - 1 - i) / n).toLong)
        val step = math.max(1, L / 64)
        val thumb = (0 until math.min(64, L)).map(i => payload(i * step)).toArray
        MediaFrames(id, mime, n.toLong, lens, thumb)
      })
      .toDF()
      .orderBy("doc_id")
  }

  /** Driver-comparable projection of [[frames]]: array columns flattened
    * to strings (frame lengths comma-joined, thumbnail hex-encoded) so
    * the result is hashable row-wise and fully oracle-checkable.
    */
  def framesFlat(s: SparkSession, dir: String, n: Int = 4): DataFrame =
    frames(s, dir, n)
      .select(
        col("doc_id"), col("mime"), col("n_frames"),
        array_join(transform(col("frame_lens"), _.cast("string")), ",").as("frame_lens"),
        hex(col("thumb")).as("thumb_hex"))
      .orderBy("doc_id")

  private def oracleFeature(i: Int): String =
    s"CAST(list_sum(list_transform(range(1, LENGTH(text) + 1), " +
      s"p -> CASE WHEN (p - 1) % 8 = $i THEN ascii(text[p]) ELSE 0 END)) AS BIGINT) AS f$i"

  val defs: Map[String, QDef] = Map(
    "mm_features" -> QDef(
      (s, dir) => features(s, dir),
      s"""SELECT doc_id, 'text/plain' AS mime,
         |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
         |  ${(0 to 7).map(oracleFeature).mkString(",\n  ")}
         |FROM documents ORDER BY doc_id""".stripMargin),

    // Audio-metadata plumbing with a REAL codec: payloads are RIFF/WAVE
    // files synthesized from the document bytes (8-bit mono PCM @16kHz),
    // and the query's decode step is the actual chunk-walking header
    // parser — if either the writer or the parser mis-handles the
    // little-endian layout, every oracle row breaks.
    "mm_audio" -> QDef(
      (s, dir) => {
        import s.implicits._
        Eval.fanOut(
          Tables(s, dir, "documents")
            .select(col("doc_id"), encode(col("text"), "UTF-8").as("pcm")))
          .as[(Long, Array[Byte])]
          .mapPartitions(_.map { case (id, pcm) => decodeWav(id, wavBytes(pcm)) })
          .toDF()
          .orderBy("doc_id")
      },
      """SELECT doc_id, 'wav' AS format, CAST(1 AS INT) AS channels,
        |  CAST(16000 AS INT) AS sample_rate, CAST(8 AS INT) AS bits_per_sample,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_samples,
        |  CAST(octet_length(encode(text)) * 1000 // 16000 AS BIGINT) AS duration_ms
        |FROM documents ORDER BY doc_id""".stripMargin),

    // Frame-sampling plumbing (decode stubbed), flattened to scalar
    // columns. The oracle re-derives frame slice lengths and the
    // every-kth-byte thumbnail from the same UTF-8 payload.
    "mm_frames" -> QDef(
      (s, dir) => framesFlat(s, dir),
      """SELECT doc_id, 'video/fake' AS mime, CAST(4 AS BIGINT) AS n_frames,
        |  array_to_string(list_transform(range(0, 4), i -> CAST((L + 3 - i) // 4 AS BIGINT)), ',') AS frame_lens,
        |  upper(array_to_string(list_transform(range(0, least(64, L)),
        |    i -> lpad(to_hex(ascii(text[CAST(i * greatest(1, L // 64) + 1 AS BIGINT)])), 2, '0')), '')) AS thumb_hex
        |FROM (SELECT doc_id, text, CAST(octet_length(encode(text)) AS BIGINT) AS L FROM documents)
        |ORDER BY doc_id""".stripMargin)
  )
}
