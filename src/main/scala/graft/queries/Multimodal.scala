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
