package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions.dot

/** Product quantization (PQ) approximate nearest neighbour: vectors are
  * split into m subspaces, each quantized independently against a
  * 16-code sub-codebook, so the corpus compresses to m small codes per
  * vector (m bytes here vs m·sub·8 bytes of raw doubles — the layout
  * that lets billion-vector indexes live in RAM).
  *
  * Scoring is asymmetric-distance (ADC): a dot product decomposes over
  * subspaces, dot(q, x) = Σ_m dot(q_m, x_m), so each query precomputes a
  * 16-entry table of sub-dots per subspace (driver-side — m×16 doubles
  * per query) and corpus scoring is m table lookups per vector: a
  * MAP-ONLY pass over the encoded corpus with the query tables
  * broadcast. No raw vectors are touched at query time; only the
  * candidate top-k rows ever shuffle.
  *
  * Training reuses [[IvfOps.trainCodebook]] per subspace (Lloyd on a
  * sample); encoding is the same literal-codebook argmax as IVF cell
  * assignment, per subspace.
  */
object PqOps {

  import VectorOps.asDouble

  private def emb(s: SparkSession, dir: String): DataFrame = Tables(s, dir, "embeddings")

  final case class PqModel(m: Int, sub: Int, books: Seq[Seq[Seq[Double]]])

  /** Add the `code` column (array of m sub-codes): per subspace, argmax
    * dot against the literal sub-codebook (ties to the lowest code) —
    * map-only, same literal-codebook pattern as IVF cell assignment.
    */
  private[graft] def withCodes(df: DataFrame, model: PqModel): DataFrame = {
    // Per subspace, ONE array-loop argmax over the sub-book literal
    // (see IvfOps.assignLiteral — same r9 codegen-size fix, same
    // ties-to-lowest-code semantics via the (d, -c) struct max).
    val codeCols: Seq[Column] = (0 until model.m).map { mi =>
      val sv = slice(col("v"), mi * model.sub + 1, model.sub)
      val best = array_max(transform(typedlit(model.books(mi)),
        (cv, c) => struct(dot(sv, cv).as("d"), (-c).as("negc"))))
      (-best.getField("negc")).cast("int")
    }
    df.withColumn("code", array(codeCols: _*))
  }

  /** Train ALL subspace codebooks together: each Lloyd iteration is ONE
    * assignment pass + ONE partial-aggregated shuffle keyed by
    * (subspace, code, dim) — not m separate jobs. Driver traffic per
    * iteration is the m×codes×sub codebook (a few KB at any scale).
    * Empty cells keep their previous centroid.
    */
  def train(
      e: DataFrame, m: Int, sub: Int, codes: Int, iters: Int,
      sharedSample: Option[DataFrame] = None): PqModel = {
    // Absolute-size deterministic sample (256 rows per code): constant
    // training cost as the corpus grows — see IvfOps.trainSample. A
    // caller training BOTH a coarse quantizer and PQ codebooks (the
    // composed IVF-PQ index) passes its sample in so the corpus-ranked
    // take runs once, not twice.
    val sample = sharedSample.getOrElse(IvfOps.trainSample(e, 256 * codes))
    val seedVecs = e.filter(col("vec_id") % lit(31) === 0)
      .sort("vec_id").limit(codes)
      .select("v").collect().map(_.getSeq[Double](0)).toSeq
    var model = PqModel(m, sub,
      (0 until m).map(mi => seedVecs.map(_.slice(mi * sub, (mi + 1) * sub))))
    for (_ <- 0 until iters) {
      val mi = (col("pos") / sub).cast("int")
      val updated = withCodes(sample, model)
        .select(col("code"), posexplode(col("v")).as(Seq("pos", "x")))
        .select(
          mi.as("mi"), pmod(col("pos"), lit(sub)).as("subpos"),
          element_at(col("code"), mi + 1).as("c"), col("x"))
        .groupBy("mi", "c", "subpos")
        .agg(avg("x").as("mval"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> r.getDouble(3))
        .toMap
      model = model.copy(books = (0 until m).map { b =>
        (0 until codes).map { c =>
          val prev = model.books(b)(c)
          (0 until sub).map(sp => updated.getOrElse((b, c, sp), prev(sp)))
        }
      })
    }
    model
  }

  /** Map-only PQ encoding: `code` is the array of m small ints — the
    * entire index payload.
    */
  def encode(e: DataFrame, model: PqModel): DataFrame =
    withCodes(e, model).select("vec_id", "code")

  /** Same map-only encoding, keeping the raw vector alongside the code —
    * the row shape the streaming index snapshot stores so re-rank can
    * run without a second table ([[graft.streaming.AnnStream]]).
    */
  def encodeWithVectors(e: DataFrame, model: PqModel): DataFrame =
    withCodes(e, model).select("vec_id", "v", "code")

  /** ADC shortlist + exact re-rank (the production PQ pipeline): query
    * sub-dot tables (computed on the driver from the collected probe
    * vectors — the standard broadcast-the-queries pattern) score the
    * encoded corpus with m array lookups per vector (map-only, raw
    * vectors untouched); the ADC top-`shortlist` candidates per query —
    * the only rows that ever shuffle — are then re-ranked with exact
    * cosine against their raw vectors.
    */
  def pqTopK(s: SparkSession, dir: String, k: Int = 10, shortlist: Int = 50): DataFrame = {
    val m = 8; val sub = 8; val codes = 16
    val e = Eval.barrier(Eval.fanOut(
      emb(s, dir).select(col("vec_id"), asDouble(col("embedding")).as("v")))).cache()
    val model = train(e, m, sub, codes, iters = 2)
    val corpus = withCodes(e, model).select("vec_id", "v", "code")

    val probes = e.filter(col("vec_id") < 10)
      .select(col("vec_id"), col("v")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    searchEncoded(s, corpus, model, probes, k, shortlist)
  }

  /** ADC search over an ALREADY-ENCODED corpus (`vec_id`, `v`, `code`) —
    * the query-time half of the PQ pipeline, shared by the one-shot
    * [[pqTopK]] and the incrementally-maintained streaming index
    * ([[graft.streaming.AnnStream]]): the corpus codes were produced
    * earlier (any batch, any process) by the SAME frozen `model`; this
    * runs scoring + rank + re-rank without touching how the codes came
    * to be — the property that makes incremental index maintenance
    * possible at all.
    */
  /** Per-query ADC lookup tables: for each probe, the m×codes sub-dot
    * table dot(q_m, book_m[c]) — computed on the driver (m×codes doubles
    * per query), the payload every ADC scorer broadcasts.
    */
  private[graft] def queryTables(
      model: PqModel, probes: Seq[(Long, Seq[Double])]): Seq[(Long, Seq[Seq[Double]], Seq[Double])] =
    probes.map { case (qid, qv) =>
      val t: Seq[Seq[Double]] = (0 until model.m).map { mi =>
        val qsub = qv.slice(mi * model.sub, (mi + 1) * model.sub)
        model.books(mi).map(cv => cv.iterator.zip(qsub.iterator).map { case (a, b) => a * b }.sum)
      }
      (qid, t, qv)
    }

  /** The ADC score expression over a `code` column, given the broadcast
    * per-query table column `qt`: m array lookups summed — the map-only
    * kernel of every PQ scan.
    */
  private[graft] def adcScore: Column =
    aggregate(
      zip_with(col("code"), col("qt"), (c, t) => element_at(t, c + 1)),
      lit(0.0), (acc, x) => acc + x)

  def searchEncoded(
      s: SparkSession, corpus: DataFrame, model: PqModel,
      probes: Seq[(Long, Seq[Double])], k: Int = 10, shortlist: Int = 50): DataFrame = {
    import s.implicits._
    val qdf = queryTables(model, probes).toDF("q_id", "qt", "qv")

    // ADC scoring is map-only (query tables broadcast); the shortlist is
    // the two-phase bounded top-k (VectorOps.topKPerQuery), whose partial
    // buffers cap at `shortlist` entries per query per map partition — so
    // the exchange carries partitions × queries × shortlist entries, never
    // the scored corpus. (The previous per-query row_number window moved
    // every scored row through one reducer per query — the 10⁹-row
    // scale-killer this two-phase rank exists to avoid.)
    val adcScored = corpus.crossJoin(broadcast(qdf.select("q_id", "qt")))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("neighbor_id"), adcScore.as("adc"))
    val candidates = VectorOps.topKPerQuery(adcScored, "adc", shortlist).drop("rank")

    // Exact re-rank of the shortlist only: shortlist×queries rows join
    // raw vectors by id; the query vector comes broadcast.
    val reranked = candidates
      .join(corpus.select(col("vec_id").as("neighbor_id"), col("v")), "neighbor_id")
      .join(broadcast(qdf.select("q_id", "qv")), "q_id")
      .select(col("q_id"), col("neighbor_id"),
        round(graft.functions.GraftFunctions.cosineSim(col("qv"), col("v")), 6).as("cosine"))
    VectorOps.topKPerQuery(reranked, "cosine", k)
  }

  def defs: Map[String, QDef] = Map(
    // PQ ANN recall gate, same driver-checkable contract as IVF/LSH:
    // structural booleans + recall-vs-exact floor as hashable output.
    // Measured recall@10 with the 50-candidate shortlist + exact re-rank
    // is ~0.6 at both test scale factors (ADC-only ranks ~0.2-0.3); the
    // 0.3 floor keeps 2× margin while still proving the codes carry
    // real signal (random floor is 10/499 ≈ 2%).
    "ann_pq_topk" -> QDef(
      (s, dir) => {
        // Checkpointed gate frames (VectorOps.gatePairs doc): both are
        // consumed twice; materializing the ≤100-row results truncates
        // the double-planned literal-heavy subtrees.
        val pq = VectorOps.gatePairs(pqTopK(s, dir))
        val brute = VectorOps.gatePairs(VectorOps.bruteTopK(s, dir))
        val hits = pq.join(brute, Seq("q_id", "neighbor_id")).agg(count(lit(1)).as("hits"))
        val shape = pq.groupBy("q_id").agg(count(lit(1)).as("k"))
          .agg(min("k").as("kmin"), max("k").as("kmax"), count(lit(1)).as("nq"))
        brute.agg(count(lit(1)).as("n_exact")).crossJoin(hits).crossJoin(shape)
          .select(
            col("n_exact").cast("long").as("n_exact"),
            (col("kmin") === 10 && col("kmax") === 10 &&
              col("nq") * 10 === col("n_exact")).as("k_ok"),
            (col("hits") >= col("n_exact") * 0.3).as("recall_ok"))
      },
      """SELECT CAST((SELECT COUNT(*) FROM embeddings WHERE vec_id < 10)
        |  * LEAST(10, (SELECT COUNT(*) FROM embeddings) - 1) AS BIGINT) AS n_exact,
        |  true AS k_ok, true AS recall_ok""".stripMargin)
  )
}
