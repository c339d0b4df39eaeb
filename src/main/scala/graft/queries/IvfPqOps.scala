package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions.cosineSim
import graft.queries.PqOps.PqModel

/** IVF-PQ: the composed production ANN index (FAISS's IVFPQ layout,
  * Jégou et al. 2011 "Product Quantization for Nearest Neighbor
  * Search") — a coarse quantizer partitions the corpus into cells AND
  * every vector is product-quantized to m small codes. Queries probe
  * only their `nprobe` nearest cells and score the probed candidates by
  * ADC table lookups (never touching raw vectors), then exact-re-rank
  * the shortlist.
  *
  * Why the composition is THE scale shape: IVF alone rescans full raw
  * vectors inside every probed cell (memory ∝ corpus × dim); PQ alone
  * ADC-scans every code in the corpus (compute ∝ corpus). Composed,
  * query compute is ∝ corpus × nprobe/cells table lookups over m-byte
  * codes — the layout that makes 10⁹-vector indexes fit in RAM and
  * answer in milliseconds.
  *
  * Spark shape: both models are FROZEN driver-side literals (a few KB —
  * the codebook-ships-to-every-executor pattern); cell assignment and PQ
  * encoding are map-only; the probed-cell candidate join broadcasts the
  * queries×nprobe probe table; ADC scoring is map-only; the only
  * corpus-derived exchange is the bounded two-phase top-k whose partial
  * buffers cap at shortlist entries per query per partition. No window,
  * no crossJoin row explosion, anywhere.
  */
object IvfPqOps {

  import VectorOps.asDouble

  private def emb(s: SparkSession, dir: String): DataFrame = Tables(s, dir, "embeddings")

  /** Frozen composed index model: coarse centroids + PQ codebooks. */
  final case class IvfPqModel(cents: Seq[Seq[Double]], pq: PqModel)

  /** Train both stages on the same capped deterministic sample: the
    * coarse quantizer via Lloyd ([[IvfOps.trainCodebook]]) and the PQ
    * sub-codebooks via the joint per-subspace Lloyd ([[PqOps.train]]).
    * Training cost is constant in corpus size (absolute-size sample).
    */
  def train(e: DataFrame, cells: Int, m: Int, sub: Int, codes: Int, iters: Int): IvfPqModel = {
    val seeds: Seq[Seq[Double]] = e.filter(col("vec_id") % lit(29) === 0)
      .sort("vec_id").limit(cells)
      .select("v").collect().map(_.getSeq[Double](0)).toSeq
    val sample = IvfOps.trainSample(e, 256 * math.max(cells, codes))
    val cents = IvfOps.trainCodebook(sample, seeds, iters)
    IvfPqModel(cents, PqOps.train(e, m, sub, codes, iters, sharedSample = Some(sample)))
  }

  /** Map-only composed encoding: each vector gets its coarse cell `cid`
    * (argmax cosine against the literal centroids) AND its PQ `code`
    * array — the full index payload is (vec_id, cid, code); `v` rides
    * along so the exact re-rank needs no second table.
    */
  def encode(vectors: DataFrame, model: IvfPqModel): DataFrame =
    PqOps.withCodes(IvfOps.assignLiteral(vectors, model.cents), model.pq)
      .select("vec_id", "v", "cid", "code")

  /** Query-time half over an ALREADY-ENCODED corpus
    * (`vec_id`, `v`, `cid`, `code`) — shared by the one-shot
    * [[ivfpqTopK]] and the streaming index
    * ([[graft.streaming.AnnStream.ivfpqIndexSink]]). Stored cells and
    * codes pass through untouched (produced earlier against the SAME
    * frozen model).
    *
    * Probe (bounded top-k over cells×queries) → candidate restriction
    * (hash join on `cid` against the broadcast probe table — only
    * nprobe/cells of the corpus survives) → map-only ADC over the codes
    * → bounded top-`shortlist` → exact cosine re-rank of the shortlist
    * only.
    */
  def searchEncodedCells(
      s: SparkSession, corpus: DataFrame, model: IvfPqModel,
      probes: Seq[(Long, Seq[Double])], k: Int = 10, nprobe: Int = 4,
      shortlist: Int = 50): DataFrame = {
    import s.implicits._
    val qs = s.createDataFrame(s.sparkContext.parallelize(probes, 1)).toDF("q_id", "qv")
    val probed = IvfOps.probeCells(s, model.cents, qs, nprobe)
      .select("q_id", "cid")
    val qdf = PqOps.queryTables(model.pq, probes).toDF("q_id", "qt", "qv")

    // Candidate restriction + ADC in one pass: the corpus joins the
    // broadcast (q_id, cid) probe table — a hash join that keeps only
    // probed-cell rows — then the broadcast qt table scores each
    // surviving (candidate, query) pair with m array lookups.
    val adcScored = corpus.join(broadcast(probed), Seq("cid"))
      .join(broadcast(qdf.select("q_id", "qt")), Seq("q_id"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("neighbor_id"), PqOps.adcScore.as("adc"))
    val candidates = VectorOps.topKPerQuery(adcScored, "adc", shortlist).drop("rank")

    val reranked = candidates
      .join(corpus.select(col("vec_id").as("neighbor_id"), col("v")), "neighbor_id")
      .join(broadcast(qdf.select("q_id", "qv")), "q_id")
      .select(col("q_id"), col("neighbor_id"),
        round(cosineSim(col("qv"), col("v")), 6).as("cosine"))
    VectorOps.topKPerQuery(reranked, "cosine", k)
  }

  /** IVF-PQ top-10 per probe query: 16 cells, nprobe=4, m=8 subspaces ×
    * 16 codes, 50-candidate shortlist, exact re-rank.
    */
  def ivfpqTopK(s: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val e = Eval.barrier(Eval.fanOut(
      emb(s, dir).select(col("vec_id"), asDouble(col("embedding")).as("v")))).cache()
    val model = train(e, cells = 16, m = 8, sub = 8, codes = 16, iters = 2)
    val corpus = encode(e, model)
    val probes = e.filter(col("vec_id") < 10)
      .select(col("vec_id"), col("v")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    searchEncodedCells(s, corpus, model, probes, k = k, nprobe = 4, shortlist = 50)
  }

  def defs: Map[String, QDef] = Map(
    // Composed IVF-PQ recall gate — same driver-checkable contract as the
    // single-stage indexes (structure booleans + recall-vs-exact floor as
    // deterministic hashable output). nprobe/cells = 4/16 bounds recall by
    // the IVF stage; within probed cells the PQ shortlist + exact re-rank
    // recovers most of it. Measured recall@10 is 0.47 at sf0.001 and 0.48
    // at sf0.01; the 0.2 floor keeps >2× margin while far above the 2%
    // random floor (and above what random cell probing could deliver).
    "ann_ivfpq_topk" -> QDef(
      (s, dir) => {
        val ivfpq = ivfpqTopK(s, dir).select(col("q_id"), col("neighbor_id"))
        val brute = VectorOps.bruteTopK(s, dir).select(col("q_id"), col("neighbor_id"))
        val hits = ivfpq.join(brute, Seq("q_id", "neighbor_id")).agg(count(lit(1)).as("hits"))
        val shape = ivfpq.groupBy("q_id").agg(count(lit(1)).as("k"))
          .agg(min("k").as("kmin"), max("k").as("kmax"), count(lit(1)).as("nq"))
        brute.agg(count(lit(1)).as("n_exact")).crossJoin(hits).crossJoin(shape)
          .select(
            col("n_exact").cast("long").as("n_exact"),
            (col("kmin") === 10 && col("kmax") === 10 &&
              col("nq") * 10 === col("n_exact")).as("k_ok"),
            (col("hits") >= col("n_exact") * 0.2).as("recall_ok"))
      },
      """SELECT CAST((SELECT COUNT(*) FROM embeddings WHERE vec_id < 10)
        |  * LEAST(10, (SELECT COUNT(*) FROM embeddings) - 1) AS BIGINT) AS n_exact,
        |  true AS k_ok, true AS recall_ok""".stripMargin)
  )
}
