package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions.cosineSim

/** IVF (inverted-file) approximate nearest neighbour: a coarse quantizer
  * partitions the corpus into cells; queries probe only their `nprobe`
  * nearest cells. This is the classic billion-scale ANN layout.
  *
  * The quantizer (seeds → one distributed Lloyd iteration over a sample)
  * produces a tiny centroid table that is COLLECTED TO THE DRIVER and
  * baked into the assignment expression as literal arrays — exactly how a
  * production IVF ships its codebook to every executor. Cell assignment
  * is then a pure map-side argmax (greatest over per-centroid
  * (sim, -cid) structs, ties to the lowest cid): ZERO shuffle over the
  * corpus, no window, no crossJoin row explosion. Only the probed
  * candidates (nprobe/cells of the corpus per query) ever shuffle for the
  * final top-k. At 100 TB the same plan holds — the codebook stays a few
  * KB regardless of corpus size.
  */
object IvfOps {

  import VectorOps.asDouble

  private def emb(s: SparkSession, dir: String): DataFrame = Tables(s, dir, "embeddings")

  /** Map-only nearest-centroid assignment against a literal codebook:
    * adds `cid` (argmax cosine, ties to the lowest id) and `csim` (the
    * winning similarity — the quantizer objective's raw material).
    *
    * ONE array-loop expression over the codebook literal (r9): the
    * previous form unrolled k separate per-centroid struct expressions,
    * and Janino-compiling k × dim-literal trees dominated a training
    * pass at small data; the loop form is O(1) codegen size in k with
    * the identical argmax semantics (struct max ties to the larger
    * negcid = the lower cid).
    */
  private[graft] def assignLiteral(vectors: DataFrame, cents: Seq[Seq[Double]]): DataFrame = {
    val best = array_max(transform(typedlit(cents),
      (c, i) => struct(cosineSim(col("v"), c).as("sim"), (-i).as("negcid"))))
    vectors
      .withColumn("cid", (-best.getField("negcid")).cast("int"))
      .withColumn("csim", best.getField("sim"))
  }

  /** Deterministic ABSOLUTE-size training sample: hash-rank top-n by
    * md5(vec_id) — a TakeOrdered that keeps ≤ n rows per map partition
    * and never shuffles the corpus. An absolute cap (vs the previous
    * 1-in-5 modulus) is what survives scale: at 10⁹ vectors a fractional
    * sample still feeds 2×10⁸ rows into every Lloyd pass, while the
    * quantizer only needs cluster SHAPE — n ≈ 256 × codes is the
    * standard k-means sizing. Cached: each Lloyd iteration re-reads it.
    */
  private[graft] def trainSample(e: DataFrame, n: Int): DataFrame =
    e.sort(md5(col("vec_id").cast("string")), col("vec_id")).limit(n)
      .select("v").cache()

  /** Iterative Lloyd training of a coarse quantizer: assign (map-only
    * against the literal codebook) → re-center (one partial-aggregated
    * shuffle keyed by (cell, dim)) → repeat. Driver traffic per round is
    * the k×dim centroid table — a few KB at any corpus size. Cells that
    * lose every member keep their previous centroid instead of vanishing
    * (k must stay stable for the assignment expression).
    */
  def trainCodebook(sample: DataFrame, seeds: Seq[Seq[Double]], iters: Int): Seq[Seq[Double]] = {
    var cents = seeds
    val d = seeds.head.length
    for (_ <- 0 until iters) {
      val updated = recenter(assignLiteral(sample, cents).select(col("cid"), col("v")), d)
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1))
        .toMap
      cents = cents.indices.map(i => updated.getOrElse(i, cents(i)))
    }
    cents
  }

  /** Mean best-centroid cosine over the sample — the (maximization-form)
    * quantizer objective; Lloyd must not decrease it.
    */
  def quantizerObjective(sample: DataFrame, cents: Seq[Seq[Double]]): Double =
    assignLiteral(sample, cents).agg(avg("csim")).collect()(0).getDouble(0)

  /** One Lloyd iteration: per-(cell, dim) means → new centroid arrays.
    * r16: d per-column means in ONE aggregation keyed by cid (the
    * SpectralOps matvec shape) instead of posexplode → n×d rows → a
    * (cid, pos)-key exchange → collect_list/sort — same per-cell means
    * (double sum/count, the same partial-merge class), one codegen'd
    * stage, no row-explosion.
    */
  private def recenter(assigned: DataFrame, d: Int): DataFrame = {
    val means = (0 until d).map(j => avg(element_at(col("v"), j + 1)).as(s"m$j"))
    assigned.groupBy("cid")
      .agg(means.head, means.tail: _*)
      .select(col("cid"), array((0 until d).map(j => col(s"m$j")): _*).as("cv"))
  }

  /** IVF top-10 per probe query (16 cells, nprobe=2). */
  /** Train the 16-cell quantizer and assign the corpus — the shared
    * index-build half of [[ivfTopK]] and the recall-curve sweep.
    * Returns (assigned corpus, codebook, probe queries).
    */
  private[queries] def trainedCells(
      s: SparkSession, dir: String): (DataFrame, Seq[Seq[Double]], DataFrame) = {
    val k = 16
    val e = Eval.barrier(Eval.fanOut(
      emb(s, dir).select(col("vec_id"), asDouble(col("embedding")).as("v")))).cache()
    // Deterministic seeds spread across the id range; the Lloyd step
    // trains on an absolute-size hash-rank sample (256 rows per cell
    // — constant as the corpus grows; the quantizer needs cluster
    // shape, not every vector).
    val seeds: Seq[Seq[Double]] = e.filter(col("vec_id") % lit(29) === 0)
      .sort("vec_id").limit(k)
      .select("v").collect().map(_.getSeq[Double](0)).toSeq
    val sample = trainSample(e, 256 * k)
    val cents: Seq[Seq[Double]] = trainCodebook(sample, seeds, iters = 2)
    val cells = assignLiteral(e, cents)
    val qs = e.filter(col("vec_id") < 10).select(col("vec_id").as("q_id"), col("v").as("qv"))
    (cells, cents, qs)
  }

  def ivfTopK(s: SparkSession, dir: String): DataFrame = {
    val (cells, cents, qs) = trainedCells(s, dir)
    searchCells(s, cells, cents, qs, k = 10, nprobe = 2)
  }

  /** Probe + score over an ALREADY-ASSIGNED corpus (`vec_id`, `v`, `cid`)
    * — the query-time half of IVF, shared by the one-shot [[ivfTopK]] and
    * the incrementally-maintained streaming index
    * ([[graft.streaming.AnnStream.ivfIndexSink]]). The stored `cid`s were
    * produced earlier (any batch) against the SAME frozen `cents`; this
    * never reassigns them.
    *
    * Probe selection scores every centroid per query (cells×queries rows —
    * tiny) and keeps the `nprobe` best through the SAME two-phase bounded
    * top-k as the final rank — no window anywhere in the ANN tier; the
    * probe rank's tie-break (sim DESC, cid ASC) is identical to the
    * row_number formulation it replaced. Probed-cell candidates are then
    * scored map-side (probes broadcast) and ranked with
    * VectorOps.topKPerQuery: partial buffers cap at k entries per query
    * per partition, so the candidate set itself never crosses an
    * exchange.
    */
  /** Probe selection alone: per query, the `nprobe` nearest cells of the
    * frozen quantizer — (q_id, qv, cid) rows, cells×queries scored (tiny),
    * ranked through the same bounded top-k as everything else in the ANN
    * tier. Shared by plain IVF ([[searchCells]]) and the composed IVF-PQ
    * pipeline ([[IvfPqOps.searchEncodedCells]]).
    */
  private[graft] def probeCells(
      s: SparkSession, cents: Seq[Seq[Double]], qs: DataFrame, nprobe: Int): DataFrame = {
    val centDf = s.createDataFrame(
      s.sparkContext.parallelize(cents.zipWithIndex.map { case (cv, cid) => (cid, cv) }, 1))
      .toDF("cid", "cv")
    val probeScored = qs.crossJoin(broadcast(centDf))
      .select(col("q_id"), col("cid").cast("long").as("neighbor_id"),
        cosineSim(col("qv"), col("cv")).as("sim"))
    VectorOps.topKPerQuery(probeScored, "sim", nprobe)
      .join(broadcast(qs), Seq("q_id"))
      .select(col("q_id"), col("qv"), col("neighbor_id").cast("int").as("cid"))
  }

  def searchCells(
      s: SparkSession, cells: DataFrame, cents: Seq[Seq[Double]],
      qs: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val probed = probeCells(s, cents, qs, nprobe)
    val scored = cells.join(broadcast(probed), Seq("cid"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        round(cosineSim(col("qv"), col("v")), 6).as("cosine"))
    VectorOps.topKPerQuery(scored, "cosine", k)
  }

  def defs: Map[String, QDef] = Map(
    // §2.3#40b IVF ANN: 16 cells, nprobe=2, top-10 per query.
    // Approximate, so no row-level oracle for the neighbor lists; the
    // DRIVER-CHECKABLE gate emits the structural + recall contract vs
    // the exact baseline as deterministic, hashable output (raw top-k:
    // [[ivfTopK]]).
    "ann_ivf_topk" -> QDef(
      (s, dir) => {
        // Checkpointed gate frames (VectorOps.gatePairs doc): both are
        // consumed twice; materializing the ≤100-row results truncates
        // the double-planned literal-heavy subtrees.
        val ivf = VectorOps.gatePairs(ivfTopK(s, dir))
        val brute = VectorOps.gatePairs(VectorOps.bruteTopK(s, dir))
        val hits = ivf.join(brute, Seq("q_id", "neighbor_id")).agg(count(lit(1)).as("hits"))
        val shape = ivf.groupBy("q_id").agg(count(lit(1)).as("k"))
          .agg(min("k").as("kmin"), max("k").as("kmax"), count(lit(1)).as("nq"))
        brute.agg(count(lit(1)).as("n_exact")).crossJoin(hits).crossJoin(shape)
          .select(
            col("n_exact").cast("long").as("n_exact"),
            // Every query must produce a full top-10 from its probed cells.
            (col("kmin") === 10 && col("kmax") === 10 &&
              col("nq") * 10 === col("n_exact")).as("k_ok"),
            // nprobe/cells = 2/16 of the corpus; beating the 12.5% random
            // floor proves probing follows the quantizer.
            (col("hits") >= col("n_exact") * 0.1).as("recall_ok"))
      },
      """SELECT CAST((SELECT COUNT(*) FROM embeddings WHERE vec_id < 10)
        |  * LEAST(10, (SELECT COUNT(*) FROM embeddings) - 1) AS BIGINT) AS n_exact,
        |  true AS k_ok, true AS recall_ok""".stripMargin),

    // §2 25jq ANN recall-vs-budget sweep (the recall/latency frontier
    // readout every ANN deployment tunes against): ONE trained quantizer,
    // searched at nprobe ∈ {1,2,4,8,16}; recall@10 vs the exact baseline
    // is provably MONOTONE in nprobe (probe sets are nested under the
    // deterministic tie-break, and adding candidates to an exact-scored
    // top-k can only gain true neighbors), and at nprobe=16 (all cells)
    // the candidate set IS the corpus, so the sweep must END AT EXACT
    // recall — both facts emitted as hashable booleans per sweep point.
    // The index builds once; each sweep point reuses the assigned cells
    // (at scale: one corpus pass for assignment, then nprobe/cells of
    // the corpus scored per point). The 5-row curve rides one bounded
    // window for the monotonicity lag.
    "ann_ivf_recall_curve" -> QDef(
      (s, dir) => {
        val (cells, cents, qs) = trainedCells(s, dir)
        // Materialize the shared inputs BEFORE the sweep fans out, so
        // concurrent branches read cached blocks instead of racing to
        // compute them (duplicate-materialization churn).
        val cached = cells.cache(); cached.count()
        val brute = VectorOps.bruteTopK(s, dir)
          .select(col("q_id"), col("neighbor_id")).cache()
        brute.count()
        val nExact = brute.agg(count(lit(1)).as("n_exact"))
        // r17: the five sweep points used to ride ONE union plan, with
        // each branch's ivf subtree planned twice (hits join + shape
        // agg) — a ~270 KB physical plan whose planning/codegen, not its
        // trivial compute (≤ corpus × 10 queries of cosine), dominated
        // the key (12.3 s measured, 34 s on a GC-hit run). Guide §3.3:
        // materialize intermediates to truncate huge plans; §2.6:
        // overlap independent jobs. Each point now checkpoints its
        // 100-row top-k (so hits + shape share one computation) and the
        // points run as concurrent driver threads; the final 5-row
        // frame carries identical values through the same window/selects.
        val points = Seq(1, 2, 4, 8, 16).map { np => () =>
          val ivf = searchCells(s, cached, cents, qs, k = 10, nprobe = np)
            .select(col("q_id"), col("neighbor_id")).localCheckpoint()
          ivf.join(brute, Seq("q_id", "neighbor_id"))
            .agg(count(lit(1)).as("hits"))
            .crossJoin(ivf.groupBy("q_id").agg(count(lit(1)).as("kq"))
              .agg(min("kq").as("kmin"), max("kq").as("kmax"),
                count(lit(1)).as("nq")))
            .select(lit(np.toLong).as("nprobe"), col("hits"),
              col("kmin"), col("kmax"), col("nq"))
            .localCheckpoint()
        }
        val pool = java.util.concurrent.Executors.newFixedThreadPool(points.size)
        val perProbe = try {
          points.map(p => pool.submit(
            new java.util.concurrent.Callable[DataFrame] { def call(): DataFrame = p() }))
            .map(_.get()).reduce(_ unionByName _)
        } finally pool.shutdown()
        val w = org.apache.spark.sql.expressions.Window.orderBy("nprobe")
        perProbe.crossJoin(broadcast(nExact))
          .select(col("nprobe"), col("n_exact").cast("long").as("n_exact"),
            (col("kmin") === 10 && col("kmax") === 10 &&
              col("nq") * 10 === col("n_exact")).as("k_ok"),
            (col("hits") >= coalesce(lag("hits", 1).over(w), lit(0L)))
              .as("monotone_ok"),
            (col("nprobe") =!= 16L || col("hits") === col("n_exact"))
              .as("full_ok"))
          .orderBy("nprobe")
      },
      """WITH ne AS (
        |  SELECT CAST((SELECT COUNT(*) FROM embeddings WHERE vec_id < 10)
        |    * LEAST(10, (SELECT COUNT(*) FROM embeddings) - 1) AS BIGINT) AS n_exact)
        |SELECT CAST(nprobe AS BIGINT) AS nprobe, n_exact,
        |  true AS k_ok, true AS monotone_ok, true AS full_ok
        |FROM (SELECT unnest([1, 2, 4, 8, 16]) AS nprobe) CROSS JOIN ne
        |ORDER BY nprobe""".stripMargin)
  )
}
