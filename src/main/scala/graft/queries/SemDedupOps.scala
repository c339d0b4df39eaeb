package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** SemDeDup-style semantic deduplication (Abbas et al., 2023: cluster
  * the embedding corpus, then drop all-but-one of every within-cluster
  * ball of near-identical vectors) — here in its fully DETERMINISTIC,
  * oracle-checkable form:
  *
  *  - clusters are 16 Hadamard-sign buckets: bucket = Σ_i 2^i·[w_i·v>0]
  *    with w_i[d] = ±1 by bit i of the dimension index — per-term
  *    products are EXACT double negations quantized to DECIMAL(26,12)
  *    before the sum, so the bucket id is bit-identical on any engine
  *    and any partitioning (a k-means variant trades this replicability
  *    for tighter cells; the LSH-bucket shape is the same one the
  *    dedup/ANN tier already uses);
  *  - within a bucket, a vector is DROPPED iff a SMALLER-id vector sits
  *    within the cosine ball (rounded to 6 dp, τ = 0.45 for this
  *    synthetic corpus — the closest pair sits ≥1e-4 from the
  *    threshold at every SF, far beyond libm-ulp flip range) — the
  *    greedy min-id exemplar rule, deterministic and verifiable
  *    row-for-row.
  *
  * Scale posture: bucket assignment is map-only; the candidate join is
  * bucket-keyed (the LSH-bucket-join shape — never all-pairs across the
  * corpus); the per-dropped-vector witness is a struct-min partial
  * aggregate (bounded map-side state).
  */
object SemDedupOps {

  import VectorOps.asDouble

  private val Tau = 0.45
  private val Planes = 4

  /** Add the Hadamard-sign `bucket` column: per hyperplane i, w_i[d] =
    * +1 when bit i of the dimension index is 0 else −1; each term is an
    * exact double negation quantized to 12-dp DECIMAL, and the per-plane
    * sums run as REAL decimal aggregates over a posexplode (exact and
    * order-independent — a Catalyst array fold would widen the decimal
    * scale away on every step), so the sign (and with it the bucket) is
    * engine- and partitioning-exact.
    */
  private def bucketed(e: DataFrame): DataFrame = {
    val planeAggs = (0 until Planes).map { i =>
      sum(round(col("x") *
          (lit(1) - lit(2) * (shiftright(col("pos"), i) % 2)), 12)
        .cast("decimal(26,12)")).as(s"p$i")
    }
    val sums = e.select(col("vec_id"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("vec_id")
      .agg(planeAggs.head, planeAggs.tail: _*)
      .withColumn("bucket",
        (0 until Planes)
          .map(i => (col(s"p$i") > 0).cast("int") * lit(1 << i))
          .reduce(_ + _))
      .select("vec_id", "bucket")
    e.join(sums, "vec_id")
  }

  val defs: Map[String, QDef] = Map(

    // §2 25id semantic dedup: every dropped vector with its smallest-id
    // within-bucket witness and their cosine — the full takedown list a
    // curation pipeline applies, verified row-for-row by the oracle's
    // identical bucket arithmetic + greedy rule.
    "curate_semdedup" -> QDef(
      (s, dir) => {
        // VALUE-GROUP COLLAPSE first (r14, the skewed-sweep hot-cluster
        // fix — the TextOps.collapseByContent discipline for vectors):
        // verbatim-duplicate vectors share bucket AND pairwise cosine
        // exactly 1.0, so raw within-bucket pairing is quadratic in the
        // duplicate-group size. The cosine kernel runs once per
        // DISTINCT-value pair; the greedy min-id witness rule then
        // reconstructs EXACTLY from rep-level pairs + membership:
        //   - a non-rep member is always dropped (its rep is a
        //     smaller-id identical twin, cosine 1.0 — both engines'
        //     6-dp round of a self-cosine);
        //   - a rep rm qualifies against group B iff cos(rep_B, rm) ≥ τ
        //     and rep_B < id (rep_B is B's min member, so "some member
        //     of B below id" ⟺ rep_B < id, and that member IS rep_B —
        //     the minimal witness candidate from B);
        //   - the reported witness is the min (ida, c) struct over both
        //     sources, as before.
        // Group-by collapse with a precomputed 8-byte xxhash64 leading
        // the key (not a window partitioned by the raw vector): copies
        // collapse map-side before the exchange and full-array
        // hash/compare work only runs on 64-bit-equal candidates, while
        // the exact vector stays in the GROUP key so collisions split,
        // never merge (the TextOps.collapseByContent discipline, r14
        // verdict item).
        val grouped = Tables(s, dir, "embeddings")
          .select(col("vec_id"), asDouble(col("embedding")).as("v"))
          .withColumn("__h", xxhash64(col("v")))
          .groupBy("__h", "v")
          .agg(min("vec_id").as("rep"), collect_list("vec_id").as("ids"))
          .cache()
        val members = grouped.select(col("rep"), explode(col("ids")).as("vec_id"))
        val reps = grouped.select(col("rep").as("vec_id"), col("v"))
        val e = bucketed(reps)
        val a = e.select(col("bucket"), col("vec_id").as("ida"), col("v").as("va"))
        val b = e.select(col("bucket"), col("vec_id").as("idb"), col("v").as("vb"))
        val repPairs = a.join(b, Seq("bucket"))
          .filter(col("ida") < col("idb"))
          .select(col("ida"), col("idb"),
            round(graft.functions.GraftFunctions.cosineSim(col("va"), col("vb")), 6).as("c"))
          .filter(col("c") >= Tau)
        val sym = repPairs.select(col("ida").as("rm"), col("idb").as("rw"), col("c"))
          .unionByName(repPairs.select(col("idb").as("rm"), col("ida").as("rw"), col("c")))
        val cross = members.join(sym, members("rep") === sym("rm"))
          .filter(col("rw") < col("vec_id"))
          .select(col("vec_id").as("dropped_id"), col("rw").as("ida"), col("c"))
        val intra = members.filter(col("vec_id") =!= col("rep"))
          .select(col("vec_id").as("dropped_id"), col("rep").as("ida"),
            lit(1.0).as("c"))
        intra.unionByName(cross)
          .groupBy("dropped_id")
          .agg(min(struct(col("ida"), col("c"))).as("w"))
          .select(col("dropped_id"), col("w.ida").as("witness_id"),
            col("w.c").as("cosine"))
          .orderBy("dropped_id")
      },
      s"""WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |ex AS (
        |  SELECT vec_id, UNNEST(v) AS x, UNNEST(range(0, len(v))) AS d FROM e),
        |bsum AS (
        |  SELECT vec_id,
        |    ${(0 until Planes).map(i =>
             s"""SUM(CAST(ROUND(x * (1 - 2 * ((d >> $i) & 1)), 12) AS DECIMAL(26,12))) AS p$i""")
             .mkString(",\n    ")}
        |  FROM ex GROUP BY vec_id),
        |b AS (
        |  SELECT e.vec_id, e.v,
        |    ${(0 until Planes).map(i =>
             s"(CASE WHEN p$i > 0 THEN ${1 << i} ELSE 0 END)").mkString(" + ")} AS bucket
        |  FROM e JOIN bsum ON e.vec_id = bsum.vec_id),
        |pairs AS (
        |  SELECT y.vec_id AS dropped_id, x.vec_id AS ida,
        |    ROUND(list_cosine_similarity(x.v, y.v), 6) AS c
        |  FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
        |  WHERE ROUND(list_cosine_similarity(x.v, y.v), 6) >= $Tau)
        |SELECT dropped_id, MIN(ida) AS witness_id, arg_min(c, ida) AS cosine
        |FROM pairs GROUP BY dropped_id ORDER BY dropped_id""".stripMargin)
  )
}
