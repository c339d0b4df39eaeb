package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** k-anonymity / l-diversity privacy gate (Sweeney 2002; Machanavajjhala
  * 2007) — the release check a curation pipeline runs before shipping a
  * table whose quasi-identifiers could re-identify people. A row's
  * quasi-identifier group must contain ≥ K members (k-anonymity) and its
  * sensitive attribute must take ≥ L distinct values inside the group
  * (l-diversity, so membership doesn't leak the sensitive value).
  * Groups that fail K are not dropped — they GENERALIZE: the finer
  * quasi-identifier collapses to '*' and members re-aggregate one level
  * up, the standard generalization-lattice step.
  *
  * Realization here: quasi-identifiers (c_nationkey, c_mktsegment),
  * sensitive attribute = account-balance band floor(acctbal/1000)
  * (IEEE-deterministic on both engines: same double input, same
  * quotient, same floor). K=10, L=3.
  *
  * 100 TB posture: two customer-scale partial-mergeable aggregations
  * (the exact grouping, then the re-aggregation of the failing slice)
  * plus one BROADCAST join against the group-scale failing-key list.
  * No windows, no row-level shuffle beyond the group keys.
  *
  * RELEASE-FILTER CONTRACT: this query is an AUDIT, not a release
  * filter — it walks ONE lattice level and emits every group with
  * explicit k_anon / l_diverse flags, so groups that pass K but fail
  * l-diversity, and '*'-generalized groups still under K, appear in
  * the output flagged false. A caller using this as an actual release
  * gate MUST keep only rows where k_anon AND l_diverse (or iterate
  * generalization / suppress the remainder); releasing the flagged
  * rows unfiltered would publish non-anonymous groups.
  */
object PrivacyOps {

  private val K = 10
  private val L = 3

  def defs: Map[String, QDef] = Map(
    "curate_k_anonymity" -> QDef(
      (s, dir) => {
        val c = Tables(s, dir, "customer").select(
          col("c_nationkey").cast("long").as("nat"),
          col("c_mktsegment").as("seg"),
          floor(col("c_acctbal") / lit(1000.0)).cast("long").as("band"))
        val g1 = c.groupBy("nat", "seg")
          .agg(count(lit(1)).as("n"), countDistinct(col("band")).as("lv"))
        val ok = g1.filter(col("n") >= K)
          .select(col("nat"), col("seg").as("seg_out"), col("n"), col("lv"),
            lit(0L).as("gen_level"))
        val failKeys = g1.filter(col("n") < K).select("nat", "seg")
        val gen = c.join(broadcast(failKeys), Seq("nat", "seg"))
          .groupBy("nat")
          .agg(count(lit(1)).as("n"), countDistinct(col("band")).as("lv"))
          .select(col("nat"), lit("*").as("seg_out"), col("n"), col("lv"),
            lit(1L).as("gen_level"))
        ok.unionByName(gen)
          .select(col("nat"), col("seg_out"),
            col("n").cast("long").as("n"),
            col("lv").cast("long").as("l_distinct"),
            col("gen_level"),
            (col("n") >= K).as("k_anon"),
            (col("lv") >= L).as("l_diverse"))
          .orderBy("nat", "seg_out")
      },
      s"""WITH c AS (
        |  SELECT CAST(c_nationkey AS BIGINT) AS nat, c_mktsegment AS seg,
        |         CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS band
        |  FROM customer),
        |g1 AS (
        |  SELECT nat, seg, COUNT(*) AS n, COUNT(DISTINCT band) AS lv
        |  FROM c GROUP BY 1, 2),
        |ok AS (
        |  SELECT nat, seg AS seg_out, n, lv, 0 AS gen_level
        |  FROM g1 WHERE n >= $K),
        |fk AS (SELECT nat, seg FROM g1 WHERE n < $K),
        |gen AS (
        |  SELECT c.nat, '*' AS seg_out, COUNT(*) AS n,
        |         COUNT(DISTINCT band) AS lv, 1 AS gen_level
        |  FROM c JOIN fk ON c.nat = fk.nat AND c.seg = fk.seg
        |  GROUP BY 1),
        |u AS (SELECT * FROM ok UNION ALL SELECT * FROM gen)
        |SELECT nat, seg_out, CAST(n AS BIGINT) AS n,
        |  CAST(lv AS BIGINT) AS l_distinct,
        |  CAST(gen_level AS BIGINT) AS gen_level,
        |  n >= $K AS k_anon, lv >= $L AS l_diverse
        |FROM u ORDER BY nat, seg_out""".stripMargin)
  )
}
