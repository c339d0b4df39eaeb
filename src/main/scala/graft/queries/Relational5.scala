package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-7 relational surface: ordered-set aggregates (the WITHIN GROUP
  * family) and equi-depth histograms — the two remaining mainstream
  * analytic aggregate shapes after §2's PERCENTILE_CONT (q_percentile)
  * and equi-width histogram (q_histogram).
  */
object Relational5 {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  val defs: Map[String, QDef] = Map(

    // §2 25ff ordered-set aggregates: PERCENTILE_DISC picks actual data
    // elements (the smallest value whose cumulative distribution reaches
    // p), so unlike PERCENTILE_CONT there is no interpolation arithmetic
    // to drift between engines — values land exactly. Spark plans these
    // as regular partial-mergeable aggregates per group.
    "q_percentile_disc" -> QDef(
      (s, dir) =>
        t(s, dir, "customer")
          .groupBy("c_mktsegment")
          .agg(
            expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY c_acctbal)").as("p25"),
            expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY c_acctbal)").as("p50"),
            expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY c_acctbal)").as("p90"),
            count(lit(1)).as("n"))
          .orderBy("c_mktsegment"),
      """SELECT c_mktsegment,
        |  quantile_disc(c_acctbal, 0.25) AS p25,
        |  quantile_disc(c_acctbal, 0.5) AS p50,
        |  quantile_disc(c_acctbal, 0.9) AS p90,
        |  COUNT(*) AS n
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),

    // §2 25if OUTER UNNEST semantics: explode_outer preserves the
    // parent row with a NULL element when the array is EMPTY — the
    // LEFT-JOIN-UNNEST shape BigQuery/DuckDB users rely on for "orders
    // with their big lineitems, keeping orders that have none". Arrays
    // are per-order collections of high-quantity line numbers (bounded
    // by the order's line count); ~2/3 of orders produce an empty array
    // and MUST survive with a NULL. The oracle mirrors with a LEFT JOIN
    // onto the unnested rows.
    "q_explode_outer" -> QDef(
      (s, dir) =>
        t(s, dir, "lineitem")
          .filter(col("l_orderkey") <= 2000)
          .groupBy("l_orderkey")
          .agg(sort_array(collect_list(
            when(col("l_quantity") >= 45, col("l_linenumber").cast("long")))).as("big"))
          .select(col("l_orderkey"),
            explode_outer(col("big")).as("big_line"))
          .orderBy(col("l_orderkey"), col("big_line")),
      """WITH agg AS (
        |  SELECT l_orderkey,
        |    list_sort(list_filter(list(CASE WHEN l_quantity >= 45
        |        THEN CAST(l_linenumber AS BIGINT) END), x -> x IS NOT NULL)) AS big
        |  FROM lineitem WHERE l_orderkey <= 2000 GROUP BY l_orderkey),
        |ex AS (SELECT l_orderkey, UNNEST(big) AS big_line FROM agg)
        |SELECT agg.l_orderkey, ex.big_line
        |FROM agg LEFT JOIN ex ON agg.l_orderkey = ex.l_orderkey
        |ORDER BY agg.l_orderkey, ex.big_line""".stripMargin),

    // §2 25ig MapType surface: construction from parallel arrays,
    // keyed lookup, cardinality and membership — the complex-type tier
    // beyond arrays (q_array_funcs) and structs/VARIANT (q_variant_json).
    // The map itself never reaches the output (map column ordering is
    // engine-dependent); every emitted column is a scalar extraction,
    // which is also the 100 TB-safe shape (maps stay inside the row,
    // lookups are codegen'd, nothing explodes).
    "q_map_funcs" -> QDef(
      (s, dir) =>
        t(s, dir, "orders")
          .filter(col("o_orderkey") <= 1000)
          .select(col("o_orderkey"),
            map_from_arrays(
              array(lit("status"), lit("prio")),
              array(col("o_orderstatus"), col("o_orderpriority"))).as("m"))
          .select(col("o_orderkey"),
            element_at(col("m"), "status").as("status"),
            element_at(col("m"), "prio").as("prio"),
            size(col("m")).cast("long").as("n_keys"),
            map_contains_key(col("m"), "status").as("has_status"),
            element_at(col("m"), "missing").isNull.as("miss_is_null"))
          .orderBy("o_orderkey"),
      // DuckDB map extraction yields a LIST (empty when absent), so the
      // oracle scalarizes with [1] and length checks.
      """WITH m AS (
        |  SELECT o_orderkey,
        |    MAP(['status', 'prio'], [o_orderstatus, o_orderpriority]) AS m
        |  FROM orders WHERE o_orderkey <= 1000)
        |SELECT o_orderkey,
        |  m['status'][1] AS status,
        |  m['prio'][1] AS prio,
        |  CAST(cardinality(m) AS BIGINT) AS n_keys,
        |  len(m['status']) > 0 AS has_status,
        |  len(m['missing']) = 0 AS miss_is_null
        |FROM m ORDER BY o_orderkey""".stripMargin),

    // §2 25fg equi-DEPTH histogram via NTILE: decile boundaries of
    // o_totalprice (each bin holds the same row count — the histogram a
    // planner wants for selectivity, vs q_histogram's equi-width bins).
    // The NTILE window is partitioned by order-month so partitions stay
    // bounded; totalprice has 2dp so min/max land exactly.
    "q_equidepth_histogram" -> QDef(
      (s, dir) => {
        val byMonth = Window.partitionBy("month").orderBy("o_totalprice", "o_orderkey")
        t(s, dir, "orders")
          .select(
            date_format(to_date(col("o_orderdate")), "yyyy-MM").as("month"),
            col("o_totalprice"), col("o_orderkey"))
          .filter(col("month") < "1996-01")
          .withColumn("decile", ntile(10).over(byMonth).cast("long"))
          .groupBy("month", "decile")
          .agg(
            count(lit(1)).as("n"),
            min("o_totalprice").as("lo"),
            max("o_totalprice").as("hi"))
          .orderBy("month", "decile")
      },
      """WITH d AS (
        |  SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
        |    o_totalprice, o_orderkey,
        |    NTILE(10) OVER (PARTITION BY strftime(CAST(o_orderdate AS DATE), '%Y-%m')
        |      ORDER BY o_totalprice, o_orderkey) AS decile
        |  FROM orders
        |  WHERE strftime(CAST(o_orderdate AS DATE), '%Y-%m') < '1996-01')
        |SELECT month, decile,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  MIN(o_totalprice) AS lo,
        |  MAX(o_totalprice) AS hi
        |FROM d GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
  )
}
