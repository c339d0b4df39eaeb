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
