package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Additional TPC-H headline queries (adapted to the driver's synthetic
  * schema — no o_shippriority/l_commitdate columns, so predicates use the
  * columns that exist).
  *
  * Q6 is the pushdown showcase: every predicate reaches the parquet scan
  * (PushedFilters), the projection prunes to 3 columns, and the whole
  * query is one map-side scan + a single-row aggregate. Q12 and Q14 are
  * the conditional-aggregation join patterns.
  */
object TpchOps {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  val defs: Map[String, QDef] = Map(

    // TPC-H Q6 forecasting revenue change: pure scan-filter-aggregate.
    "q_tpch_q6" -> QDef(
      (s, dir) =>
        t(s, dir, "lineitem")
          .filter(
            col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01" &&
              col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
          .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue")),
      """SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin),

    // TPC-H Q12-style shipping modes / priority classes: join + CASE agg.
    // (Synthetic schema has no l_shipmode — l_returnflag plays its role.)
    "q_tpch_q12" -> QDef(
      (s, dir) => {
        val l = t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01")
        val o = t(s, dir, "orders")
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy("l_returnflag")
          .agg(
            sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
              .as("high_line_count"),
            sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
              .as("low_line_count"))
          .orderBy("l_returnflag")
      },
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    // TPC-H Q14-style promotion effect: conditional revenue share over a
    // month of shipments, part side broadcast.
    "q_tpch_q14" -> QDef(
      (s, dir) => {
        val l = t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= "1996-03-01" && col("l_shipdate") < "1996-04-01")
        val p = t(s, dir, "part")
        val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
        l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .agg(round(
            lit(100.0) * sum(when(col("p_type").startsWith("PROMO"), rev).otherwise(lit(0.0))) /
              sum(rev), 4).as("promo_revenue"))
      },
      """SELECT ROUND(100.0 * SUM(CASE WHEN p_type LIKE 'PROMO%'
        |    THEN l_extendedprice * (1 - l_discount) ELSE 0 END) /
        |  SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= '1996-03-01' AND l_shipdate < '1996-04-01'""".stripMargin)
  )
}
