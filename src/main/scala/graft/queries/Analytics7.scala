package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-7 analytics tranche 3: cohort lifetime-value curves and
  * hierarchical contribution shares.
  */
object Analytics7 {

  val defs: Map[String, QDef] = Map(

    // §2 25hj cohort LTV matrix: customers cohorted by first-order
    // month, revenue accumulated by cohort age in months. The cohort
    // assignment is a per-customer MIN partial aggregate (no window),
    // the matrix is calendar²-bounded, and cumulative LTV runs over
    // each cohort's ≤|months| row partition. Exact DECIMAL revenue;
    // month arithmetic via engine-portable yyyy-MM strings and integer
    // (year·12+month) differences. First 60 cells by (cohort, age).
    "ev_cohort_ltv" -> QDef(
      (s, dir) => {
        val o = Tables(s, dir, "orders").select(
          col("o_custkey"),
          col("o_orderdate"),
          col("o_totalprice").cast("decimal(18,2)").as("rev"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).as("m"))
        val cohorts = o.groupBy("o_custkey").agg(min("m").as("m0"))
        val cells = o.join(cohorts, "o_custkey")
          .groupBy(col("m0"), (col("m") - col("m0")).as("age"))
          .agg(count(lit(1)).as("n_orders"), sum("rev").as("rev"))
        val w = Window.partitionBy("m0").orderBy("age")
          .rowsBetween(Window.unboundedPreceding, 0)
        cells
          .withColumn("cum", sum("rev").over(w))
          .select(
            // m0 = year·12 + month → back to a yyyy-MM label.
            // Integer division, NOT `/` (Column./ is double division and
            // DuckDB's double→INT cast rounds instead of truncating).
            format_string("%04d-%02d", expr("(m0 - 1) div 12").cast("int"),
              ((col("m0") - 1) % 12 + 1).cast("int")).as("cohort"),
            col("age"), col("n_orders"),
            round(col("rev").cast("double"), 2).as("revenue"),
            round(col("cum").cast("double"), 2).as("cum_ltv"))
          .orderBy("cohort", "age")
          .limit(60)
      },
      """WITH o AS (
        |  SELECT o_custkey,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS rev,
        |    year(o_orderdate) * 12 + month(o_orderdate) AS m
        |  FROM orders),
        |cohorts AS (SELECT o_custkey, MIN(m) AS m0 FROM o GROUP BY 1),
        |cells AS (
        |  SELECT m0, m - m0 AS age, COUNT(*) AS n_orders, SUM(rev) AS rev
        |  FROM o JOIN cohorts USING (o_custkey)
        |  GROUP BY 1, 2),
        |cum AS (
        |  SELECT m0, age, n_orders, rev,
        |    SUM(rev) OVER (PARTITION BY m0 ORDER BY age
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM cells)
        |SELECT printf('%04d-%02d', CAST((m0 - 1) // 12 AS INT), CAST((m0 - 1) % 12 + 1 AS INT))
        |         AS cohort,
        |       CAST(age AS BIGINT) AS age, CAST(n_orders AS BIGINT) AS n_orders,
        |       ROUND(CAST(rev AS DOUBLE), 2) AS revenue,
        |       ROUND(CAST(cum AS DOUBLE), 2) AS cum_ltv
        |FROM cum ORDER BY cohort, age LIMIT 60""".stripMargin),

    // §2 25hv 2-D density histogram (quantity × price heat grid — the
    // scatter-plot backend at corpus scale): two independent
    // Buckets.assign fixed-width bucketizations, one partial agg to
    // ≤100 cells carrying exact counts and DECIMAL revenue. The oracle
    // mirrors the min/max + epsilon formula per dimension verbatim.
    "q_histogram2d" -> QDef(
      (s, dir) => {
        val li = Tables(s, dir, "lineitem").select(
          col("l_quantity").cast("double").as("q"),
          col("l_extendedprice").cast("double").as("p"),
          col("l_extendedprice").cast("decimal(18,2)").as("rev"))
        val bx = Buckets.assign(li, col("q"), 10).withColumnRenamed("b", "qb")
        val both = Buckets.assign(bx, col("p"), 10).withColumnRenamed("b", "pb")
        both.groupBy("qb", "pb")
          .agg(count(lit(1)).as("n"),
            round(sum("rev").cast("double"), 2).as("revenue"))
          .orderBy("qb", "pb")
      },
      """WITH li AS (
        |  SELECT CAST(l_quantity AS DOUBLE) AS q,
        |         CAST(l_extendedprice AS DOUBLE) AS p,
        |         CAST(l_extendedprice AS DECIMAL(18,2)) AS rev
        |  FROM lineitem),
        |mm AS (
        |  SELECT MIN(q) AS qlo, MAX(q) AS qhi, MIN(p) AS plo, MAX(p) AS phi FROM li),
        |binned AS (
        |  SELECT
        |    LEAST(9, CAST(FLOOR((q - qlo) / ((qhi - qlo + 0.001) / 10)) AS INT)) AS qb,
        |    LEAST(9, CAST(FLOOR((p - plo) / ((phi - plo + 0.001) / 10)) AS INT)) AS pb,
        |    rev
        |  FROM li CROSS JOIN mm)
        |SELECT qb, pb, COUNT(*) AS n,
        |       ROUND(CAST(SUM(rev) AS DOUBLE), 2) AS revenue
        |FROM binned GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // §2 25hk hierarchical contribution shares (region → nation):
    // revenue rolled up the dimension hierarchy, each nation reported
    // with its share of the parent region and each region with its
    // share of the total — the drill-down report RATIO_TO_REPORT only
    // covers one level of. One fact join chain (dims broadcast), one
    // partial agg to |nations| rows; shares are fixed-order double
    // divisions over exact DECIMAL sums.
    "q_hier_share" -> QDef(
      (s, dir) => {
        val cust = Tables(s, dir, "customer").select("c_custkey", "c_nationkey")
        val nat = Tables(s, dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
        val reg = Tables(s, dir, "region").select("r_regionkey", "r_name")
        val base = Tables(s, dir, "orders")
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
        val wr = Window.partitionBy("r_name")
        val wt = Window.partitionBy()
        base
          .withColumn("r_rev", sum("rev").over(wr))
          .withColumn("t_rev", sum("rev").over(wt))
          .select(col("r_name"), col("n_name"),
            round(col("rev").cast("double"), 2).as("revenue"),
            round(col("rev").cast("double") / col("r_rev").cast("double"), 6)
              .as("share_of_region"),
            round(col("r_rev").cast("double") / col("t_rev").cast("double"), 6)
              .as("region_share_of_total"))
          .orderBy("r_name", "n_name")
      },
      """WITH base AS (
        |  SELECT r_name, n_name,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY 1, 2),
        |lv AS (
        |  SELECT r_name, n_name, rev,
        |    SUM(rev) OVER (PARTITION BY r_name) AS r_rev,
        |    SUM(rev) OVER () AS t_rev
        |  FROM base)
        |SELECT r_name, n_name,
        |  ROUND(CAST(rev AS DOUBLE), 2) AS revenue,
        |  ROUND(CAST(rev AS DOUBLE) / CAST(r_rev AS DOUBLE), 6) AS share_of_region,
        |  ROUND(CAST(r_rev AS DOUBLE) / CAST(t_rev AS DOUBLE), 6) AS region_share_of_total
        |FROM lv ORDER BY r_name, n_name""".stripMargin)
  )
}
