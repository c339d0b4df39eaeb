package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Kruskal-Wallis H test (rank-based one-way ANOVA, Kruskal & Wallis
  * 1952) — the k-group nonparametric location test that complements the
  * repo's chi-square (categorical), KS (two-sample distribution) and
  * AB z-test (two-group mean): does o_totalprice differ in location
  * across the five order priorities? Midranks handle ties; both the
  * raw H and the tie-corrected H' = H / (1 − Σ(t³−t)/(N³−N)) are
  * emitted with the group count, so the caller can look up the
  * χ²(k−1) tail.
  *
  * Determinism: ranks never materialize per row — per distinct VALUE,
  * midrank·2 = 2·cnt_lt + cnt + 1 is an exact integer, so per-group
  * rank sums are exact integer aggregates; the tie sum Σ(t³−t) is an
  * exact DECIMAL(38) sum. Doubles appear only in the final H
  * expression, written with identical operation order on both engines.
  *
  * 100 TB posture: two value-keyed partial aggregations (distinct
  * values, then value×group), the ml_auc bucket-offset prefix for
  * cnt_lt (per-bucket sums, a ≤nb-row offset window, per-bucket
  * cumulative windows — never an unpartitioned window over the
  * corpus-scale distinct-value table), one value-keyed join of the two
  * (both sides already reduced to distinct values), and group-scale
  * finals. No row-level ranking shuffle.
  */
object RankStatsOps {

  private val Nb = 32

  def defs: Map[String, QDef] = Map(
    "q_kruskal_wallis" -> QDef(
      (s, dir) => {
        val o = Tables(s, dir, "orders")
          .select(col("o_orderpriority").as("grp"), col("o_totalprice").as("v"))
        val vg = o.groupBy("v", "grp").agg(count(lit(1)).as("cnt_g"))
        val vv = vg.groupBy("v").agg(sum("cnt_g").cast("long").as("cnt"))
        val mm = vv.agg(min("v").as("lo"), max("v").as("hi"))
        val bucketed = vv.crossJoin(broadcast(mm))
          .withColumn("b", least(lit(Nb - 1),
            floor((col("v") - col("lo")) / ((col("hi") - col("lo") + 0.001) / Nb))
              .cast("int")))
        val offs = bucketed.groupBy("b").agg(sum("cnt").as("bc"))
          .withColumn("off", coalesce(sum("bc").over(
            Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select("b", "off")
        val wb = Window.partitionBy("b").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, -1)
        val mr = bucketed.join(broadcast(offs), "b")
          .withColumn("cnt_lt", col("off") + coalesce(sum("cnt").over(wb), lit(0L)))
          .select(col("v"), (lit(2L) * col("cnt_lt") + col("cnt") + 1L).as("mr2"),
            col("cnt"))
        val g = vg.join(mr.select("v", "mr2"), "v")
          .groupBy("grp")
          .agg(sum(col("mr2") * col("cnt_g")).cast("long").as("r2g"),
            sum("cnt_g").cast("long").as("n_g"))
        val c12 = col("cnt").cast("decimal(12,0)")
        val t = mr.agg(sum(c12 * c12 * c12 - col("cnt")).as("tsum"),
          sum("cnt").cast("long").as("n"))
        val terms = g.select(
          round((col("r2g").cast("double") / 2) * (col("r2g").cast("double") / 2) /
            col("n_g"), 2).cast("decimal(30,2)").as("term"))
        val nD = col("n").cast("double")
        val h = lit(12.0) / (nD * (col("n") + 1)) * col("ssum").cast("double") -
          lit(3.0) * (col("n") + 1)
        terms.agg(sum("term").as("ssum"), count(lit(1)).as("k"))
          .crossJoin(broadcast(t))
          .select(col("n"), col("k").cast("long").as("k_groups"),
            round(h, 6).as("h"),
            round(h / (lit(1.0) - col("tsum").cast("double") /
              (nD * col("n") * col("n") - col("n"))), 6).as("h_tie"))
      },
      s"""WITH o AS (SELECT o_orderpriority AS grp, o_totalprice AS v FROM orders),
        |vg AS (SELECT v, grp, COUNT(*) AS cnt_g FROM o GROUP BY 1, 2),
        |vv AS (SELECT v, CAST(SUM(cnt_g) AS BIGINT) AS cnt FROM vg GROUP BY v),
        |mr AS (
        |  SELECT v,
        |    2 * COALESCE(SUM(cnt) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + cnt + 1 AS mr2,
        |    cnt
        |  FROM vv),
        |g AS (
        |  SELECT grp, CAST(SUM(mr2 * cnt_g) AS BIGINT) AS r2g,
        |         CAST(SUM(cnt_g) AS BIGINT) AS n_g
        |  FROM vg JOIN mr USING (v) GROUP BY grp),
        |t AS (
        |  SELECT SUM(CAST(cnt AS DECIMAL(12,0)) * CAST(cnt AS DECIMAL(12,0))
        |           * CAST(cnt AS DECIMAL(12,0)) - cnt) AS tsum,
        |         CAST(SUM(cnt) AS BIGINT) AS n
        |  FROM mr),
        |terms AS (
        |  SELECT CAST(ROUND((CAST(r2g AS DOUBLE) / 2) * (CAST(r2g AS DOUBLE) / 2)
        |    / n_g, 2) AS DECIMAL(30,2)) AS term
        |  FROM g),
        |agg AS (SELECT SUM(term) AS ssum, COUNT(*) AS k FROM terms)
        |SELECT n, CAST(k AS BIGINT) AS k_groups,
        |  ROUND(12.0 / (CAST(n AS DOUBLE) * (n + 1)) * CAST(ssum AS DOUBLE)
        |    - 3.0 * (n + 1), 6) AS h,
        |  ROUND((12.0 / (CAST(n AS DOUBLE) * (n + 1)) * CAST(ssum AS DOUBLE)
        |    - 3.0 * (n + 1))
        |    / (1.0 - CAST(tsum AS DOUBLE)
        |       / (CAST(n AS DOUBLE) * n * n - n)), 6) AS h_tie
        |FROM agg CROSS JOIN t""".stripMargin)
  )
}
