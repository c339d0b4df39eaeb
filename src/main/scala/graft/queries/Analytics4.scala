package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-7 analytics tranche: data-quality statistics (Benford
  * first-digit deviation, MAD-robust anomalies) and the decile lift
  * table — plus BFS hop distances in GraphOps.
  */
object Analytics4 {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  val defs: Map[String, QDef] = Map(

    // §2 25fo Benford first-digit deviation of o_totalprice: observed
    // first-digit shares vs log10(1 + 1/d), plus each digit's absolute
    // deviation — the classic fabricated-data screen. Counts are exact
    // integers; the expected shares are the same log10 constants on
    // both engines, so the rounded deviations match exactly.
    "q_benford" -> QDef(
      (s, dir) => {
        val first = substring(col("o_totalprice").cast("string"), 1, 1).cast("int")
        val digits = t(s, dir, "orders")
          .select(first.as("d"))
          .filter(col("d").between(1, 9))
          .groupBy("d").agg(count(lit(1)).as("n"))
        val tot = digits.agg(sum("n").as("tot"))
        digits.crossJoin(broadcast(tot))
          .select(col("d"), col("n"),
            round(col("n") / col("tot").cast("double"), 4).as("obs_share"),
            round(log10(lit(1.0) + lit(1.0) / col("d")), 4).as("benford_share"),
            round(abs(col("n") / col("tot").cast("double") -
              log10(lit(1.0) + lit(1.0) / col("d"))), 4).as("abs_dev"))
          .orderBy("d")
      },
      """WITH digits AS (
        |  SELECT CAST(substr(CAST(o_totalprice AS VARCHAR), 1, 1) AS INT) AS d,
        |    COUNT(*) AS n
        |  FROM orders
        |  WHERE CAST(substr(CAST(o_totalprice AS VARCHAR), 1, 1) AS INT) BETWEEN 1 AND 9
        |  GROUP BY 1),
        |tot AS (SELECT SUM(n) AS tot FROM digits)
        |SELECT d, CAST(n AS BIGINT) AS n,
        |  ROUND(n / CAST(tot AS DOUBLE), 4) AS obs_share,
        |  ROUND(log10(1.0 + 1.0 / d), 4) AS benford_share,
        |  ROUND(abs(n / CAST(tot AS DOUBLE) - log10(1.0 + 1.0 / d)), 4) AS abs_dev
        |FROM digits CROSS JOIN tot ORDER BY d""".stripMargin),

    // §2 25fp decile lift table: customers ranked into acctbal deciles,
    // each decile's share of total order value and the cumulative lift
    // curve — the BI "gains chart". Value sums run as exact
    // DECIMAL(18,2) (o_totalprice carries 2dp) so shares divide
    // identical operands on both engines.
    "q_decile_lift" -> QDef(
      (s, dir) => {
        // Deciles come from 9 broadcast PERCENTILE_DISC boundaries
        // (exact element picks, driver round-trip) and a map-side bucket
        // assignment — NOT a global NTILE, whose single-partition total
        // order is the classic lift-table scale-killer. decile 1 = top
        // 10% by balance: 1 + |{b : x < b}| counts the upper boundaries
        // the balance fails to reach; boundary ties use the same x < b
        // rule on both engines.
        val bs: Seq[Double] = t(s, dir, "customer")
          .agg(expr(
            (1 to 9).map(i => s"percentile_disc(0.$i) WITHIN GROUP (ORDER BY c_acctbal DESC)")
              .mkString("array(", ", ", ")")).as("bs"))
          .head().getSeq[Double](0)
        val bl = typedlit(bs)
        val cust = t(s, dir, "customer")
          .select(col("c_custkey"),
            (lit(1) + size(filter(bl, b => col("c_acctbal") < b))).cast("long").as("decile"))
        val spend = t(s, dir, "orders")
          .groupBy("o_custkey")
          .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("spend"))
        val byDecile = cust.join(spend, cust("c_custkey") === spend("o_custkey"), "left")
          .groupBy("decile")
          .agg(
            count(lit(1)).as("n_cust"),
            coalesce(sum("spend"), lit(0).cast("decimal(28,2)")).as("v"))
        val tot = byDecile.agg(sum("v").as("tv"))
        val cum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
        byDecile.crossJoin(broadcast(tot))
          .withColumn("cum_v", sum("v").over(cum))
          .select(col("decile"), col("n_cust"),
            round(col("v").cast("double"), 2).as("value"),
            // Divide as doubles of the EXACT decimal sums: decimal
            // division scale rules differ between engines, double
            // division of identical operands cannot.
            round(col("v").cast("double") / col("tv").cast("double"), 4).as("share"),
            round(col("cum_v").cast("double") / col("tv").cast("double"), 4).as("cum_share"))
          .orderBy("decile")
      },
      """WITH bs AS (
        |  SELECT [-quantile_disc(-c_acctbal, 0.1), -quantile_disc(-c_acctbal, 0.2),
        |          -quantile_disc(-c_acctbal, 0.3), -quantile_disc(-c_acctbal, 0.4),
        |          -quantile_disc(-c_acctbal, 0.5), -quantile_disc(-c_acctbal, 0.6),
        |          -quantile_disc(-c_acctbal, 0.7), -quantile_disc(-c_acctbal, 0.8),
        |          -quantile_disc(-c_acctbal, 0.9)] AS b
        |  FROM customer),
        |cust AS (
        |  SELECT c_custkey,
        |    1 + len(list_filter(b, x -> c_acctbal < x)) AS decile
        |  FROM customer CROSS JOIN bs),
        |spend AS (
        |  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
        |  FROM orders GROUP BY 1),
        |bd AS (
        |  SELECT decile, COUNT(*) AS n_cust,
        |    COALESCE(SUM(spend), CAST(0 AS DECIMAL(28,2))) AS v
        |  FROM cust LEFT JOIN spend ON c_custkey = o_custkey
        |  GROUP BY 1),
        |tot AS (SELECT SUM(v) AS tv FROM bd)
        |SELECT decile, CAST(n_cust AS BIGINT) AS n_cust,
        |  ROUND(CAST(v AS DOUBLE), 2) AS value,
        |  ROUND(CAST(v AS DOUBLE) / CAST(tv AS DOUBLE), 4) AS share,
        |  ROUND(CAST(SUM(v) OVER (ORDER BY decile
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    / CAST(tv AS DOUBLE), 4) AS cum_share
        |FROM bd CROSS JOIN tot ORDER BY decile""".stripMargin),

    // §2 25fq MAD-robust daily anomaly detection: |x - median| scaled by
    // the median absolute deviation — the robust twin of ev_daily_anomaly's
    // mean/stddev z-score (one outlier day inflates a stddev but not a
    // MAD). Both medians are PERCENTILE_DISC element picks over exact
    // per-day integer counts, so there is no interpolation or summation
    // drift anywhere.
    "ev_anomaly_mad" -> QDef(
      (s, dir) => {
        val daily = t(s, dir, "events")
          .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
          .agg(count(lit(1)).as("n"))
        val med = daily.agg(
          expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY n)").as("med"))
        val mad = daily.crossJoin(broadcast(med))
          .select(abs(col("n") - col("med")).as("ad"))
          .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY ad)").as("mad"))
        daily.crossJoin(broadcast(med)).crossJoin(broadcast(mad))
          .select(col("day"), col("n"),
            col("med").cast("long").as("median_n"),
            col("mad").cast("long").as("mad_n"),
            round(abs(col("n") - col("med")) /
              greatest(col("mad").cast("double"), lit(1.0)), 4).as("robust_score"))
          .orderBy("day")
      },
      """WITH daily AS (
        |  SELECT strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS n
        |  FROM events GROUP BY 1),
        |med AS (SELECT quantile_disc(n, 0.5) AS med FROM daily),
        |mad AS (SELECT quantile_disc(abs(n - med), 0.5) AS mad
        |        FROM daily CROSS JOIN med)
        |SELECT day, CAST(n AS BIGINT) AS n,
        |  CAST(med AS BIGINT) AS median_n,
        |  CAST(mad AS BIGINT) AS mad_n,
        |  ROUND(abs(n - med) / GREATEST(CAST(mad AS DOUBLE), 1.0), 4) AS robust_score
        |FROM daily CROSS JOIN med CROSS JOIN mad ORDER BY day""".stripMargin)
  )
}
