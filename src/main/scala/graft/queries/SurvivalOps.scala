package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Survival analysis over customer purchase behavior: the Kaplan-Meier
  * estimator of time-to-next-order, the classic churn/retention curve.
  * Per customer, each order contributes one duration — days to the NEXT
  * order (an observed event) or days to the corpus max date (right-
  * censored: the customer had not reordered by end of data). KM then
  * walks distinct durations ascending: S(t) = Π_{u≤t} (1 − d_u/n_u)
  * with d_u events at u and n_u still at risk.
  *
  * Engine-exactness (the quantized-decimal recipe): each factor's
  * ln(1 − d/n) — the only libm call — is quantized to DECIMAL(26,12)
  * before the cumulative sum, so the product is order-independent and
  * ulp-immune; S(t) = exp(Σ) rounded at 6 dp. The d = n boundary
  * (risk set exhausted by events) is an explicit flag driving S to
  * exactly 0 rather than exp(−∞).
  *
  * Scale posture: durations come from a per-customer LEAD window
  * (partitioned, fact-scale); the KM walk runs over DISTINCT durations
  * — bounded by the calendar span in days, the same
  * calendar-series-bounded global window class as ev_daily_anomaly.
  */
object SurvivalOps {

  val defs: Map[String, QDef] = Map(

    // §2 25ie Kaplan-Meier survival curve of reorder latency.
    "ev_survival_km" -> QDef(
      (s, dir) => {
        val o = Tables(s, dir, "orders").select(
          col("o_custkey"), to_date(col("o_orderdate")).as("d"), col("o_orderkey"))
        val maxd = o.agg(max("d").as("mx"))
        val w = Window.partitionBy("o_custkey").orderBy(col("d"), col("o_orderkey"))
        val spans = o.withColumn("nxt", lead(col("d"), 1).over(w))
          .crossJoin(broadcast(maxd))
          .select(
            when(col("nxt").isNotNull, datediff(col("nxt"), col("d")))
              .otherwise(datediff(col("mx"), col("d"))).as("dur"),
            col("nxt").isNotNull.cast("int").as("ev"))
        val tbl = spans.groupBy("dur")
          .agg(sum("ev").as("dt"), sum(lit(1) - col("ev")).as("ct"))
        val n = broadcast(spans.agg(count(lit(1)).as("n")))
        val wLt = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
        val wLe = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, 0)
        val term = when(col("dt") > 0 && col("dt") < col("nrisk"),
          round(log(lit(1.0) - col("dt").cast("double") / col("nrisk").cast("double")), 12)
            .cast("decimal(26,12)"))
        tbl.crossJoin(n)
          .withColumn("nrisk",
            col("n") - coalesce(sum(col("dt") + col("ct")).over(wLt), lit(0L)))
          .withColumn("hitzero",
            max((col("dt") > 0 && col("dt") === col("nrisk")).cast("int")).over(wLe))
          .withColumn("lnsum", sum(term).over(wLe))
          .filter(col("dt") > 0)
          .select(col("dur").cast("long").as("dur"),
            col("nrisk").as("n_at_risk"), col("dt").as("d_events"),
            when(col("hitzero") === 1, lit(0.0))
              .otherwise(round(exp(col("lnsum").cast("double")), 6)).as("survival"))
          .orderBy("dur")
      },
      """WITH o AS (
        |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d, o_orderkey FROM orders),
        |maxd AS (SELECT MAX(d) AS mx FROM o),
        |spans AS (
        |  SELECT CASE WHEN nxt IS NOT NULL THEN date_diff('day', d, nxt)
        |              ELSE date_diff('day', d, (SELECT mx FROM maxd)) END AS dur,
        |         CASE WHEN nxt IS NOT NULL THEN 1 ELSE 0 END AS ev
        |  FROM (SELECT d, LEAD(d) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey) AS nxt
        |        FROM o) t),
        |tbl AS (
        |  SELECT dur, CAST(SUM(ev) AS BIGINT) AS dt, CAST(SUM(1 - ev) AS BIGINT) AS ct
        |  FROM spans GROUP BY dur),
        |n AS (SELECT COUNT(*) AS n FROM spans),
        |risk AS (
        |  SELECT dur, dt,
        |    n.n - COALESCE(SUM(dt + ct) OVER (ORDER BY dur
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS nrisk
        |  FROM tbl CROSS JOIN n),
        |terms AS (
        |  SELECT dur, dt, nrisk,
        |    MAX(CASE WHEN dt > 0 AND dt = nrisk THEN 1 ELSE 0 END) OVER (ORDER BY dur
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hitzero,
        |    SUM(CASE WHEN dt > 0 AND dt < nrisk
        |        THEN CAST(ROUND(LN(1.0 - CAST(dt AS DOUBLE) / CAST(nrisk AS DOUBLE)), 12)
        |             AS DECIMAL(26,12)) END) OVER (ORDER BY dur
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lnsum
        |  FROM risk)
        |SELECT CAST(dur AS BIGINT) AS dur, CAST(nrisk AS BIGINT) AS n_at_risk,
        |  dt AS d_events,
        |  CASE WHEN hitzero = 1 THEN 0.0
        |       ELSE ROUND(EXP(CAST(lnsum AS DOUBLE)), 6) END AS survival
        |FROM terms WHERE dt > 0 ORDER BY dur""".stripMargin)
  )
}
