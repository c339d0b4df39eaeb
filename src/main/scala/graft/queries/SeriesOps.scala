package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Financial/operational time-series analytics over the daily revenue
  * and event series: maximum drawdown, CUSUM change-point detection,
  * gaps-and-islands activity streaks, and day-of-week seasonality.
  *
  * Scale posture: every operator first partial-aggregates the fact
  * table down to a CALENDAR-BOUNDED daily series (≤ a few thousand rows
  * regardless of fact cardinality — the documented ev_ewma exception),
  * or partitions its windows by a high-cardinality key (user_id). Float
  * determinism follows the repo rules: DECIMAL/integer partial
  * aggregates, then one fixed-order closed-form expression.
  *
  * Reference scope: bq-duckdb exposes BigQuery window/date SQL
  * (reference src/yacht/ planner tests); these are the canonical
  * monitoring queries a pipeline runs on top of that surface.
  */
object SeriesOps {

  private def orders(s: SparkSession, dir: String): DataFrame = Tables(s, dir, "orders")
  private def events(s: SparkSession, dir: String): DataFrame = Tables(s, dir, "events")

  /** Engine-portable day-of-week: days since Monday 1995-01-02, mod 7
    * (0 = Monday). Pure integer arithmetic — no locale/week-start
    * divergence between engines.
    */
  private val dowExpr = "((datediff(d, DATE'1995-01-02') % 7) + 7) % 7"

  val defs: Map[String, QDef] = Map(

    // §2 25gp maximum drawdown of the cumulative daily revenue curve —
    // the classic "worst peak-to-trough" series statistic. Daily sums
    // are exact DECIMAL(18,2) partial aggregates (fact rows never cross
    // an exchange un-aggregated); the cumulative/running-peak windows
    // run over the calendar-bounded daily series. All comparisons are
    // exact decimal; the trough is the earliest day attaining the max.
    "ev_max_drawdown" -> QDef(
      (s, dir) => {
        val daily = orders(s, dir)
          .groupBy(to_date(col("o_orderdate")).as("d"))
          .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("x"))
        val w = Window.orderBy("d")
        daily
          .withColumn("cum", sum("x").over(w.rowsBetween(Window.unboundedPreceding, 0)))
          .withColumn("peak", max("cum").over(w.rowsBetween(Window.unboundedPreceding, 0)))
          .select(col("d"), (col("peak") - col("cum")).as("dd"))
          .orderBy(col("dd").desc, col("d").asc)
          .limit(1)
          .select(date_format(col("d"), "yyyy-MM-dd").as("trough_day"),
            // Ordering/argmax stayed exact decimal; only the REPORTED
            // magnitude converts to double (exact-value conversion,
            // identical on both engines).
            round(col("dd").cast("double"), 2).as("max_drawdown"))
      },
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS x
        |  FROM orders GROUP BY 1),
        |cums AS (
        |  SELECT d,
        |    SUM(x) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM daily),
        |curve AS (
        |  SELECT d, cum,
        |    MAX(cum) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
        |  FROM cums)
        |SELECT strftime(d, '%Y-%m-%d') AS trough_day,
        |       ROUND(CAST(peak - cum AS DOUBLE), 2) AS max_drawdown
        |FROM curve ORDER BY peak - cum DESC, d ASC LIMIT 1""".stripMargin),

    // §2 25gq CUSUM change-point detection on the daily event-count
    // series: S_t = Σ_{i≤t}(c_i - mean); the change point is the argmax
    // of |S_t|. Kept EXACT by clearing the mean's division: the scaled
    // statistic n·S_t = n·prefix_t − t·total is pure integer arithmetic,
    // so the argmax (and its tie-break) is bit-identical on both
    // engines; only the reported magnitude divides back by n (one
    // rounded double). Daily series is calendar-bounded.
    "ev_cusum_changepoint" -> QDef(
      (s, dir) => {
        val daily = events(s, dir)
          .groupBy(to_date(col("ts")).as("d"))
          .agg(count(lit(1)).as("c"))
        val w = Window.orderBy("d")
        val tot = daily.agg(sum("c").as("total"), count(lit(1)).as("n"))
        daily
          .withColumn("t", row_number().over(w))
          .withColumn("pre", sum("c").over(w.rowsBetween(Window.unboundedPreceding, 0)))
          .crossJoin(broadcast(tot))
          .select(col("d"), col("n"),
            (col("n") * col("pre") - col("t") * col("total")).as("ns"))
          .orderBy(abs(col("ns")).desc, col("d").asc)
          .limit(1)
          .select(
            date_format(col("d"), "yyyy-MM-dd").as("change_day"),
            round(abs(col("ns")).cast("double") / col("n").cast("double"), 4)
              .as("cusum_max"))
      },
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d, COUNT(*) AS c FROM events GROUP BY 1),
        |tot AS (SELECT SUM(c) AS total, COUNT(*) AS n FROM daily),
        |s AS (
        |  SELECT d, n,
        |    n * SUM(c) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      - ROW_NUMBER() OVER (ORDER BY d) * total AS ns
        |  FROM daily CROSS JOIN tot)
        |SELECT strftime(d, '%Y-%m-%d') AS change_day,
        |       ROUND(CAST(ABS(ns) AS DOUBLE) / CAST(n AS DOUBLE), 4) AS cusum_max
        |FROM s ORDER BY ABS(ns) DESC, d ASC LIMIT 1""".stripMargin),

    // §2 25gr gaps-and-islands: longest run of consecutive active days
    // per user. The island key is dayNumber − row_number (constant
    // within a consecutive run) — the canonical formulation; every
    // window partitions by user_id (high cardinality, no skew, no
    // global window). Top 20 users by (longest streak DESC, user ASC).
    "ev_streaks" -> QDef(
      (s, dir) => {
        val days = events(s, dir)
          .select(col("user_id"), to_date(col("ts")).as("d"))
          .distinct()
          .withColumn("dn", datediff(col("d"), lit("2024-01-01").cast("date")))
        val wu = Window.partitionBy("user_id").orderBy("dn")
        days
          .withColumn("isl", col("dn") - row_number().over(wu))
          .groupBy("user_id", "isl")
          .agg(count(lit(1)).as("len"))
          .groupBy("user_id")
          .agg(max("len").as("longest"),
            count(lit(1)).as("n_streaks"),
            sum("len").as("active_days"))
          .orderBy(col("longest").desc, col("user_id").asc)
          .limit(20)
      },
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |isl AS (
        |  SELECT user_id,
        |    date_diff('day', DATE '2024-01-01', d)
        |      - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS isl
        |  FROM days),
        |runs AS (
        |  SELECT user_id, isl, COUNT(*) AS len FROM isl GROUP BY 1, 2)
        |SELECT user_id, MAX(len) AS longest, COUNT(*) AS n_streaks,
        |       CAST(SUM(len) AS BIGINT) AS active_days
        |FROM runs GROUP BY user_id
        |ORDER BY longest DESC, user_id ASC LIMIT 20""".stripMargin),

    // §2 25ht lagged cross-correlation between daily revenue and daily
    // order count (does money follow volume, and by how many days?):
    // the day table self-joins on date+k for k = 0..7 — an EQUI-join
    // keyed by day, the q_autocorr shape, never an ordered global
    // window. All five moment sums per lag are exact (DECIMAL revenue ×
    // integer counts); r_k is one fixed-order double expression.
    "ev_cross_corr" -> QDef(
      (s, dir) => {
        val daily = orders(s, dir)
          .groupBy(to_date(col("o_orderdate")).as("d"))
          .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("x"),
            count(lit(1)).as("y"))
        val pairs = daily.select(col("d"), col("x"))
          .withColumn("k", explode(sequence(lit(0), lit(7))))
          .withColumn("d2", expr("date_add(d, k)"))
          .join(daily.select(col("d").as("d2"), col("y").as("y2")), "d2")
        pairs.groupBy("k")
          .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y2").as("sy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("y2") * col("y2")).as("syy"),
            sum(col("x") * col("y2")).as("sxy"))
          .select(col("k"), col("n"),
            round((col("n").cast("double") * col("sxy").cast("double") -
              col("sx").cast("double") * col("sy").cast("double")) /
              sqrt((col("n").cast("double") * col("sxx").cast("double") -
                col("sx").cast("double") * col("sx").cast("double")) *
                (col("n").cast("double") * col("syy").cast("double") -
                  col("sy").cast("double") * col("sy").cast("double"))), 4)
              .as("r"))
          .orderBy("k")
      },
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS x,
        |         COUNT(*) AS y
        |  FROM orders GROUP BY 1),
        |pairs AS (
        |  SELECT k, a.x, b.y AS y2
        |  FROM daily a
        |  CROSS JOIN UNNEST(range(0, 8)) AS t(k)
        |  JOIN daily b ON b.d = a.d + CAST(k AS INT)),
        |m AS (
        |  SELECT k, COUNT(*) AS n, SUM(x) AS sx, SUM(y2) AS sy,
        |         SUM(x * x) AS sxx, SUM(y2 * y2) AS syy, SUM(x * y2) AS sxy
        |  FROM pairs GROUP BY k)
        |SELECT CAST(k AS INT) AS k, CAST(n AS BIGINT) AS n,
        |  ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / SQRT((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |      * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 4) AS r
        |FROM m ORDER BY k""".stripMargin),

    // §2 25gs day-of-week seasonal index of daily revenue: mean daily
    // revenue per weekday over the grand daily mean. Weekday comes from
    // pure integer day arithmetic (days since a known Monday, mod 7) so
    // both engines bucket identically; the index is ONE fixed-order
    // double expression over exact DECIMAL sums and integer day counts:
    // (sum_dow · n_days) / (days_dow · total).
    "ev_seasonality" -> QDef(
      (s, dir) => {
        val daily = orders(s, dir)
          .groupBy(to_date(col("o_orderdate")).as("d"))
          .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("x"))
        val byDow = daily
          .withColumn("dow", expr(dowExpr))
          .groupBy("dow")
          .agg(count(lit(1)).as("n_days"), sum("x").as("sx"))
        val tot = byDow.agg(sum("n_days").as("nd"), sum("sx").as("st"))
        byDow.crossJoin(broadcast(tot))
          .select(col("dow"), col("n_days"),
            round(col("sx").cast("double") * col("nd").cast("double") /
              (col("n_days").cast("double") * col("st").cast("double")), 6)
              .as("seasonal_idx"))
          .orderBy("dow")
      },
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS x
        |  FROM orders GROUP BY 1),
        |bydow AS (
        |  SELECT ((date_diff('day', DATE '1995-01-02', d) % 7) + 7) % 7 AS dow,
        |         COUNT(*) AS n_days, SUM(x) AS sx
        |  FROM daily GROUP BY 1),
        |tot AS (SELECT SUM(n_days) AS nd, SUM(sx) AS st FROM bydow)
        |SELECT dow, n_days,
        |       ROUND(CAST(sx AS DOUBLE) * CAST(nd AS DOUBLE) /
        |             (CAST(n_days AS DOUBLE) * CAST(st AS DOUBLE)), 6) AS seasonal_idx
        |FROM bydow CROSS JOIN tot ORDER BY dow""".stripMargin)
  )
}
