package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Distribution-level statistics: independence / goodness-of-fit tests
  * and closed-form regression — the drift-detection and sanity-check
  * layer a training pipeline runs on every snapshot. Float determinism
  * throughout follows the repo's two proven rules: exact integer or
  * DECIMAL partial aggregates first, then either a sorted-list fold
  * (identical operand sequence on both engines) or a single closed-form
  * expression over the exact scalars.
  */
object StatsOps2 {

  private def ev(s: SparkSession, dir: String): DataFrame = Tables(s, dir, "events")

  val defs: Map[String, QDef] = Map(

    // §2 25fy chi-square independence test (lang × source on the
    // document corpus — the "did my source mix drift across languages"
    // check). Observed/expected cells come from three vocabulary-scale
    // partial aggs (cells, row totals, column totals — dimension tables
    // broadcast back); the statistic folds the per-cell terms in
    // (lang, source) order over a collected list that is bounded by the
    // category product, so both engines sum identical doubles in
    // identical order.
    "q_chi_square" -> QDef(
      (s, dir) => {
        val cells = Tables(s, dir, "documents")
          .groupBy("lang", "source").agg(count(lit(1)).as("o"))
        val rt = cells.groupBy("lang").agg(sum("o").as("r"))
        val ct = cells.groupBy("source").agg(sum("o").as("c"))
        val tot = cells.agg(sum("o").as("n"),
          countDistinct("lang").as("nl"), countDistinct("source").as("ns"))
        cells.join(broadcast(rt), "lang").join(broadcast(ct), "source")
          .crossJoin(broadcast(tot))
          .select(col("nl"), col("ns"), col("n"), col("lang"), col("source"),
            (((col("o") - col("r") * col("c") * lit(1.0) / col("n")) *
              (col("o") - col("r") * col("c") * lit(1.0) / col("n"))) /
              (col("r") * col("c") * lit(1.0) / col("n"))).as("term"))
          .groupBy("nl", "ns", "n")
          .agg(sort_array(collect_list(struct(col("lang"), col("source"), col("term"))))
            .as("xs"))
          .select(
            round(aggregate(col("xs"), lit(0.0), (acc, x) => acc + x.getField("term")), 4)
              .as("chi2"),
            size(col("xs")).cast("long").as("ncells"),
            ((col("nl") - 1) * (col("ns") - 1)).as("dof"),
            col("n").as("n"))
      },
      """WITH cells AS (
        |  SELECT lang, source, COUNT(*) AS o FROM documents GROUP BY 1, 2),
        |rt AS (SELECT lang, SUM(o) AS r FROM cells GROUP BY 1),
        |ct AS (SELECT source, SUM(o) AS c FROM cells GROUP BY 1),
        |tot AS (SELECT SUM(o) AS n, COUNT(DISTINCT lang) AS nl,
        |               COUNT(DISTINCT source) AS ns FROM cells),
        |terms AS (
        |  SELECT list(((o - r*c*1.0/n) * (o - r*c*1.0/n)) / (r*c*1.0/n)
        |           ORDER BY lang, source) AS ts,
        |         COUNT(*) AS ncells, MAX(nl) AS nl, MAX(ns) AS ns, MAX(n) AS n
        |  FROM cells JOIN rt USING (lang) JOIN ct USING (source) CROSS JOIN tot)
        |SELECT ROUND(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), ts),
        |         (a, b) -> a + b), 4) AS chi2,
        |       CAST(ncells AS BIGINT) AS ncells,
        |       CAST((nl - 1) * (ns - 1) AS BIGINT) AS dof,
        |       CAST(n AS BIGINT) AS n
        |FROM terms""".stripMargin),

    // §2 25fz two-sample Kolmogorov-Smirnov distance between the value
    // distributions of two event types. The ECDFs need a global
    // cumulative sum over distinct values — computed with the
    // bucket-offset composition (the curate_global_index pattern), NOT
    // a single-partition window: 32 range buckets from a broadcast
    // min/max, per-bucket windows in parallel, a 32-row prefix for the
    // offsets. D = max |F1 − F2| is an order-independent max over exact
    // integer-ratio doubles.
    "q_ks_test" -> QDef(
      (s, dir) => {
        val nb = 32
        val s0 = ev(s, dir).filter(col("event_type").isin("click", "view"))
          .groupBy("value")
          .agg(
            sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("c1"),
            sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("c2"))
        val tot = s0.agg(sum("c1").as("n1"), sum("c2").as("n2"))
        val bucketed = Buckets.assign(s0, col("value"), nb)
        // 32-row bucket table: the tiny-window exception.
        val offs = bucketed.groupBy("b")
          .agg(sum("c1").as("s1"), sum("c2").as("s2"))
          .withColumn("o1", coalesce(sum("s1").over(
            Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .withColumn("o2", coalesce(sum("s2").over(
            Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select("b", "o1", "o2")
        val wb = Window.partitionBy("b").orderBy("value")
          .rowsBetween(Window.unboundedPreceding, 0)
        bucketed.join(broadcast(offs), "b")
          .crossJoin(broadcast(tot))
          .select(col("n1"), col("n2"),
            (col("o1") + sum("c1").over(wb)).as("a1"),
            (col("o2") + sum("c2").over(wb)).as("a2"))
          .groupBy("n1", "n2")
          .agg(round(max(abs(col("a1") * lit(1.0) / col("n1") -
            col("a2") * lit(1.0) / col("n2"))), 6).as("ks_d"))
          .select(col("ks_d"), col("n1"), col("n2"))
      },
      """WITH s AS (
        |  SELECT value,
        |    SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c1,
        |    SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS c2
        |  FROM events WHERE event_type IN ('click', 'view') GROUP BY 1),
        |n AS (SELECT SUM(c1) AS n1, SUM(c2) AS n2 FROM s),
        |e AS (
        |  SELECT value,
        |    SUM(c1) OVER (ORDER BY value) AS a1,
        |    SUM(c2) OVER (ORDER BY value) AS a2
        |  FROM s)
        |SELECT ROUND(MAX(ABS(a1 * 1.0 / n1 - a2 * 1.0 / n2)), 6) AS ks_d,
        |       CAST(MAX(n1) AS BIGINT) AS n1, CAST(MAX(n2) AS BIGINT) AS n2
        |FROM e CROSS JOIN n""".stripMargin),

    // §2 25ga Jensen-Shannon divergence between the event-type mixes of
    // the first and second half of the month — the distribution-drift
    // alarm between two corpus snapshots. Counts are one
    // category-scale partial agg; the divergence folds the per-type
    // terms in type order (5-element list), 0·log0 guarded to 0 on both
    // engines.
    "q_js_divergence" -> QDef(
      (s, dir) => {
        val c = ev(s, dir)
          .select(col("event_type").as("t"), (dayofmonth(col("ts")) <= 15).as("h1"))
          .groupBy("t")
          // when(h1, 0).otherwise(1) — not when(!h1, 1) — so a NULL ts
          // routes into c2 exactly like the oracle's CASE ELSE branch.
          .agg(sum(when(col("h1"), 1L).otherwise(0L)).as("c1"),
            sum(when(col("h1"), 0L).otherwise(1L)).as("c2"))
        val n = c.agg(sum("c1").as("n1"), sum("c2").as("n2"))
        c.crossJoin(broadcast(n))
          .select(col("n1"), col("n2"), col("t"),
            (col("c1") * lit(1.0) / col("n1")).as("p"),
            (col("c2") * lit(1.0) / col("n2")).as("q"))
          .select(col("n1"), col("n2"), col("t"),
            when(col("p") > 0, col("p") * log2(col("p") / ((col("p") + col("q")) / 2)))
              .otherwise(lit(0.0)).as("tp"),
            when(col("q") > 0, col("q") * log2(col("q") / ((col("p") + col("q")) / 2)))
              .otherwise(lit(0.0)).as("tq"))
          .groupBy("n1", "n2")
          .agg(sort_array(collect_list(struct(col("t"), col("tp"), col("tq")))).as("xs"))
          .select(
            round(lit(0.5) * aggregate(col("xs"), lit(0.0), (a, x) => a + x.getField("tp")) +
              lit(0.5) * aggregate(col("xs"), lit(0.0), (a, x) => a + x.getField("tq")), 6)
              .as("js_div"),
            col("n1"), col("n2"))
      },
      """WITH c AS (
        |  SELECT event_type AS t,
        |    SUM(CASE WHEN day(ts) <= 15 THEN 1 ELSE 0 END) AS c1,
        |    SUM(CASE WHEN day(ts) <= 15 THEN 0 ELSE 1 END) AS c2
        |  FROM events GROUP BY 1),
        |n AS (SELECT SUM(c1) AS n1, SUM(c2) AS n2 FROM c),
        |pq AS (
        |  SELECT t, c1 * 1.0 / n1 AS p, c2 * 1.0 / n2 AS q, n1, n2
        |  FROM c CROSS JOIN n),
        |terms AS (
        |  SELECT
        |    list(CASE WHEN p > 0 THEN p * log2(p / ((p + q) / 2)) ELSE 0.0 END
        |      ORDER BY t) AS tps,
        |    list(CASE WHEN q > 0 THEN q * log2(q / ((p + q) / 2)) ELSE 0.0 END
        |      ORDER BY t) AS tqs,
        |    MAX(n1) AS n1, MAX(n2) AS n2
        |  FROM pq)
        |SELECT ROUND(
        |    0.5 * list_reduce(list_prepend(CAST(0.0 AS DOUBLE), tps), (a, b) -> a + b) +
        |    0.5 * list_reduce(list_prepend(CAST(0.0 AS DOUBLE), tqs), (a, b) -> a + b),
        |  6) AS js_div,
        |  CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2
        |FROM terms""".stripMargin),

    // §2 25gb closed-form OLS regression (price on quantity, per return
    // flag) via the Gram-sum decomposition: the five moment sums
    // accumulate as EXACT DECIMALs in one partial-agg shuffle (the
    // distributed normal-equations shape — no iteration, no driver
    // math), then slope/intercept/r² evaluate as one identical double
    // expression over the exact scalars on both engines.
    "q_ols_regression" -> QDef(
      (s, dir) => {
        val l = Tables(s, dir, "lineitem").select(col("l_returnflag"),
          col("l_quantity").cast("decimal(18,2)").as("x"),
          col("l_extendedprice").cast("decimal(18,2)").as("y"))
        val sums = l.groupBy("l_returnflag").agg(
          count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        val d = sums.select(col("l_returnflag"), col("n"),
          col("n").cast("double").as("nd"),
          col("sx").cast("double").as("sxd"), col("sy").cast("double").as("syd"),
          col("sxy").cast("double").as("sxyd"), col("sxx").cast("double").as("sxxd"),
          col("syy").cast("double").as("syyd"))
        d.select(col("l_returnflag"), col("n"),
            ((col("nd") * col("sxyd") - col("sxd") * col("syd")) /
              (col("nd") * col("sxxd") - col("sxd") * col("sxd"))).as("slope"),
            col("nd"), col("sxd"), col("syd"), col("sxyd"), col("sxxd"), col("syyd"))
          .select(col("l_returnflag"), col("n"),
            round(col("slope"), 6).as("slope"),
            round((col("syd") - col("slope") * col("sxd")) / col("nd"), 6).as("intercept"),
            round(((col("nd") * col("sxyd") - col("sxd") * col("syd")) *
              (col("nd") * col("sxyd") - col("sxd") * col("syd"))) /
              ((col("nd") * col("sxxd") - col("sxd") * col("sxd")) *
                (col("nd") * col("syyd") - col("syd") * col("syd"))), 6).as("r2"))
          .orderBy("l_returnflag")
      },
      """WITH s AS (
        |  SELECT l_returnflag,
        |    COUNT(*) AS n,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS syy
        |  FROM lineitem GROUP BY 1),
        |d AS (
        |  SELECT l_returnflag, n,
        |    CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
        |    CAST(sxy AS DOUBLE) AS sxyd, CAST(sxx AS DOUBLE) AS sxxd, CAST(syy AS DOUBLE) AS syyd
        |  FROM s),
        |sl AS (
        |  SELECT l_returnflag, n, nd, sxd, syd, sxyd, sxxd, syyd,
        |    (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd) AS slope
        |  FROM d)
        |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
        |  ROUND(slope, 6) AS slope,
        |  ROUND((syd - slope * sxd) / nd, 6) AS intercept,
        |  ROUND(((nd * sxyd - sxd * syd) * (nd * sxyd - sxd * syd)) /
        |        ((nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd)), 6) AS r2
        |FROM sl ORDER BY l_returnflag""".stripMargin),

    // §2 25gi trailing-7-day rolling regression slope of daily revenue
    // (the trend detector over a metric series): day sums as exact
    // DECIMALs, the trailing frame's five moment sums accumulate inside
    // ONE ROWS BETWEEN 6 PRECEDING window over the calendar-bounded
    // series (ev_ewma exception), and each day's slope evaluates as the
    // identical closed-form double expression — the windowed variant of
    // q_ols_regression. The regressor is the exact integer epoch-day,
    // so every sum is exact on both engines; n < 2 frames yield NULL.
    "q_rolling_slope" -> QDef(
      (s, dir) => {
        val daily = Tables(s, dir, "orders")
          .groupBy(col("o_orderdate").as("d"))
          .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("y"))
          .withColumn("t", floor(unix_timestamp(col("d")) / 86400L))
        val w = Window.orderBy("d").rowsBetween(-6, 0)
        daily
          .withColumn("n", count(lit(1)).over(w))
          .withColumn("st", sum(col("t")).over(w))
          .withColumn("sy", sum(col("y")).over(w))
          .withColumn("sty", sum(col("t") * col("y")).over(w))
          .withColumn("stt", sum(col("t") * col("t")).over(w))
          .select(
            date_format(col("d"), "yyyy-MM-dd").as("day"),
            col("n"),
            round(when(col("n") >= 2,
              (col("n").cast("double") * col("sty").cast("double") -
                col("st").cast("double") * col("sy").cast("double")) /
                (col("n").cast("double") * col("stt").cast("double") -
                  col("st").cast("double") * col("st").cast("double"))), 4)
              .as("slope_7d"))
          .orderBy("day")
      },
      """WITH daily AS (
        |  SELECT o_orderdate AS d,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS y,
        |    CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS t
        |  FROM orders GROUP BY 1),
        |w AS (
        |  SELECT d,
        |    COUNT(*) OVER fr AS n,
        |    SUM(t) OVER fr AS st,
        |    SUM(y) OVER fr AS sy,
        |    SUM(t * y) OVER fr AS sty,
        |    SUM(t * t) OVER fr AS stt
        |  FROM daily
        |  WINDOW fr AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT strftime(d, '%Y-%m-%d') AS day, CAST(n AS BIGINT) AS n,
        |  ROUND(CASE WHEN n >= 2 THEN
        |    (CAST(n AS DOUBLE) * CAST(sty AS DOUBLE) -
        |     CAST(st AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |    (CAST(n AS DOUBLE) * CAST(stt AS DOUBLE) -
        |     CAST(st AS DOUBLE) * CAST(st AS DOUBLE))
        |  END, 4) AS slope_7d
        |FROM w ORDER BY day""".stripMargin),

    // §2 25gc bitmap activity index: each user's first-calendar-month
    // presence packed into one BIGINT (bit d-1 = active on day d) via a
    // bit_or partial aggregate — the roaring-bitmap pattern at its
    // fixed-width core. Per-user state is 8 bytes regardless of event
    // count; day-count and adjacent-day-pair metrics are O(1) popcounts
    // on the packed word. Integer-exact end to end.
    "q_bitmap_presence" -> QDef(
      (s, dir) => {
        val e = ev(s, dir).select(col("user_id"), col("ts"))
        val m0 = e.agg(min(date_trunc("month", col("ts"))).as("m0"))
        e.crossJoin(broadcast(m0))
          .filter(date_trunc("month", col("ts")) === col("m0"))
          .select(col("user_id"), dayofmonth(col("ts")).as("day"))
          .groupBy("user_id")
          .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), day - 1))").as("bmp"))
          .select(col("user_id"), col("bmp"),
            expr("CAST(bit_count(bmp) AS BIGINT)").as("active_days"),
            expr("CAST(bit_count(bmp & shiftleft(bmp, 1)) AS BIGINT)").as("adj_pairs"))
          .orderBy("user_id")
      },
      """WITH m AS (SELECT date_trunc('month', MIN(ts)) AS m0 FROM events),
        |d AS (
        |  SELECT user_id, CAST(day(ts) AS INT) AS day
        |  FROM events CROSS JOIN m
        |  WHERE date_trunc('month', ts) = m0),
        |b AS (
        |  SELECT user_id, bit_or(CAST(1 AS BIGINT) << (day - 1)) AS bmp
        |  FROM d GROUP BY 1)
        |SELECT user_id, bmp,
        |  CAST(bit_count(bmp) AS BIGINT) AS active_days,
        |  CAST(bit_count(bmp & (bmp << 1)) AS BIGINT) AS adj_pairs
        |FROM b ORDER BY user_id""".stripMargin)
  )
}
