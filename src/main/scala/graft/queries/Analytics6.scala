package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-7 analytics tranche 2: behavioral path mining, experiment
  * significance testing, robust (winsorized) aggregation, and
  * month-over-month trend reporting.
  */
object Analytics6 {

  val defs: Map[String, QDef] = Map(

    // §2 25he top behavioral trigram paths: per-user event sequences
    // (ordered by ts with event_id as the total-order tie-break —
    // duplicate timestamps exist in the stream), consecutive
    // three-step paths counted corpus-wide. Windows partition by
    // user_id (high cardinality); the path table partial-aggregates to
    // |event_types|³ rows before its only exchange. Top 20 by
    // (count DESC, path ASC).
    "ev_funnel_paths" -> QDef(
      (s, dir) => {
        // r15: the lead-1/lead-2 trigram re-expressed through TWO
        // SubShard.withPrev passes — a consecutive triple is
        // (prev_prev, prev, cur) on rows where both exist, the same
        // multiset as (cur, lead1, lead2) — so a hot user's history
        // sub-shards instead of serializing one task (micro ticks: the
        // original window ordered by the raw timestamp).
        val base = Tables(s, dir, "events")
          .select(col("user_id"), unix_micros(col("ts")).as("ts_s"),
            col("event_id"), col("event_type"))
        // The max-per-user count is computed once and threaded through
        // both passes; pass 2 reuses pass 1's __bkt when hot.
        val mx = SubShard.maxPerUser(base)
        val p1 = SubShard.withPrev(base, Seq("event_type"), tick = 1000000L, mx = mx)
          .drop("__rn")
        val p2 = SubShard.withPrev(p1, Seq("prev_event_type"), tick = 1000000L, mx = mx)
        p2.filter(col("prev_prev_event_type").isNotNull)
          .select(concat_ws(">", col("prev_prev_event_type"),
            col("prev_event_type"), col("event_type")).as("path"))
          .groupBy("path").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("path").asc)
          .limit(20)
      },
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |    LEAD(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
        |    LEAD(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e3
        |  FROM events)
        |SELECT event_type || '>' || e2 || '>' || e3 AS path, COUNT(*) AS n
        |FROM seq WHERE e3 IS NOT NULL
        |GROUP BY 1 ORDER BY n DESC, path ASC LIMIT 20""".stripMargin),

    // §2 25hf two-proportion z-test per market segment (the A/B-test
    // readout): each segment's urgent-order rate against the REST of
    // the population, pooled-variance z statistic, ±1.96 significance.
    // One fact join (customer dim broadcasts), one partial agg to 5
    // segment rows; z is a single fixed-order double expression over
    // exact integer counts, so both engines agree bit-for-bit.
    "q_ab_test" -> QDef(
      (s, dir) => {
        val seg = Tables(s, dir, "orders")
          .join(broadcast(Tables(s, dir, "customer")
            .select(col("c_custkey"), col("c_mktsegment"))),
            col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment").as("segment"))
          .agg(count(lit(1)).as("n"),
            sum((col("o_orderpriority") === "1-URGENT").cast("long")).as("k"))
        val tot = seg.agg(sum("n").as("nt"), sum("k").as("kt"))
        seg.crossJoin(broadcast(tot))
          .select(col("segment"), col("n"), col("k"),
            round(col("k").cast("double") / col("n").cast("double"), 6).as("rate"),
            ((col("k").cast("double") / col("n").cast("double") -
              (col("kt") - col("k")).cast("double") / (col("nt") - col("n")).cast("double")) /
              sqrt((col("kt").cast("double") / col("nt").cast("double")) *
                (lit(1.0) - col("kt").cast("double") / col("nt").cast("double")) *
                (lit(1.0) / col("n").cast("double") +
                  lit(1.0) / (col("nt") - col("n")).cast("double")))).as("zraw"))
          .select(col("segment"), col("n"), col("k"), col("rate"),
            round(col("zraw"), 4).as("z"),
            (abs(col("zraw")) > 1.96).as("significant"))
          .orderBy("segment")
      },
      """WITH seg AS (
        |  SELECT c_mktsegment AS segment, COUNT(*) AS n,
        |    SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS k
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1),
        |tot AS (SELECT SUM(n) AS nt, SUM(k) AS kt FROM seg)
        |SELECT segment, CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
        |  ROUND(CAST(k AS DOUBLE) / CAST(n AS DOUBLE), 6) AS rate,
        |  ROUND((CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
        |     - CAST(kt - k AS DOUBLE) / CAST(nt - n AS DOUBLE))
        |    / SQRT((CAST(kt AS DOUBLE) / CAST(nt AS DOUBLE))
        |      * (1.0 - CAST(kt AS DOUBLE) / CAST(nt AS DOUBLE))
        |      * (1.0 / CAST(n AS DOUBLE) + 1.0 / CAST(nt - n AS DOUBLE))), 4) AS z,
        |  ABS((CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
        |     - CAST(kt - k AS DOUBLE) / CAST(nt - n AS DOUBLE))
        |    / SQRT((CAST(kt AS DOUBLE) / CAST(nt AS DOUBLE))
        |      * (1.0 - CAST(kt AS DOUBLE) / CAST(nt AS DOUBLE))
        |      * (1.0 / CAST(n AS DOUBLE) + 1.0 / CAST(nt - n AS DOUBLE)))) > 1.96
        |    AS significant
        |FROM seg CROSS JOIN tot ORDER BY segment""".stripMargin),

    // §2 25hg winsorized aggregation of extended price (robust-mean
    // reporting): the P5/P95 clamp thresholds are EXACT order
    // statistics located by the bucket-offset global row number
    // (fourth deployment of the pattern — never a fact-scale global
    // window), broadcast back, values clamped, mean from an exact
    // DECIMAL sum. The total order is (value, orderkey·8+linenumber),
    // unique because linenumber < 8.
    "curate_winsorize" -> QDef(
      (s, dir) => {
        val li = Tables(s, dir, "lineitem").select(
          col("l_extendedprice").cast("decimal(18,2)").as("x"),
          (col("l_orderkey") * 8 + col("l_linenumber")).as("tie"))
        val ranked = Buckets.globalRowNumber(li, col("x"), col("tie"))
        val n = broadcast(li.agg(count(lit(1)).as("n")))
        val cuts = ranked.crossJoin(n)
          .filter(col("i") === ceil(col("n") * 0.05) ||
            col("i") === ceil(col("n") * 0.95))
          .groupBy().agg(min("x").as("lo"), max("x").as("hi"))
        li.crossJoin(broadcast(cuts)).crossJoin(n)
          .select(col("n"),
            col("lo"), col("hi"),
            when(col("x") < col("lo"), col("lo"))
              .when(col("x") > col("hi"), col("hi"))
              .otherwise(col("x")).as("w"),
            col("x"))
          .groupBy("n")
          .agg(max("lo").as("l"), max("hi").as("h"),
            sum("w").as("sw"), sum("x").as("sx"))
          .select(col("n"),
            round(col("l").cast("double"), 2).as("p5"),
            round(col("h").cast("double"), 2).as("p95"),
            round(col("sw").cast("double") / col("n").cast("double"), 4)
              .as("winsorized_mean"),
            round(col("sx").cast("double") / col("n").cast("double"), 4)
              .as("raw_mean"))
      },
      """WITH li AS (
        |  SELECT CAST(l_extendedprice AS DECIMAL(18,2)) AS x,
        |         l_orderkey * 8 + l_linenumber AS tie
        |  FROM lineitem),
        |nn AS (SELECT COUNT(*) AS n FROM li),
        |ranked AS (
        |  SELECT x, ROW_NUMBER() OVER (ORDER BY x, tie) AS i FROM li),
        |cuts AS (
        |  SELECT MIN(x) AS lo, MAX(x) AS hi
        |  FROM ranked CROSS JOIN nn
        |  WHERE i = CAST(CEIL(n * 0.05) AS BIGINT) OR i = CAST(CEIL(n * 0.95) AS BIGINT))
        |SELECT n,
        |  ROUND(CAST(MAX(lo) AS DOUBLE), 2) AS p5,
        |  ROUND(CAST(MAX(hi) AS DOUBLE), 2) AS p95,
        |  ROUND(CAST(SUM(CASE WHEN x < lo THEN lo WHEN x > hi THEN hi ELSE x END)
        |          AS DOUBLE) / CAST(n AS DOUBLE), 4) AS winsorized_mean,
        |  ROUND(CAST(SUM(x) AS DOUBLE) / CAST(n AS DOUBLE), 4) AS raw_mean
        |FROM li CROSS JOIN cuts CROSS JOIN nn
        |GROUP BY n""".stripMargin),

    // §2 25hh month-over-month revenue growth: exact DECIMAL monthly
    // sums over the calendar-bounded month table, growth as one
    // fixed-order double division against the LAG row. First month
    // reports NULL growth on both engines.
    "q_mom_growth" -> QDef(
      (s, dir) => {
        val monthly = Tables(s, dir, "orders")
          .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
          .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
        val w = Window.orderBy("month")
        monthly
          .withColumn("prev", lag("rev", 1).over(w))
          .select(col("month"),
            round(col("rev").cast("double"), 2).as("revenue"),
            round((col("rev") - col("prev")).cast("double") /
              col("prev").cast("double"), 6).as("growth"))
          .orderBy("month")
      },
      """WITH monthly AS (
        |  SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders GROUP BY 1),
        |lagged AS (
        |  SELECT month, rev, LAG(rev, 1) OVER (ORDER BY month) AS prev FROM monthly)
        |SELECT month, ROUND(CAST(rev AS DOUBLE), 2) AS revenue,
        |       ROUND(CAST(rev - prev AS DOUBLE) / CAST(prev AS DOUBLE), 6) AS growth
        |FROM lagged ORDER BY month""".stripMargin)
  )
}
