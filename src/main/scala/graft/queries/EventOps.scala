package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Batch analytics over the `events` table: tumbling-window aggregation
  * and gap-based sessionization. These are the batch-parity twins of the
  * Structured Streaming operators in graft.streaming (same semantics,
  * verified against the DuckDB oracle here; the streaming versions are
  * spec-tested with MemoryStream).
  *
  * Timestamps are compared at whole-second granularity (unix epoch) so
  * the ns-precision parquet source and Spark's µs timestamps agree.
  */
object EventOps {

  private def ev(s: SparkSession, dir: String): DataFrame = Tables(s, dir, "events")

  val defs: Map[String, QDef] = Map(

    // §2.4#47 tumbling hourly aggregation per event type
    "ev_tumbling_agg" -> QDef(
      (s, dir) =>
        ev(s, dir)
          .groupBy(
            date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
            col("event_type"))
          .agg(
            count(lit(1)).as("n_events"),
            // Money discipline: per-(hour,type) groups grow with event
            // density; value is 2-dp exact → lossless DECIMAL sum is
            // partial-agg-order independent at any scale.
            round(sum(col("value").cast("decimal(12,2)")), 2)
              .cast("double").as("sum_value"),
            count_distinct(col("user_id")).as("n_users"))
          .orderBy("hour_start", "event_type"),
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
        |  event_type,
        |  COUNT(*) AS n_events,
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_value,
        |  COUNT(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // §2.4#48 sessionization: 30-minute inactivity gap splits sessions;
    // classic lag + cumulative-sum-of-boundaries formulation — r15:
    // computed through [[SubShard]] (user × time-bucket sub-shards with
    // boundary stitching), so a ~100k-event hot user parallelizes
    // across buckets instead of serializing one task; at gate scale the
    // adaptive width keeps one bucket per user and the plan degenerates
    // to the original single window. Output identical for any width
    // (SubShardSpec pins the equality + per-partition row bound).
    "ev_sessionize" -> QDef(
      (s, dir) => {
        val base = ev(s, dir)
          .select(col("user_id"), col("event_id"), unix_timestamp(col("ts")).as("ts_s"))
        val mx = SubShard.maxPerUser(base)
        val flagged = SubShard.withPrev(base, Seq("ts_s"), mx = mx)
          .withColumn("is_new",
            when(col("prev_ts_s").isNull || col("ts_s") - col("prev_ts_s") > 1800, 1L)
              .otherwise(0L))
        SubShard.chainedCumsum(flagged, "is_new", "session_idx", mx = mx)
          .groupBy("user_id", "session_idx")
          .agg(
            count(lit(1)).as("n_events"),
            (max("ts_s") - min("ts_s")).as("duration_s"))
          .orderBy("user_id", "session_idx")
      },
      """WITH e AS (
        |  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s FROM events),
        |g AS (
        |  SELECT *, CASE WHEN LAG(ts_s) OVER w IS NULL
        |                   OR ts_s - LAG(ts_s) OVER w > 1800 THEN 1 ELSE 0 END AS is_new
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)),
        |sess AS (
        |  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        |  FROM g)
        |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
        |  COUNT(*) AS n_events,
        |  CAST(MAX(ts_s) - MIN(ts_s) AS BIGINT) AS duration_s
        |FROM sess GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // Overlapping (hopping) windows in BATCH through the same
    // functions.window() that Structured Streaming uses — 10-minute
    // windows sliding every 5, so each event lands in exactly two
    // windows. Spark expands the event to its windows map-side and the
    // aggregation partial-reduces before the exchange: shuffle carries
    // |windows × types| rows, not 2×|events|. The oracle derives the
    // same two window starts arithmetically.
    "ev_hopping_agg" -> QDef(
      (s, dir) =>
        ev(s, dir)
          .groupBy(
            window(col("ts"), "10 minutes", "5 minutes").as("w"),
            col("event_type"))
          .agg(
            count(lit(1)).as("n_events"),
            // Money discipline: window×type groups grow with density
            round(sum(col("value").cast("decimal(12,2)")), 2)
              .cast("double").as("sum_value"))
          .select(
            date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
            col("event_type"), col("n_events"), col("sum_value"))
          .orderBy("win_start", "event_type"),
      """WITH hops AS (
        |  SELECT unnest([
        |           CAST(floor(epoch(ts) / 300) AS BIGINT) * 300,
        |           CAST(floor(epoch(ts) / 300) AS BIGINT) * 300 - 300]) AS win_s,
        |         event_type, value
        |  FROM events)
        |SELECT strftime(make_timestamp(win_s * 1000000), '%Y-%m-%d %H:%M:%S') AS win_start,
        |       event_type,
        |       COUNT(*) AS n_events,
        |       CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_value
        |FROM hops GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // Rolling 7-day distinct users from MERGEABLE per-day HLL sketches:
    // the raw events are scanned once (per-day sketches + exact anchor);
    // each rolling window then merges 7 stored sketches instead of
    // re-scanning a week of raw events — the only formulation that
    // scales, since exact sliding distinct needs the full event set per
    // window. The sketch union runs as a WINDOW aggregate over the
    // |days|-row frame (tiny — the single-partition window is bounded by
    // the calendar, not the data). Gate: sketch estimate within 5%+1 of
    // the exact rolling count, which the oracle recomputes from raws.
    "ev_rolling_distinct" -> QDef(
      (s, dir) => {
        val evDay = ev(s, dir)
          .select(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("user_id"))
        val daily = evDay.groupBy("day").agg(
          expr("hll_sketch_agg(user_id, 14)").as("sk"))
        // CALENDAR-bounded frame (range over day numbers), not a row
        // frame: with a zero-event day in the range, 7 ROWS would span
        // more than 7 days and diverge from the exact anchor below.
        val w = Window.orderBy("day_num").rangeBetween(-6, 0)
        val est = daily
          .withColumn("day_num", datediff(to_date(col("day")), lit("1970-01-01")))
          .withColumn("roll_sk", expr("hll_union_agg(sk)").over(w))
          .select(col("day"),
            expr("CAST(hll_sketch_estimate(roll_sk) AS BIGINT)").as("est_roll"))
        // Exact rolling distinct (oracle anchor): day spine × events
        // within the window — the cost the sketch path avoids.
        val days = daily.select(col("day"))
        val exact = days.join(evDay.withColumnRenamed("day", "eday"),
            col("eday") <= col("day") &&
              col("eday") >= date_format(date_sub(to_date(col("day")), 6), "yyyy-MM-dd"))
          .groupBy("day").agg(countDistinct("user_id").as("exact_roll"))
        est.join(exact, "day")
          .select(col("day"), col("exact_roll"),
            (abs(col("est_roll") - col("exact_roll"))
              <= col("exact_roll") * 0.05 + lit(1)).as("roll_ok"))
          .orderBy("day")
      },
      """WITH evd AS (
        |  SELECT strftime(ts, '%Y-%m-%d') AS day, user_id FROM events),
        |days AS (SELECT DISTINCT day FROM evd)
        |SELECT d.day,
        |       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS exact_roll,
        |       true AS roll_ok
        |FROM days d JOIN evd e
        |  ON e.day <= d.day
        | AND e.day >= strftime(CAST(d.day AS DATE) - INTERVAL 6 DAY, '%Y-%m-%d')
        |GROUP BY d.day ORDER BY d.day""".stripMargin),

    // §2 25kn OPERATOR-ONLY twin of ev_rolling_distinct (r14 verdict
    // task 3): the gated key recomputes the EXACT rolling distinct
    // in-band as its 5%+1 anchor — a day-spine × week-of-raw-events
    // join that dominates the wall at scale (~100% of the sf11 entry,
    // SURVEY §6q), so its bench entry times the ground truth, not the
    // sketch path. This twin is the production path alone: per-day HLL
    // sketches, calendar-bounded rolling union, estimate — with a
    // sanity contract the oracle states without the anchor (one row per
    // day; estimate within [1, 1.05·total+1]). The 5%+1 accuracy stays
    // gated by ev_rolling_distinct.
    "ev_rolling_distinct_op" -> QDef(
      (s, dir) => {
        val evDay = ev(s, dir)
          .select(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("user_id"))
        val daily = evDay.groupBy("day").agg(
          expr("hll_sketch_agg(user_id, 14)").as("sk"))
        val w = Window.orderBy("day_num").rangeBetween(-6, 0)
        val est = daily
          .withColumn("day_num", datediff(to_date(col("day")), lit("1970-01-01")))
          .withColumn("roll_sk", expr("hll_union_agg(sk)").over(w))
          .select(col("day"),
            expr("CAST(hll_sketch_estimate(roll_sk) AS BIGINT)").as("est_roll"))
        val total = evDay.agg(countDistinct("user_id").as("total_users"))
        est.crossJoin(broadcast(total))
          .select(col("day"),
            (col("est_roll") >= 1 &&
              col("est_roll") <= col("total_users") * 1.05 + 1).as("est_bounded"))
          .orderBy("day")
      },
      """SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS day, true AS est_bounded
        |FROM events ORDER BY day""".stripMargin),

    // First-order Markov transition matrix over per-user event
    // sequences: P(next event_type | current) from lag pairs. The lag
    // window partitions by user (high-cardinality, no skew); pair counts
    // partial-aggregate to |types|² rows before the exchange, and the
    // row-normalizing denominator joins back from a tiny aggregate —
    // the sequence-model statistic a behavioral pipeline feeds on.
    // Probability is one exact-rounded division of two integers.
    "ev_transition_matrix" -> QDef(
      (s, dir) => {
        // r15: lead(event_type) per user re-expressed as the PREV of
        // each event through [[SubShard]] — an adjacent pair (cur→nxt)
        // is exactly (prev_event_type→event_type) on the rows where
        // prev exists, so the hot-user sub-sharding applies unchanged.
        // Ordering ticks are epoch-MICROS: the original window ordered
        // by the raw microsecond timestamp, and second-truncation could
        // reorder same-second pairs against the oracle.
        val base = ev(s, dir)
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("ts_s"), col("event_type"))
        val pairs = SubShard.withPrev(base, Seq("event_type"), tick = 1000000L)
          .filter(col("prev_event_type").isNotNull)
          .groupBy(col("prev_event_type").as("cur"), col("event_type").as("nxt"))
          .agg(count(lit(1)).as("n"))
        val outd = pairs.groupBy("cur").agg(sum("n").as("tot"))
        pairs.join(broadcast(outd), "cur")
          .select(col("cur"), col("nxt"), col("n"),
            round(col("n") / col("tot").cast("double"), 6).as("p"))
          .orderBy("cur", "nxt")
      },
      """WITH seq AS (
        |  SELECT event_type AS cur,
        |         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
        |  FROM events),
        |pairs AS (
        |  SELECT cur, nxt, COUNT(*) AS n FROM seq WHERE nxt IS NOT NULL GROUP BY cur, nxt),
        |outd AS (SELECT cur, SUM(n) AS tot FROM pairs GROUP BY cur)
        |SELECT cur, nxt, n, ROUND(n / CAST(tot AS DOUBLE), 6) AS p
        |FROM pairs JOIN outd USING (cur) ORDER BY cur, nxt""".stripMargin),

    // First/last-touch attribution: every purchase event attributes to
    // the user's first and most recent click strictly before it. One
    // per-user window pass (running min/max over a conditional column) —
    // no self-join of the event stream against itself, which is the
    // naive formulation that explodes at scale. Timestamps out as
    // epoch-second integers: exact on both engines.
    "ev_attribution" -> QDef(
      (s, dir) => {
        // r15: the running min/max ride [[SubShard.chainedRunningAgg]]
        // (user × time-bucket sub-shards, within-shard running agg ⊕
        // whole-earlier-shard agg) so a hot user's history no longer
        // serializes one task; output identical to the plain window.
        val base = ev(s, dir)
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_timestamp(col("ts")).as("ts_s"))
          .withColumn("click_ts",
            when(col("event_type") === "click", col("ts_s")))
        SubShard.chainedRunningAgg(base,
            Seq(("click_ts", "min", "first_click"), ("click_ts", "max", "last_click")))
          .filter(col("event_type") === "purchase" && col("first_click").isNotNull)
          .select(col("user_id"), col("event_id"), col("ts_s"),
            col("first_click"), col("last_click"))
          .orderBy("user_id", "event_id")
      },
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |         CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
        |  FROM events),
        |w AS (
        |  SELECT user_id, event_id, event_type, ts_s,
        |         MIN(CASE WHEN event_type = 'click' THEN ts_s END)
        |           OVER (PARTITION BY user_id ORDER BY ts_s, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS first_click,
        |         MAX(CASE WHEN event_type = 'click' THEN ts_s END)
        |           OVER (PARTITION BY user_id ORDER BY ts_s, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click
        |  FROM e)
        |SELECT user_id, event_id, ts_s, first_click, last_click
        |FROM w WHERE event_type = 'purchase' AND first_click IS NOT NULL
        |ORDER BY user_id, event_id""".stripMargin),

    // Audience overlap from HLL sketch algebra: |A∩B| estimated by
    // inclusion-exclusion over the per-segment sketches (est_A + est_B −
    // est_union) — the two-scan-free way to answer overlap questions
    // across materialized per-segment sketches. The error budget scales
    // with the UNION (each of the three estimates carries ~0.8% relative
    // error of ITS cardinality at lgK=14, and inclusion-exclusion adds
    // them), NOT with the overlap — a gate proportional to a small
    // overlap would trip on estimator noise alone at any scale where
    // overlap ≪ union. All three exact anchors are hashable output.
    "q_hll_overlap" -> QDef(
      (s, dir) => {
        val e = ev(s, dir).select(col("event_type"), col("user_id"))
        val sk = e.filter(col("event_type").isin("click", "purchase"))
          .groupBy("event_type")
          .agg(expr("hll_sketch_agg(user_id, 14)").as("sk"),
            countDistinct("user_id").as("exact"))
        val est = sk.agg(
          expr("CAST(hll_sketch_estimate(hll_union_agg(sk)) AS BIGINT)").as("est_union"),
          sum(expr("CAST(hll_sketch_estimate(sk) AS BIGINT)")).as("est_sum"),
          min(when(col("event_type") === "click", col("exact"))).as("exact_click"),
          min(when(col("event_type") === "purchase", col("exact"))).as("exact_purchase"))
        val exactOverlap = e.filter(col("event_type") === "click").select("user_id").distinct()
          .join(e.filter(col("event_type") === "purchase").select("user_id").distinct(),
            Seq("user_id"), "left_semi")
          .agg(count(lit(1)).as("exact_overlap"))
        est.crossJoin(broadcast(exactOverlap))
          .select(
            col("exact_click"), col("exact_purchase"), col("exact_overlap"),
            (abs((col("est_sum") - col("est_union")) - col("exact_overlap"))
              <= (col("exact_click") + col("exact_purchase") - col("exact_overlap")) * 0.05
                + lit(5)).as("overlap_ok"))
      },
      """WITH c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
        |p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
        |o AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact_overlap
        |      FROM c WHERE EXISTS (SELECT 1 FROM p WHERE p.user_id = c.user_id))
        |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS exact_click,
        |       (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS exact_purchase,
        |       exact_overlap, true AS overlap_ok
        |FROM o""".stripMargin),

    // Exponentially-weighted moving average of daily event volume
    // WITHOUT a recursive loop: y_t = α·Σ (1−α)^(t−i)·x_i rewrites as
    // α·(1−α)^t · prefix_sum(x_i/(1−α)^i) — one ORDERED cumulative
    // window over the calendar-bounded daily series (the running sum
    // evaluates in frame order, so both engines add the same terms in
    // the same sequence). α = 0.3. The series is bounded to the most
    // recent 365 days BEFORE indexing: the scale factor 1/0.7^t grows
    // as 1.43^t and overflows double at t≈2090, so an unbounded
    // calendar would walk off a numeric cliff — within the bounded
    // horizon the factors stay ≤ ~1e57 and terms older than ~40 days
    // sit below the 4dp rounding anyway (0.7^40 ≈ 6e-7).
    "ev_ewma" -> QDef(
      (s, dir) => {
        val daily = ev(s, dir)
          .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
          .agg(count(lit(1)).as("x"))
        val horizon = daily.agg(max("day").as("dmax"))
        val recent = daily.crossJoin(broadcast(horizon))
          .filter(datediff(to_date(col("dmax")), to_date(col("day"))) < 365)
        val t0 = recent.agg(min("day").as("d0"))
        val w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
        recent.crossJoin(broadcast(t0))
          .withColumn("t", datediff(to_date(col("day")), to_date(col("d0"))))
          .withColumn("scaled", col("x") / pow(lit(0.7), col("t")))
          .withColumn("ewma",
            round(lit(0.3) * pow(lit(0.7), col("t")) * sum("scaled").over(w), 4))
          .select(col("day"), col("x"), col("ewma"))
          .orderBy("day")
      },
      """WITH daily AS (
        |  SELECT strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS x
        |  FROM events GROUP BY 1),
        |h AS (SELECT MAX(day) AS dmax FROM daily),
        |recent AS (
        |  SELECT day, x FROM daily, h
        |  WHERE date_diff('day', CAST(day AS DATE), CAST(dmax AS DATE)) < 365),
        |t0 AS (SELECT MIN(day) AS d0 FROM recent),
        |s AS (
        |  SELECT day, x, date_diff('day', CAST(d0 AS DATE), CAST(day AS DATE)) AS t,
        |         x / pow(0.7e0, date_diff('day', CAST(d0 AS DATE), CAST(day AS DATE))) AS scaled
        |  FROM recent, t0)
        |SELECT day, x,
        |       ROUND(0.3e0 * pow(0.7e0, t) *
        |             SUM(scaled) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |             4) AS ewma
        |FROM s ORDER BY day""".stripMargin)
  )
}
