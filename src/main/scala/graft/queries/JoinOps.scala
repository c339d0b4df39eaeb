package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Temporal join operators Spark lacks as built-ins, composed from
  * shuffle-friendly primitives.
  *
  * - AS-OF join: the union+window formulation — tag both sides, sort by
  *   (key, time) inside one shuffle partitioned by key, and carry the
  *   right side forward with last(ignoreNulls) over an unbounded-preceding
  *   frame. One shuffle total, no range explosion, no per-row probe —
  *   the standard distributed as-of at any scale.
  * - Banded range join: an interval predicate with no equi-key becomes an
  *   equi-join on a time bin whose width matches the range width — each
  *   left row lands in at most 2 bins, so the fan-out is bounded and the
  *   shuffle key has high cardinality (scales with the time span, not
  *   with a blocking attribute's cardinality).
  */
object JoinOps {

  private def ev(s: SparkSession, dir: String): DataFrame = Tables(s, dir, "events")

  /** The as-of "most recent purchase at or before each row" carry over
    * the tagged click∪purchase union (user_id, ts_s, event_id,
    * purch_value, is_b). Cold corpora (mx below the SubShard threshold)
    * get the single user-partitioned window; hot ones decompose over
    * (user, time-bucket) sub-shards: within-bucket running last purchase
    * ⊕ the MAX-(ts, event_id) purchase of all EARLIER buckets (a struct
    * max over the per-bucket summary — bucketing is by ts alone, so
    * earlier buckets are strictly earlier in time). event_id rides in
    * the struct so the cross-bucket winner matches the window's `last`
    * under equal-ts purchase ties (r15 verdict item 2); output is
    * identical for any bucket width — SubShardSpec pins the equality on
    * a fixture with same-ts purchase pairs at bucket boundaries.
    */
  private[queries] def asofCarry(tagged: DataFrame, mx: Long): DataFrame = {
    val ord = Seq(col("ts_s").asc, col("is_b").desc, col("event_id").asc_nulls_first)
    if (mx < SubShard.HotThreshold) {
      val w = Window.partitionBy("user_id").orderBy(ord: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tagged
        .withColumn("last_purch_ts",
          last(when(col("is_b") === 1, col("ts_s")), ignoreNulls = true).over(w))
        .withColumn("last_purch_value",
          last(when(col("is_b") === 1, col("purch_value")), ignoreNulls = true).over(w))
    } else {
      val pStruct = when(col("is_b") === 1,
        struct(col("ts_s").as("pt"), col("event_id").as("eid"),
          col("purch_value").as("pv")))
      val d = tagged.withColumn("__bkt",
        floor(col("ts_s") / lit(SubShard.widthTicks(mx, 1L))))
      val wb = Window.partitionBy("user_id", "__bkt").orderBy(ord: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val summary = d.groupBy("user_id", "__bkt")
        .agg(max(pStruct).as("__bl"))
        .withColumn("__prior", max(col("__bl")).over(
          Window.partitionBy("user_id").orderBy("__bkt")
            .rowsBetween(Window.unboundedPreceding, -1)))
        .select(col("user_id"), col("__bkt"), col("__prior"))
      d.withColumn("__s", last(pStruct, ignoreNulls = true).over(wb))
        .join(summary, Seq("user_id", "__bkt"), "left")
        .withColumn("__r", coalesce(col("__s"), col("__prior")))
        .withColumn("last_purch_ts", col("__r.pt"))
        .withColumn("last_purch_value", col("__r.pv"))
    }
  }

  val defs: Map[String, QDef] = Map(

    // §2.1c as-of join: each click joined to the user's most recent
    // purchase at or before it (purchases pre-aggregated per (user, sec)
    // so ties are deterministic on both engines).
    "q_asof_join" -> QDef(
      (s, dir) => {
        val e = ev(s, dir).select(
          col("event_id"), col("user_id"),
          unix_timestamp(col("ts")).as("ts_s"), col("event_type"), col("value"))
        val clicks = e.filter(col("event_type") === "click")
        // Pre-aggregated per (user, sec) so pt is unique per user; the
        // representative event_id (max over the collapsed group) rides
        // along so the window tie-break — and the hot path's struct max
        // — stays deterministic even if the pre-agg is ever relaxed.
        val purch = e.filter(col("event_type") === "purchase")
          .groupBy("user_id", "ts_s")
          .agg(round(max("value"), 2).as("purch_value"),
            max("event_id").as("p_eid"))
        val tagged = purch
          .select(col("user_id"), col("ts_s"),
            col("p_eid").as("event_id"), col("purch_value"), lit(1).as("is_b"))
          .unionByName(clicks.select(col("user_id"), col("ts_s"), col("event_id"),
            lit(null).cast("double").as("purch_value"), lit(0).as("is_b")))
        // At equal ts the purchase sorts first (is_b desc) — ts >= match.
        // Skew dispatch off the RAW events frame — an upper bound on
        // tagged's per-user count (conservative: may shard a user whose
        // tagged rows are fewer; output is width-invariant so that's
        // free), and the counting pass is one scan+agg instead of
        // re-evaluating the union + purchase pre-aggregation twice.
        val mx = SubShard.maxPerUser(e.select(col("user_id")))
        asofCarry(tagged, mx)
          .filter(col("is_b") === 0)
          .select(col("user_id"), col("event_id"), col("ts_s"),
            col("last_purch_ts"), col("last_purch_value"))
          .orderBy("user_id", "event_id")
      },
      """WITH e AS (SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
        |    event_type, value FROM events),
        |c AS (SELECT event_id, user_id, ts_s FROM e WHERE event_type = 'click'),
        |p AS (SELECT user_id, ts_s, ROUND(MAX(value), 2) AS purch_value
        |      FROM e WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT c.user_id, c.event_id, c.ts_s,
        |  p.ts_s AS last_purch_ts, p.purch_value AS last_purch_value
        |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts_s >= p.ts_s
        |ORDER BY c.user_id, c.event_id""".stripMargin),

    // §2.1c banded range join (no equi-key): clicks in the 60 s window
    // before each error, joined through a 60 s time bin (each error spans
    // at most 2 bins) instead of a nested-loop inequality join.
    "q_range_join" -> QDef(
      (s, dir) => {
        val binW = 60L
        val base = ev(s, dir).select(
          col("event_id"), unix_timestamp(col("ts")).as("ts_s"), col("event_type"))
        val err = base.filter(col("event_type") === "error")
          .select(col("event_id"), col("ts_s"),
            explode(array_distinct(array(
              (col("ts_s") / binW).cast("long"),
              ((col("ts_s") - lit(binW)) / binW).cast("long")))).as("bin"))
        val clk = base.filter(col("event_type") === "click")
          .select(col("ts_s").as("c_ts"), (col("ts_s") / binW).cast("long").as("bin"))
        err.join(clk,
            err("bin") === clk("bin") &&
              clk("c_ts") >= err("ts_s") - binW && clk("c_ts") <= err("ts_s"),
            "left")
          .groupBy("event_id", "ts_s")
          .agg(count(col("c_ts")).as("n_clicks_60s"))
          .orderBy("event_id")
      },
      """WITH e AS (SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, event_type
        |    FROM events),
        |err AS (SELECT event_id, ts_s FROM e WHERE event_type = 'error'),
        |clk AS (SELECT ts_s FROM e WHERE event_type = 'click')
        |SELECT err.event_id, err.ts_s, COUNT(clk.ts_s) AS n_clicks_60s
        |FROM err LEFT JOIN clk ON clk.ts_s BETWEEN err.ts_s - 60 AND err.ts_s
        |GROUP BY 1, 2 ORDER BY event_id""".stripMargin)
  )
}
