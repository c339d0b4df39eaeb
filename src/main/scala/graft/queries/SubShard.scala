package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** HOT-USER SUB-SHARDING for per-user sequence windows (r14 verdict
  * task 6 / SURVEY §7c2 item 2): a window partitioned by user_id alone
  * serializes a hot user's whole event history into one task — at a
  * ~1000× skew tier a 100k-event user IS the wall clock. The fix is the
  * classic two-phase shape: partition by (user_id, time-bucket), compute
  * the sequence statistic within each sub-shard, then stitch boundaries
  * through a per-user pass over BUCKET SUMMARIES (one row per non-empty
  * bucket — calendar-bounded, never data-bounded).
  *
  * The lag crosses at most one boundary per sub-shard: only each
  * bucket's FIRST row needs outside information, and that information is
  * exactly the LAST row of the user's previous non-empty bucket — one
  * `lag` over the summary table. Output is therefore IDENTICAL to the
  * plain `lag(...) over (partition by user order by ts, id)` for ANY
  * bucket width (SubShardSpec pins the equality on a hot-user fixture,
  * plus the per-partition row bound).
  *
  * Bucket width ADAPTS to the observed skew ([[bucketSecondsFor]]): at
  * gate scale every user fits one bucket, so the plan degenerates to the
  * original single-window shape (plus summary-scale stages); the
  * day/hour widths only engage when some user's event count crosses the
  * thresholds. The width never changes the OUTPUT (equality above), so
  * the rule needs no oracle replication — unlike cellDepth/planesFor,
  * where geometry is part of the contract.
  */
object SubShard {

  /** Sub-shard width in ticks of the caller's ordering column (`tick`
    * ticks per second — 1 for epoch-seconds, 1e6 for epoch-micros),
    * from the max per-user event count: single bucket below 8k
    * events/user (the plain-window regime), one day to 64k, one hour to
    * 512k, 15 minutes beyond. Integer thresholds; the choice affects
    * only parallelism, never output.
    */
  private[queries] def bucketTicksFor(maxPerUser: Column, tick: Long): Column =
    when(maxPerUser >= 512000L, 900L * tick)
      .when(maxPerUser >= 64000L, 3600L * tick)
      .when(maxPerUser >= 8000L, 86400L * tick)
      .otherwise(lit(Long.MaxValue / 4))

  /** `df` must carry (user_id, event_id, ts_s) plus `carryCols`. Returns
    * the frame with, per carry column c, `prev_<c>` = lag(c, 1) over
    * (PARTITION BY user_id ORDER BY ts_s, event_id), plus the internal
    * `__bkt` (sub-shard id) and `__rn` (1-based rank within sub-shard)
    * columns for callers that chain per-bucket offsets on top (the
    * sessionize cumulative-boundary sum).
    *
    * Shape: one corpus exchange keyed (user_id, __bkt); summaries are
    * |users × non-empty buckets| rows, their window is per-user over
    * bucket counts (calendar-bounded); the stitch join is summary-scale
    * on the build side and reuses the (user_id, __bkt) clustering.
    */
  def withPrev(df: DataFrame, carryCols: Seq[String], tick: Long = 1L): DataFrame = {
    val maxc = df.groupBy("user_id").agg(count(lit(1)).as("c"))
      .agg(coalesce(max("c"), lit(0L)).as("mx"))
    val d = df.crossJoin(broadcast(maxc))
      .withColumn("__bkt", floor(col("ts_s") / bucketTicksFor(col("mx"), tick)))
      .drop("mx")
    val wb = Window.partitionBy("user_id", "__bkt").orderBy("ts_s", "event_id")
    val withIn = carryCols.foldLeft(d) { (acc, c) =>
      acc.withColumn(s"prev_$c", lag(col(c), 1).over(wb))
    }.withColumn("__rn", row_number().over(wb).cast("long"))
    // Last row of each (user, bucket): max over the (ts_s, event_id)
    // struct — the boundary the NEXT bucket's first row stitches to.
    val lastRow = d.groupBy("user_id", "__bkt")
      .agg(max(struct(Seq(col("ts_s").as("t"), col("event_id").as("e")) ++
        carryCols.map(c => col(c).as(c)): _*)).as("__last"))
    val chained = lastRow
      .withColumn("__c", lag(col("__last"), 1).over(
        Window.partitionBy("user_id").orderBy("__bkt")))
      .select(col("user_id"), col("__bkt"), col("__c"))
    carryCols.foldLeft(withIn.join(chained, Seq("user_id", "__bkt"), "left")) {
      (acc, c) =>
        acc.withColumn(s"prev_$c",
          when(col("__rn") === 1, col("__c").getField(c))
            .otherwise(col(s"prev_$c")))
    }.drop("__c")
  }

  /** Per-user GLOBAL running sum of `flagCol` (ordered by ts_s,
    * event_id) on a frame already carrying `__bkt` from [[withPrev]]:
    * within-sub-shard cumulative sum + the chained sum of whole earlier
    * sub-shards (one more summary-scale window). Equals
    * `sum(flag) over (partition by user order by ts, id rows unbounded
    * preceding)` for any bucket width.
    */
  def chainedCumsum(df: DataFrame, flagCol: String, outCol: String): DataFrame = {
    val wb = Window.partitionBy("user_id", "__bkt").orderBy("ts_s", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = df.groupBy("user_id", "__bkt").agg(sum(col(flagCol)).as("__tot"))
      .withColumn("__off", coalesce(sum("__tot").over(
        Window.partitionBy("user_id").orderBy("__bkt")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("user_id"), col("__bkt"), col("__off"))
    df.join(tot, Seq("user_id", "__bkt"))
      .withColumn(outCol, col("__off") + sum(col(flagCol)).over(wb))
      .drop("__off")
  }
}
