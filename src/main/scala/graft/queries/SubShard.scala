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
  * The sharded plan engages ONLY when the observed skew needs it: the
  * max per-user event count is ONE DRIVER-SIDE LONG ([[maxPerUser]] — a
  * bounded collect, the codebook-scale class) and below the 8k-event
  * threshold every helper emits the ORIGINAL single-window plan, so the
  * gate-scale cost is one cheap counting aggregate, not three extra
  * exchanges (the first in-plan variant of this adaptivity cost 3–9× at
  * sf0.1). The width never changes the OUTPUT (equality above), so the
  * rule needs no oracle replication — unlike cellDepth/planesFor, where
  * geometry is part of the contract.
  */
object SubShard {

  /** Sub-shard threshold: below this max per-user count the plain
    * user-partitioned window wins (its one task per user is ~ms work).
    */
  private[queries] val HotThreshold = 8000L

  /** Sub-shard width in ticks of the caller's ordering column (`tick`
    * ticks per second — 1 for epoch-seconds, 1e6 for epoch-micros) from
    * the max per-user event count: one day to 64k events/user, one hour
    * to 512k, 15 minutes beyond. Integer thresholds; the choice affects
    * only parallelism, never output. SubShardSpec pins the table.
    */
  private[queries] def widthTicks(maxPerUser: Long, tick: Long): Long =
    if (maxPerUser >= 512000L) 900L * tick
    else if (maxPerUser >= 64000L) 3600L * tick
    else if (maxPerUser >= HotThreshold) 86400L * tick
    else Long.MaxValue / 4

  /** Max per-user event count — ONE bounded driver-side long (the
    * collect is a 1-row aggregate; bound documented here per the
    * repo-wide collect discipline). QDefs compute it once and thread it
    * through the helpers so the pass runs once per query, not per
    * helper.
    */
  def maxPerUser(df: DataFrame): Long = {
    val r = df.groupBy("user_id").agg(count(lit(1)).as("c"))
      .agg(coalesce(max("c"), lit(0L))).collect()(0)
    r.getLong(0)
  }

  private def plainW = Window.partitionBy("user_id").orderBy("ts_s", "event_id")

  /** Add the sub-shard id `__bkt` for a KNOWN-hot corpus. Composable
    * base for the chained helpers — shard once, chain several
    * statistics.
    */
  private def shard(df: DataFrame, mx: Long, tick: Long): DataFrame =
    df.withColumn("__bkt", floor(col("ts_s") / lit(widthTicks(mx, tick))))

  /** `df` must carry (user_id, event_id, ts_s) plus `carryCols`. Returns
    * the frame with, per carry column c, `prev_<c>` = lag(c, 1) over
    * (PARTITION BY user_id ORDER BY ts_s, event_id), plus the internal
    * `__bkt` (sub-shard id) and `__rn` (1-based rank within sub-shard)
    * columns for callers that chain per-bucket offsets on top (the
    * sessionize cumulative-boundary sum).
    *
    * `mx` is the [[maxPerUser]] count (computed if absent). Below
    * [[HotThreshold]] this IS the plain window (plus constant __bkt) —
    * zero added exchanges. Hot shape: one corpus exchange keyed
    * (user_id, __bkt); summaries are |users × non-empty buckets| rows,
    * their window is per-user over bucket counts (calendar-bounded);
    * the stitch join is summary-scale on the build side.
    */
  def withPrev(df: DataFrame, carryCols: Seq[String], tick: Long = 1L,
      mx: Long = -1L): DataFrame = {
    val m = if (mx >= 0) mx else maxPerUser(df)
    if (m < HotThreshold) {
      carryCols.foldLeft(df) { (acc, c) =>
        acc.withColumn(s"prev_$c", lag(col(c), 1).over(plainW))
      }
        .withColumn("__bkt", lit(0L))
        .withColumn("__rn", row_number().over(plainW).cast("long"))
    } else {
      val d = if (df.columns.contains("__bkt")) df else shard(df, m, tick)
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
  }

  /** Per-user running MIN/MAX over all EARLIER rows of the sequence —
    * the `agg(col) OVER (PARTITION BY user ORDER BY ts, id ROWS
    * UNBOUNDED PRECEDING TO 1 PRECEDING)` frame (the attribution /
    * interval-merge shape). `specs` are (inputCol, "min"|"max",
    * outputCol); `mx` as in [[withPrev]]. Cold corpora get the plain
    * window; hot ones decompose: within-shard running agg ⊕ the agg of
    * WHOLE earlier shards (one window over the per-bucket summary
    * table). Nulls behave exactly like the window they replace:
    * aggregates skip them, least/greatest combine non-null sides,
    * all-null prefix stays null.
    */
  def chainedRunningAgg(df: DataFrame, specs: Seq[(String, String, String)],
      tick: Long = 1L, mx: Long = -1L): DataFrame = {
    val m = if (mx >= 0) mx else maxPerUser(df)
    def aggOf(kind: String, c: Column): Column =
      if (kind == "min") min(c) else max(c)
    if (m < HotThreshold) {
      val w = plainW.rowsBetween(Window.unboundedPreceding, -1)
      specs.foldLeft(df.withColumn("__bkt", lit(0L))) {
        case (acc, (in, kind, out)) =>
          acc.withColumn(out, aggOf(kind, col(in)).over(w))
      }
    } else {
      val d = if (df.columns.contains("__bkt")) df else shard(df, m, tick)
      val wb = Window.partitionBy("user_id", "__bkt").orderBy("ts_s", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val userPrior = Window.partitionBy("user_id").orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
      val totAggs = specs.map { case (in, kind, out) => aggOf(kind, col(in)).as(s"__t_$out") }
      val prior = specs.foldLeft(
        d.groupBy("user_id", "__bkt").agg(totAggs.head, totAggs.tail: _*)) {
          case (acc, (_, kind, out)) =>
            acc.withColumn(s"__p_$out",
              (if (kind == "min") min(col(s"__t_$out")) else max(col(s"__t_$out")))
                .over(userPrior))
        }
        .select(col("user_id") +: col("__bkt") +: specs.map { case (_, _, out) => col(s"__p_$out") }: _*)
      specs.foldLeft(d.join(prior, Seq("user_id", "__bkt"), "left")) {
        case (acc, (in, kind, out)) =>
          val within = aggOf(kind, col(in)).over(wb)
          acc.withColumn(out,
            if (kind == "min") least(within, col(s"__p_$out"))
            else greatest(within, col(s"__p_$out")))
      }.drop(specs.map { case (_, _, out) => s"__p_$out" }: _*)
    }
  }

  /** Per-user GLOBAL running sum of `flagCol` (ordered by ts_s,
    * event_id) on a frame already carrying `__bkt` from [[withPrev]] /
    * [[chainedRunningAgg]]: within-sub-shard cumulative sum + the
    * chained sum of whole earlier sub-shards (one more summary-scale
    * window). `mx` as in [[withPrev]] — cold corpora get the plain
    * running-sum window (__bkt is the constant 0 those helpers emit).
    */
  def chainedCumsum(df: DataFrame, flagCol: String, outCol: String,
      mx: Long = -1L): DataFrame = {
    val m = if (mx >= 0) mx else maxPerUser(df)
    if (m < HotThreshold) {
      df.withColumn(outCol, sum(col(flagCol)).over(
        plainW.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    } else {
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
}
