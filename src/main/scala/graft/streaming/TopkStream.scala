package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming heavy-hitters maintenance: a mergeable SpaceSaving-style
  * summary over an unbounded key stream, second member (after
  * CmsStream) of the fixed-state-forever family — at most K counter
  * rows plus one floor row, no matter how many distinct keys flow
  * through.
  *
  * State rows are (item, lo, hi) intervals plus a sentinel row
  * (item = -1, hi = floor). Invariants maintained by the merge — the
  * classic mergeable-summaries algebra (Agarwal et al., PODS'12):
  *
  *  - lo ≤ true count ≤ hi for every TRACKED item (lo sums only counts
  *    observed while tracked; hi inherits the floor on re-entry, which
  *    dominates anything forgotten at eviction);
  *  - true count ≤ floor for every UNTRACKED item — so any key whose
  *    true count exceeds the floor is guaranteed present (heavy-hitter
  *    completeness, the property the spec checks against an exact
  *    recompute).
  *
  * Per batch: one exact partial-agg over the batch, a full-outer join
  * against ≤ K+1 state rows, and a TakeOrdered(K) — never a corpus
  * sort. Snapshots ride the shared replay-idempotent SnapshotStore
  * chain.
  */
object TopkStream {

  /** Maintain a K-counter heavy-hitters table at `tableDir` under a
    * stream with a `user_id` column.
    */
  def topkSink(
      events: DataFrame, tableDir: String, checkpointDir: String,
      k: Int = 64, retainSnapshots: Int = 3): StreamingQuery =
    SnapshotStore.snapshotSink(events, tableDir, checkpointDir, retainSnapshots) {
      (prev, batch) =>
        val bc = batch.groupBy(col("user_id").as("item")).agg(count(lit(1)).as("c"))
        val (counters, fl) = prev match {
          case Some(p) =>
            (p.filter(col("item") =!= -1L).select("item", "lo", "hi"),
              p.filter(col("item") === -1L)
                .agg(coalesce(max("hi"), lit(0L)).as("floor")))
          case None =>
            (bc.filter(lit(false)).select(col("item"), col("c").as("lo"), col("c").as("hi")),
              bc.agg(lit(0L).as("floor")))
        }
        val comb = counters.join(bc, Seq("item"), "full_outer")
          .crossJoin(broadcast(fl))
          .select(col("item"),
            (coalesce(col("lo"), lit(0L)) + coalesce(col("c"), lit(0L))).as("lo"),
            // An item absent from the state re-enters at the floor: the
            // floor dominates whatever was forgotten at its eviction.
            (coalesce(col("hi"), col("floor")) + coalesce(col("c"), lit(0L))).as("hi"),
            col("floor"))
        // Deterministic total order (hi DESC, item ASC) → TakeOrdered;
        // referenced twice but tiny (≤ K + batch-distinct rows), so a
        // recompute beats a cache entry that would outlive the batch.
        val kept = comb.orderBy(col("hi").desc, col("item").asc).limit(k)
          .select("item", "lo", "hi")
        // Floor update must be monotone even when NOTHING is evicted
        // (steady state: every batch key already tracked → the anti-join
        // frame is empty and max(hi) is NULL). Aggregating the floor out
        // of the evicted rows would reset it to 0 in that case, breaking
        // both invariants — so the previous floor always rides in via the
        // one-row broadcast `fl` and the evicted max only ever raises it.
        val evictedMax = comb
          .join(kept.select("item"), Seq("item"), "left_anti")
          .agg(coalesce(max("hi"), lit(0L)).as("evhi"))
          .crossJoin(broadcast(fl))
          .select(greatest(col("evhi"), col("floor")).as("hi"))
        kept.unionByName(
          evictedMax.select(lit(-1L).as("item"), lit(0L).as("lo"), col("hi")))
    }

  /** Tracked heavy hitters from the latest committed snapshot, best
    * (highest upper bound) first; the floor row is excluded.
    */
  def topk(spark: SparkSession, tableDir: String): DataFrame =
    SnapshotStore.latest(spark, tableDir)
      .map(_.filter(col("item") =!= -1L).orderBy(col("hi").desc, col("item").asc))
      .getOrElse(spark.emptyDataFrame)

  /** The current floor: an upper bound on the true count of every key
    * NOT in the table.
    */
  def floor(spark: SparkSession, tableDir: String): Long =
    SnapshotStore.latest(spark, tableDir)
      .map(_.filter(col("item") === -1L).agg(coalesce(max("hi"), lit(0L)))
        .head().getLong(0))
      .getOrElse(0L)
}
