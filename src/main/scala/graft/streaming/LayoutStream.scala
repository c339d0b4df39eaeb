package graft.streaming

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

import graft.queries.LayoutOps

/** Incremental Z-order compaction under ingestion: a streaming sink
  * that keeps a table BOTH continuously ingested and clustered — the
  * maintenance job every clustered 100 TB table needs, folded into the
  * ingest path (one-shot clustering decays immediately under appends).
  *
  * Mini-LSM layout inside `dir`:
  *   - `landing_<batchId>`: one directory per micro-batch, written raw
  *     (no shuffle on the hot path — ingest latency stays O(batch)).
  *   - `base_<batchId>`: the clustered tier. Every `compactEvery`
  *     landed batches, base + pending landings rewrite through
  *     [[LayoutOps.writeZClustered]] (one range shuffle on the z-value,
  *     file count sized from the measured on-disk footprint).
  *
  * Readers ([[readTable]]) see base_B ∪ {landing_i : i > B} for the
  * highest committed base B — exactly-once WITHOUT relying on pruning:
  * base_B contains every landing ≤ B by construction, so a crash
  * between base commit and landing cleanup double-counts nothing.
  * Replay is idempotent the same way as every chain sink here: a
  * replayed batch overwrites its own landing (and, if it compacted, its
  * own base) directory. Pruning runs AFTER the new base commits.
  */
object LayoutStream {

  def zClusteredSink(
      rows: DataFrame, dir: String, checkpointDir: String,
      xCol: String, yCol: String,
      compactEvery: Int = 4, targetFileBytes: Long = 128L << 20): StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        batch.write.mode("overwrite").parquet(s"$dir/landing_$batchId")
        val (fs, root) = StreamOps.fsOf(spark, dir)
        val baseId = committedMax(fs, root, "base_").filter(_ < batchId)
        val pending = StreamOps.committedIds(fs, root, "landing_")
          .filter(id => id <= batchId && baseId.forall(_ < id))
        if (pending.size >= compactEvery) {
          val landings = pending.sorted
            .map(id => spark.read.parquet(s"$dir/landing_$id"))
            .reduce(_.unionByName(_))
          val all = baseId
            .map(b => spark.read.parquet(s"$dir/base_$b").unionByName(landings))
            .getOrElse(landings)
          val bytes = (baseId.map(b => sizeOf(fs, root, s"base_$b")).getOrElse(0L)
            + pending.map(id => sizeOf(fs, root, s"landing_$id")).sum)
          val nParts = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
          LayoutOps.writeZClustered(all, col(xCol), col(yCol), s"$dir/base_$batchId", nParts)
          // Cleanup strictly after the new base's _SUCCESS: consumed
          // landings and superseded bases are unreachable either way.
          // Sweep ALL landings ≤ batchId, not just this round's pending
          // set — a crash between a previous base commit and its cleanup
          // (or a replayed compacting batch re-landing) leaves orphans at
          // or below the old base id that the pending filter never
          // revisits; they are contained in that base, hence in this one.
          StreamOps.committedIds(fs, root, "landing_").filter(_ <= batchId)
            .foreach(id => fs.delete(new Path(root, s"landing_$id"), true))
          baseId.foreach(b => fs.delete(new Path(root, s"base_$b"), true))
        }
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** Current table contents: clustered base plus not-yet-compacted
    * landings above it.
    */
  def readTable(spark: SparkSession, dir: String): DataFrame = {
    val (fs, root) = StreamOps.fsOf(spark, dir)
    val baseId = committedMax(fs, root, "base_")
    val landings = StreamOps.committedIds(fs, root, "landing_")
      .filter(id => baseId.forall(_ < id)).sorted
    val parts =
      baseId.map(b => spark.read.parquet(s"$dir/base_$b")).toSeq ++
        landings.map(id => spark.read.parquet(s"$dir/landing_$id"))
    require(parts.nonEmpty, s"no committed data under $dir")
    parts.reduce(_.unionByName(_))
  }

  private def committedMax(
      fs: org.apache.hadoop.fs.FileSystem, root: Path, prefix: String): Option[Long] = {
    val ids = StreamOps.committedIds(fs, root, prefix)
    if (ids.isEmpty) None else Some(ids.max)
  }

  private def sizeOf(fs: org.apache.hadoop.fs.FileSystem, root: Path, child: String): Long = {
    val p = new Path(root, child)
    if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
  }
}
