package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Incrementally-maintained materialized aggregate view: a per-key
  * (count, sum, min, max) table kept current under a stream of rows by
  * MERGING PARTIAL AGGREGATES — each micro-batch aggregates ONLY its own
  * rows (O(batch)), then folds them into the previous snapshot with the
  * aggregates' own merge functions (count+count, sum+sum, min(min),
  * max(max)). Nothing ever re-reads history, and — unlike a stateful
  * streaming aggregation — there is no state store bound on the key
  * space: the view lives in parquet snapshots, so a 10⁹-key view costs
  * a keyed merge per batch, not executor memory. Averages and other
  * ratios derive at read time (sum/count), which is why the stored
  * tuple is the mergeable basis, never the ratio itself.
  *
  * Snapshots use the same replay-idempotent `snap_<batchId>` chain as
  * the other sinks here: a replayed batch re-aggregates its own rows,
  * merges against the snapshot strictly below its id, and overwrites
  * its own output — converging to the identical view.
  */
object AggViewStream {

  /** Maintain the view at `tableDir` from a stream of rows, grouped by
    * `keyCol` over `valCol`. Snapshot schema:
    * (keyCol, n BIGINT, s DOUBLE, mn DOUBLE, mx DOUBLE).
    *
    * RETRACTIONS: a row with `op = 'd'` (optional column — absent means
    * all upserts) is a tombstone carrying the ORIGINAL value (the
    * Flink-style retract-record contract: the revoker re-sends what it
    * once inserted — e.g. a takedown pipeline replays the revoked doc's
    * rows flagged 'd'). Counts and sums subtract exactly (the signed
    * counter algebra stays mergeable and order-independent); a key whose
    * count reaches 0 LEAVES the view entirely. `mn`/`mx` are lifetime
    * RANGE BOUNDS — they cannot tighten on retraction without replaying
    * history (the classic min/max non-retractability), so they stay
    * conservative: still correct as bounds on every value ever admitted,
    * documented as such for planner/contract readers.
    */
  def aggViewSink(
      rows: DataFrame, keyCol: String, valCol: String,
      tableDir: String, checkpointDir: String, retainSnapshots: Int = 3): StreamingQuery =
    SnapshotStore.snapshotSink(rows, tableDir, checkpointDir, retainSnapshots) {
      (prev, batch) =>
        val b =
          if (batch.columns.contains("op")) batch
          else batch.withColumn("op", lit("u"))
        val sgn = when(col("op") === "d", lit(-1L)).otherwise(lit(1L))
        val fresh = b
          .groupBy(col(keyCol))
          .agg(
            sum(sgn).as("n"),
            sum(sgn.cast("double") * col(valCol).cast("double")).as("s"),
            min(when(col("op") =!= "d", col(valCol).cast("double"))).as("mn"),
            max(when(col("op") =!= "d", col(valCol).cast("double"))).as("mx"))
        val merged = prev match {
          case Some(p) =>
            p.unionByName(fresh)
              .groupBy(col(keyCol))
              .agg(sum("n").as("n"), sum("s").as("s"),
                min("mn").as("mn"), max("mx").as("mx"))
          case None => fresh
        }
        // Fully-revoked keys leave the view; over-retraction (more
        // deletes than inserts ever seen) also resolves to absence.
        merged.filter(col("n") > 0)
    }

  /** Read the current view, with derived columns (avg) computed from the
    * mergeable basis.
    */
  def readView(spark: org.apache.spark.sql.SparkSession, tableDir: String): DataFrame =
    StreamOps.latestSnapshot(spark, tableDir)
      .getOrElse(throw new IllegalStateException(s"no committed view under $tableDir"))
      .withColumn("avg_v", col("s") / col("n"))

  /** Incrementally-maintained COLUMN-STATS catalog — the profiler
    * (`profile_table`) as a live table: per ingest batch, each profiled
    * column contributes one (col_name, n, n_null, mn, mx) row computed
    * from THAT BATCH ONLY, merged into the snapshot chain with the same
    * count+count / min(min) / max(max) algebra. The catalog stays
    * current under ingestion without ever rescanning the table — the
    * stats a planner (or q_expectations-style contract) reads for free.
    */
  def statsCatalogSink(
      rows: DataFrame, cols: Seq[String],
      tableDir: String, checkpointDir: String, retainSnapshots: Int = 3): StreamingQuery =
    SnapshotStore.snapshotSink(rows, tableDir, checkpointDir, retainSnapshots) {
      (prev, batch) =>
        val fresh = cols.map { c =>
          batch.agg(
            count(lit(1)).as("n"),
            sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
            min(col(c).cast("double")).as("mn"),
            max(col(c).cast("double")).as("mx"))
            .select(lit(c).as("col_name"), col("n"),
              coalesce(col("n_null"), lit(0L)).as("n_null"), col("mn"), col("mx"))
        }.reduce(_.unionByName(_))
        prev match {
          case Some(p) =>
            p.unionByName(fresh)
              .groupBy(col("col_name"))
              .agg(sum("n").as("n"), sum("n_null").as("n_null"),
                min("mn").as("mn"), max("mx").as("mx"))
          case None => fresh
        }
    }
}
