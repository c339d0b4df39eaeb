package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming fact enrichment against a slowly-changing dimension that is
  * RELOADED EVERY MICRO-BATCH — the streaming twin of the batch SCD2
  * upsert (`q_scd2_upsert`): the dimension lives as an SCD2 history in
  * parquet, nightly upserts close and open versions, and in-flight
  * streams pick up the new current rows on their next batch without a
  * restart.
  *
  * Scale shape: the dimension's CURRENT slice is the small side (dims
  * are MBs against an unbounded fact stream), so it broadcasts and each
  * batch's join is map-only — per batch the price of freshness is one
  * small parquet scan, identical to DecontamStream's reload contract.
  */
object DimRefreshStream {

  /** Enrich a stream of facts with the dimension's current attributes.
    * `dimDir` holds SCD2 rows (`key`, attributes…, `is_current`); only
    * current rows join. Facts with no current dim row pass through with
    * a null attribute rather than dropping (a late dim load must not
    * eat fact rows). Each batch overwrites `outDir/batch_<batchId>` —
    * replay-idempotent.
    */
  def enrichSink(
      facts: DataFrame, dimDir: String, outDir: String, checkpointDir: String,
      key: String, attr: String): StreamingQuery =
    facts.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // Freshness point: read INSIDE the batch — a broadcast captured
        // at stream start would serve yesterday's dimension forever.
        val current = spark.read.parquet(dimDir)
          .filter(col("is_current"))
          .select(col(key), col(attr))
        batch
          .join(broadcast(current), Seq(key), "left")
          .withColumn("ingest_batch", lit(batchId))
          .write.mode("overwrite").parquet(s"$outDir/batch_$batchId")
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
}
