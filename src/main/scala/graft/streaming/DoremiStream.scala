package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.queries.DomainMixOps

/** Streaming DoReMi monitor (§2 25jw) — the online twin of
  * `curate_doremi` (DomainMixOps.scala): as document batches arrive,
  * maintain the (lang, w) token-count table over the [[SnapshotStore]]
  * chain and emit the refreshed per-domain excess-loss / mixture-weight
  * table after every micro-batch. A pretraining pipeline watches this
  * to re-balance its sampler as the corpus mix drifts, without ever
  * recomputing counts from history.
  *
  * Algebra: the state is ONE row per (lang, w) — the `domainCounts`
  * table maintained by the same full-outer count-merge as
  * [[LineDedupStream]] (associative, replay-deterministic under the
  * strictly-below snapshot read); the weight table is
  * `DomainMixOps.weightsFromCounts` applied to the merged state, so
  * maintained weights are the batch op's exact closed form by
  * construction — DoremiStreamSpec proves the maintained COUNTS equal a
  * batch recompute over the full history, which is the part incremental
  * maintenance could get wrong.
  *
  * 100 TB posture: per batch, one batch-scale exchange (the batch's
  * (lang, w) partial agg) + one vocabulary-scale full-outer merge; the
  * weight table is |domains| rows. History is never re-tokenized.
  */
object DoremiStream {

  /** Maintain the domain count state at `tableDir`; write the
    * post-batch weight table under `outDir/batch_<id>` (overwrite —
    * replay-idempotent like the snapshot chain itself).
    */
  def weightSink(
      docs: DataFrame, tableDir: String, outDir: String, checkpointDir: String,
      retainSnapshots: Int = 3): StreamingQuery =
    SnapshotStore.snapshotSinkWithId(docs, tableDir, checkpointDir, retainSnapshots) {
      (prev, batch, batchId) =>
        val bc = DomainMixOps.domainCounts(batch)
          .withColumnRenamed("cd", "bc")
        val merged = prev match {
          case Some(p) =>
            p.join(bc, Seq("lang", "w"), "full_outer")
              .select(col("lang"), col("w"),
                (coalesce(col("cd"), lit(0L)) + coalesce(col("bc"), lit(0L)))
                  .as("cd"))
          case None => bc.select(col("lang"), col("w"), col("bc").as("cd"))
        }
        DomainMixOps.weightsFromCounts(merged)
          .write.mode("overwrite").parquet(s"$outDir/batch_$batchId")
        merged
    }

  /** The monitor output of one batch: (lang, n_toks, excess_nats,
    * weight) as of that batch's prefix of the stream.
    */
  def readWeights(
      spark: org.apache.spark.sql.SparkSession, outDir: String,
      batchId: Long): DataFrame =
    spark.read.parquet(s"$outDir/batch_$batchId")
}
