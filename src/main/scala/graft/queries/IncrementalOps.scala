package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Incremental batch deduplication against a historical fingerprint
  * store — the nightly-ingest shape: only the NEW batch is fingerprinted
  * and joined against the store's fingerprint column; the historical
  * corpus text is never rescanned. The anti join is key-equi on the
  * fingerprint, so at scale it bucket-prunes (and rides the runtime
  * bloom filter); within-batch duplicates collapse with a min-doc_id
  * partial aggregate before the store join.
  */
object IncrementalOps {

  val defs: Map[String, QDef] = Map(

    // Store = docs with doc_id < 250 (simulating the already-ingested
    // corpus); batch = the rest. Output: batch docs that survive BOTH
    // within-batch dedup (first doc_id wins per fingerprint) and the
    // store anti join.
    "dedup_incremental" -> QDef(
      (s, dir) => {
        val d = Tables(s, dir, "documents").select(col("doc_id"), md5(col("text")).as("fp"))
        val store = d.filter(col("doc_id") < 250).select(col("fp"))
        val batch = d.filter(col("doc_id") >= 250)
        batch
          .groupBy("fp").agg(min("doc_id").as("doc_id"))
          .join(store, Seq("fp"), "left_anti")
          .select("doc_id", "fp")
          .orderBy("doc_id")
      },
      """WITH d AS (SELECT doc_id, md5(text) AS fp FROM documents),
        |batch AS (
        |  SELECT fp, MIN(doc_id) AS doc_id FROM d WHERE doc_id >= 250 GROUP BY fp)
        |SELECT doc_id, fp FROM batch
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM d s WHERE s.doc_id < 250 AND s.fp = batch.fp)
        |ORDER BY doc_id""".stripMargin)
  )
}
