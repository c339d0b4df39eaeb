package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Parquet table access for the driver-generated TPC-H-ish test data
  * (see /root/repo/TESTDATA.md). Mirrors the reference's parquet loading
  * surface (reference: src/executor/yachtsql.rs:43 load_parquet) but stays
  * lazy: a table is a Catalyst scan node, not row-at-a-time INSERTs, so
  * filters/projections push down to the parquet reader.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is TIMESTAMP(NANOS), which Spark's parquet reader
      // rejects; read the raw int64 nanos and truncate to microseconds.
      // Order is preserved and all queries tie-break on event_id.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      if (raw.schema("ts").dataType == LongType)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else raw
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register every table as a temp view (idempotent). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
