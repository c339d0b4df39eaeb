package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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

  /** Per-JVM memo of each table file's schema (r16): the test tables are
    * immutable for a process lifetime, but every `spark.read.parquet`
    * call re-lists and re-reads parquet footers on the DRIVER to infer
    * the schema — a fixed per-call cost paid hundreds of times across a
    * bench/verify pass (and by every operator that reads a table more
    * than once). Passing the memoized schema skips footer inference;
    * pushdown/pruning are unaffected (the scan still plans normally).
    * Keyed by full path, so different data dirs never share an entry.
    */
  private val schemaMemo =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  private def readParquet(spark: SparkSession, path: String): DataFrame = {
    val sch = schemaMemo.computeIfAbsent(path, p => spark.read.parquet(p).schema)
    spark.read.schema(sch).parquet(path)
  }

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is TIMESTAMP(NANOS), which Spark's parquet reader
      // rejects; read the raw int64 nanos and truncate to microseconds.
      // Order is preserved and all queries tie-break on event_id.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = readParquet(spark, s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        // Some generator versions write plain timestamp[us] without
        // isAdjustedToUTC, which Spark reads as TIMESTAMP_NTZ. All
        // downstream queries (and the UTC-pinned sessions) expect the
        // instant type; the cast reinterprets the naive value in the
        // session zone (UTC), so wall-clock values are unchanged.
        case TimestampNTZType =>
          raw.withColumn("ts", col("ts").cast(TimestampType))
        case _ => raw
      }
    } else readParquet(spark, s"$dir/$name.parquet")
  }

  /** Register every table as a temp view (idempotent). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
