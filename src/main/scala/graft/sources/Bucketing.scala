package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table support: pre-shuffling fact tables into N buckets on
  * their join key lets every subsequent equi-join or aggregation on that
  * key run WITHOUT an exchange — the write pays the shuffle once, every
  * downstream query skips it. This is the co-located-join strategy for
  * repeatedly-joined 100 TB fact tables (the local spec asserts the join
  * plan contains no shuffle on the bucketed sides).
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table.
    *
    * The pre-`repartition` on the bucket key uses the SAME Murmur3 hash
    * as the bucket spec, so every write task holds exactly one bucket's
    * rows and each bucket lands as ONE file. That single-file-per-bucket
    * invariant is what lets the scan advertise the sortBy order: Spark
    * only trusts bucket sort order when it doesn't have to merge files,
    * so downstream sort-merge joins on the key then skip BOTH the
    * exchange and the sort — presorted runs straight off the scan.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.repartition(buckets, df(key))
      .write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** SECONDARY-SORT bucket writer: buckets on `key`, sorts each bucket
    * file by (`key`, `secondary`). With the single-file-per-bucket
    * invariant and [[enableSortedBucketScan]], the scan advertises the
    * COMPOUND order, so per-key ORDER-SENSITIVE operators — windows
    * ordered by the secondary column, ordered collect_list, merge-join
    * with tie-break — run with neither an exchange NOR a sort: presorted
    * runs straight off parquet. This is the write-once/read-many layout
    * for event logs replayed per entity in time order at 100 TB.
    */
  def writeBucketedSorted(
      df: DataFrame, table: String, key: String, secondary: String, buckets: Int): Unit =
    df.repartition(buckets, df(key))
      .write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key, secondary)
      .format("parquet")
      .saveAsTable(table)

  /** Let bucketed scans advertise their sortBy order. Spark 3+ default-
    * disabled this (the order only holds when every bucket is one file,
    * which [[writeBucketed]] guarantees via its aligned pre-partition);
    * with it on, sort-merge joins over such tables skip the per-bucket
    * re-sort as well as the exchange.
    */
  def enableSortedBucketScan(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")

  /** Join two same-bucketing tables on their bucket key. The merge hint
    * keeps the planner on sort-merge so the bucketed layout is used (a
    * broadcast join would ignore bucketing entirely).
    */
  def coLocatedJoin(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).hint("merge").join(spark.table(right), key)
}
