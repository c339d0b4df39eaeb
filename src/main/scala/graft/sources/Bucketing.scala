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

  /** Write `df` as a bucketed+sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketing tables on their bucket key. The merge hint
    * keeps the planner on sort-merge so the bucketed layout is used (a
    * broadcast join would ignore bucketing entirely).
    */
  def coLocatedJoin(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).hint("merge").join(spark.table(right), key)
}
