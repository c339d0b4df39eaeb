package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BucketingSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    val dir = "/root/testdata/sf0.001"
    // Fresh catalog per JVM does not know about tables an earlier run
    // left in the warehouse directory — clear both catalog and files.
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    val wh = new java.io.File("spark-warehouse")
    def rm(f: java.io.File): Unit = { Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); () }
    Seq("b_orders", "b_lineitem").foreach(t => rm(new java.io.File(wh, t)))
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
    Bucketing.enableSortedBucketScan(spark)
    Bucketing.writeBucketed(orders, "b_orders", "o_orderkey", 8)
    Bucketing.writeBucketed(
      lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "b_lineitem", "o_orderkey", 8)

    val joined = Bucketing.coLocatedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n${plan.take(3000)}")
    // One file per bucket + sortBy ⇒ the scan advertises the sort order
    // and the merge join consumes presorted runs: no Sort node either.
    assert(!plan.contains("Sort "), s"bucketed join should not re-sort:\n${plan.take(3000)}")

    val expected = lineitem.join(orders, lineitem("l_orderkey") === orders("o_orderkey")).count()
    assert(joined.count() == expected)

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
  }

  test("secondary-sort buckets feed an ordered window with no exchange and no sort") {
    val dir = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS b_li_sorted")
    val wh = new java.io.File("spark-warehouse")
    def rm(f: java.io.File): Unit = { Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); () }
    rm(new java.io.File(wh, "b_li_sorted"))
    val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
    Bucketing.enableSortedBucketScan(spark)
    Bucketing.writeBucketedSorted(lineitem, "b_li_sorted", "l_orderkey", "l_linenumber", 8)

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("l_orderkey").orderBy("l_linenumber")
    val ranked = spark.table("b_li_sorted")
      .select(col("l_orderkey"), col("l_linenumber"),
        row_number().over(w).as("rn"))
    val plan = ranked.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"secondary-sorted bucket window should not shuffle:\n${plan.take(3000)}")
    assert(!plan.contains("Sort "),
      s"secondary-sorted bucket window should not re-sort:\n${plan.take(3000)}")

    // Semantics: rank within order by line number == the recomputed one.
    val expected = lineitem
      .select(col("l_orderkey"), col("l_linenumber"), row_number().over(w).as("rn"))
      .collect().map(r => (r.get(0), r.get(1), r.get(2))).toSet
    val got = ranked.collect().map(r => (r.get(0), r.get(1), r.get(2))).toSet
    assert(got == expected)

    spark.sql("DROP TABLE IF EXISTS b_li_sorted")
  }
}
