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
}
