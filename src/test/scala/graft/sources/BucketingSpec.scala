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

  test("snapshot diff over bucketed versions plans no exchange (the 100 TB diff path)") {
    val dir = "/root/testdata/sf0.001"
    Seq("b_v1", "b_v2").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val wh = new java.io.File("spark-warehouse")
    def rm(f: java.io.File): Unit = { Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); () }
    Seq("b_v1", "b_v2").foreach(t => rm(new java.io.File(wh, t)))
    val v1 = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_totalprice", "o_orderstatus")
    // Same derivation as q_table_diff's in-query v2.
    val v2 = v1.filter(col("o_orderkey") % 97 =!= 0)
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 13 === 0, col("o_totalprice") + 1.0)
          .otherwise(col("o_totalprice")).as("o_totalprice"),
        col("o_orderstatus"))
      .unionByName(v1.filter(col("o_orderkey") % 89 === 1)
        .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
          col("o_totalprice"), col("o_orderstatus")))
    Bucketing.enableSortedBucketScan(spark)
    Bucketing.writeBucketed(v1, "b_v1", "o_orderkey", 8)
    Bucketing.writeBucketed(v2, "b_v2", "o_orderkey", 8)

    def classify(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
      a.as("a").join(b.as("b"), col("a.o_orderkey") === col("b.o_orderkey"), "full_outer")
        .select(
          when(col("a.o_orderkey").isNull, "added")
            .when(col("b.o_orderkey").isNull, "removed")
            .when(col("a.o_totalprice") =!= col("b.o_totalprice") ||
              col("a.o_orderstatus") =!= col("b.o_orderstatus"), "changed")
            .otherwise("unchanged").as("status"))
        .groupBy("status").agg(count(lit(1)).as("n"))

    val bucketedDiff = classify(spark.table("b_v1"), spark.table("b_v2"))
    val plan = bucketedDiff.queryExecution.executedPlan.toString
    // The join itself must be co-located; the only exchange allowed is
    // the 4-row status aggregation after it.
    val joinPart = plan.split("HashAggregate").last
    assert(!joinPart.contains("Exchange"),
      s"bucketed snapshot diff should join without a shuffle:\n${plan.take(3000)}")

    val got = bucketedDiff.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val expected = classify(v1, v2).collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == expected)

    Seq("b_v1", "b_v2").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
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
