package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class PlanLintsSpec extends SparkSpec {
  import spark.implicits._

  private def rules(df: org.apache.spark.sql.DataFrame): Set[String] =
    PlanLints.findings(df).map(_.rule).toSet

  test("cartesian product is flagged") {
    val a = Seq(1, 2, 3).toDF("x")
    val b = Seq(4, 5).toDF("y")
    assert(rules(a.crossJoin(b)).contains("CARTESIAN_PRODUCT"))
  }

  test("non-equi join falling back to nested loop is flagged") {
    val a = Seq(1, 2, 3).toDF("x")
    val b = Seq(4, 5).toDF("y")
    val df = a.join(b, col("x") < col("y"))
    assert(rules(df).contains("NON_EQUI_JOIN"))
  }

  test("small side forced through a shuffle join is flagged; a healthy broadcast plan is clean") {
    val big = spark.range(1000).toDF("k")
    val dim = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    // Healthy: the dim broadcasts under the default threshold.
    assert(!rules(big.join(dim, "k")).contains("SMALL_SIDE_NOT_BROADCAST"))
    // Broadcast disabled: same join shuffles both sides; lint fires on
    // the tiny side (its size estimate is under the DEFAULT threshold,
    // which the lint reads from config - restore it before asserting).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = big.join(dim, "k")
      df.queryExecution.sparkPlan // force planning under the disabled threshold
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      assert(rules(df).contains("SMALL_SIDE_NOT_BROADCAST"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("window without PARTITION BY is flagged; a partitioned window is clean") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "g")
    val global = df.withColumn("rn", row_number().over(Window.orderBy("id")))
    assert(rules(global).contains("GLOBAL_WINDOW"))
    val keyed = df.withColumn("rn", row_number().over(Window.partitionBy("g").orderBy("id")))
    assert(!rules(keyed).contains("GLOBAL_WINDOW"))
  }

  test("report renders one line per finding") {
    val a = Seq(1).toDF("x"); val b = Seq(2).toDF("y")
    val lines = PlanLints.report(a.crossJoin(b))
    assert(lines.exists(_.startsWith("[plan-lint] CARTESIAN_PRODUCT")))
  }
}
