package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class TypedOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("typed revenue aggregator matches the untyped SQL aggregate") {
    val typed = TypedOps.revenueByFlag(spark, dir).collect()
      .map(r => (r.l_returnflag, r.revenue, r.n)).toSet
    val untyped = Tables(spark, dir, "lineitem")
      .filter(col("l_quantity") > 0)
      .groupBy("l_returnflag")
      .agg(
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(typed == untyped)
  }

  test("typed pipeline keeps partial (map-side) aggregation") {
    val plan = TypedOps.revenueByFlag(spark, dir).queryExecution.executedPlan.toString
    // Aggregator lowers to a two-phase object-hash aggregate: a partial
    // pass before the exchange and a merge pass after — same shuffle
    // shape as a SQL SUM.
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"), plan.take(1500))
    assert(plan.toLowerCase.contains("partial"), plan.take(1500))
  }
}
