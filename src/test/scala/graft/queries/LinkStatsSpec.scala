package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}

/** Plan and semantics locks for the linkage / statistics tier. */
class LinkStatsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("fuzzy link joins the dictionary by broadcast — no corpus self-join") {
    val plan = SparkEntry.queries("q_fuzzy_link")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"linkage fell back to a non-equi join: ${plan.take(2000)}")
  }

  test("skyline prune is lossless: equals the single-window formulation") {
    val got = SparkEntry.queries("q_skyline")(spark, sfDir)
      .collect().map(r => (r.getDouble(0), r.getInt(1), r.getLong(2))).toSeq
    val pm = Tables(spark, sfDir, "part")
      .groupBy(col("p_retailprice").as("price"))
      .agg(max(col("p_size")).as("msize"), min(col("p_partkey")).as("rep_key"))
    val plain = pm
      .withColumn("prevmax", max("msize").over(
        Window.orderBy("price").rowsBetween(Window.unboundedPreceding, -1)))
      .filter(col("prevmax").isNull || col("msize") > col("prevmax"))
      .select("price", "msize", "rep_key")
      .orderBy("price")
      .collect().map(r => (r.getDouble(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got == plain)
    // And the exact pass itself is partitioned: no windowspec without a
    // partition key anywhere in the plan (the adversarial all-survivors
    // case would otherwise degenerate to one global sorted partition).
    val plan = SparkEntry.queries("q_skyline")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("windowspecdefinition(price"),
      s"skyline still plans a global price-ordered window: ${plan.take(3000)}")
  }

  test("OLS moment sums combine map-side (partial aggregation in plan)") {
    val plan = SparkEntry.queries("q_ols_regression")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_sum"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"))
  }

  test("bitmap index combines bit_or map-side — 8 bytes per user per partition") {
    val plan = SparkEntry.queries("q_bitmap_presence")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_bit_or"), plan.take(2000))
  }

  test("concentration ranking runs bucket-partitioned, not one global window") {
    val plan = SparkEntry.queries("q_concentration")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("windowspecdefinition(b#") ||
      plan.contains("windowspecdefinition(b "), plan.take(3000))
  }

  test("readability is map-only: no exchange before the output sort") {
    val plan = SparkEntry.queries("text_readability")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // The only exchange allowed is the range partitioning of the final
    // ORDER BY; a hash exchange would mean an accidental aggregation.
    assert(!plan.contains("Exchange hashpartitioning"), plan.take(3000))
  }

  test("KS cumulative sums run bucket-partitioned, not one global window") {
    val plan = SparkEntry.queries("q_ks_test")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // The per-value ECDF window must be partitioned by the range bucket;
    // a windowspec ordered by `value` with no partition key would be the
    // single-partition corpus window this operator exists to avoid.
    assert(plan.contains("windowspecdefinition(b#") ||
      plan.contains("windowspecdefinition(b "), plan.take(3000))
  }
}
