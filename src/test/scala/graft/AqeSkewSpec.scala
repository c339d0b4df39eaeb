package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Proof that the GraftConf scale posture actually engages: under AQE
  * with skew-join handling, a pathologically skewed sort-merge join
  * gets its hot partition SPLIT at runtime (skew=true in the final
  * adaptive plan) instead of serializing one reducer — the mechanism
  * the 100 TB skew claims in SURVEY §4 rest on. Thresholds are scaled
  * down so a local-size dataset trips the same code path a hot key
  * trips at cluster scale.
  */
class AqeSkewSpec extends AnyFunSuite {

  test("AQE splits a skewed join partition at runtime") {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("aqe-skew-spec")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // Scale the skew trigger down to local data sizes: a partition is
      // "skewed" over 64 KiB and 2x the median, split toward 16 KiB
      // targets. Disable broadcast so the join stays sort-merge (skew
      // handling applies to SMJ/SHJ only).
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16384")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    try {
      import spark.implicits._
      // Fact side: one hot key (0) carrying ~100k rows with a fat
      // payload, 99 cold keys with 100 rows each.
      val fact = spark.range(0, 110000).select(
        (org.apache.spark.sql.functions.when($"id" < 100000, 0L)
          .otherwise($"id" % 99 + 1)).as("k"),
        org.apache.spark.sql.functions.concat_ws("",
          Seq.fill(8)(org.apache.spark.sql.functions.lpad($"id".cast("string"), 18, "x")): _*)
          .as("payload"))
      val dim = spark.range(0, 100).select($"id".as("k"),
        org.apache.spark.sql.functions.lit("d").as("attr"))
      val joined = fact.join(dim, "k")
      // Execute so AQE finalizes the adaptive plan, then inspect it.
      assert(joined.count() == 110000L)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed join (no skew=true):\n${plan.take(3000)}")
    } finally spark.stop()
  }
}
