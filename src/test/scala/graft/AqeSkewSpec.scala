package graft

/** Proof that the GraftConf scale posture actually engages: under AQE
  * with skew-join handling, a pathologically skewed sort-merge join
  * gets its hot partition SPLIT at runtime (skew=true in the final
  * adaptive plan) instead of serializing one reducer — the mechanism
  * the 100 TB skew claims in SURVEY §4 rest on. Thresholds are scaled
  * down so a local-size dataset trips the same code path a hot key
  * trips at cluster scale.
  *
  * Runs in a CHILD session of the shared spec context (every knob used
  * here is a session-scoped SQL conf): building a separate
  * SparkSession and stopping it would stop the one shared
  * SparkContext and kill every suite scheduled after this one.
  */
class AqeSkewSpec extends SparkSpec {

  test("AQE splits a skewed join partition at runtime") {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // Scale the skew trigger down to local data sizes: a partition is
    // "skewed" over 64 KiB and 2x the median, split toward 16 KiB
    // targets. Broadcast off so the join stays sort-merge (skew
    // handling applies to SMJ/SHJ only).
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16384")
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    import s.implicits._
    import org.apache.spark.sql.functions._
    // Fact side: one hot key (0) carrying ~100k rows with a fat
    // payload, 99 cold keys with 100 rows each.
    val fact = s.range(0, 110000).select(
      when($"id" < 100000, 0L).otherwise($"id" % 99 + 1).as("k"),
      concat_ws("", Seq.fill(8)(lpad($"id".cast("string"), 18, "x")): _*).as("payload"))
    val dim = s.range(0, 100).select($"id".as("k"), lit("d").as("attr"))
    val joined = fact.join(dim, "k")
    // Drive THIS dataframe's own QueryExecution (count() would spawn a
    // separate one and leave this plan isFinalPlan=false), then inspect
    // the finalized adaptive plan.
    assert(joined.collect().length == 110000)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      s"AQE did not mark the skewed join (no skew=true):\n${plan.take(3000)}")
  }
}
