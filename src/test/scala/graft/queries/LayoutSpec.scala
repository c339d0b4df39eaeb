package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Z-order layout: correctness of the bit interleave and the actual
  * locality win over a lexicographic sort — the property file skipping
  * at scale depends on.
  */
class LayoutSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("zValue interleaves bits (known vectors)") {
    val rows = spark.range(1)
      .select(
        LayoutOps.zValue(lit(0), lit(0)).as("a"),
        LayoutOps.zValue(lit(1), lit(0)).as("b"),
        LayoutOps.zValue(lit(0), lit(1)).as("c"),
        LayoutOps.zValue(lit(255), lit(255)).as("d"),
        LayoutOps.zValue(lit(0xFFFF), lit(0)).as("e"))
      .collect()(0)
    assert(rows.getLong(0) == 0L)
    assert(rows.getLong(1) == 1L) // x bit 0 -> position 0
    assert(rows.getLong(2) == 2L) // y bit 0 -> position 1
    assert(rows.getLong(3) == 0xFFFFL) // 8+8 interleaved low bits all set
    assert(rows.getLong(4) == 0x55555555L) // x bits land on even positions
  }

  test("z-clustered files bound the SECOND dimension that a lexicographic sort leaves open") {
    // Two independent uniform dimensions (hash-derived so the test does
    // not depend on the synthetic data's key ranges). A lexicographic
    // (zx, zy) sort produces thin-strip files: tight on zx, spanning
    // nearly the FULL zy range — so a zy predicate prunes nothing. The
    // curve bounds both, which is the entire point of z-ordering.
    val events = graft.Tables(spark, sfDir, "events")
      .select(
        col("event_id"),
        pmod(xxhash64(lit("x"), col("event_id")), lit(64L)).as("zx"),
        pmod(xxhash64(lit("y"), col("event_id")), lit(64L)).as("zy"))
    val base = java.nio.file.Files.createTempDirectory("zorder").toString
    events.repartitionByRange(8, col("zx"), col("zy"))
      .sortWithinPartitions("zx", "zy")
      .write.mode("overwrite").parquet(s"$base/lex")
    LayoutOps.writeZClustered(events, col("zx"), col("zy"), s"$base/zord", 8)
    def meanYExtent(path: String): Double = {
      val r = spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg((max("zy") - min("zy") + 1).as("y_extent"))
        .agg(avg("y_extent")).collect()(0)
      r.getDouble(0)
    }
    val lex = meanYExtent(s"$base/lex")
    val zord = meanYExtent(s"$base/zord")
    assert(lex > 48.0, s"baseline strips unexpectedly tight on zy ($lex) — test setup broken")
    assert(zord < lex * 0.5,
      s"z-order files span zy $zord on average, not < half of lexicographic $lex")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
  }

  test("zValueN interleaves three dimensions evenly") {
    val r = spark.range(1)
      .select(
        LayoutOps.zValueN(Seq(lit(1), lit(0), lit(0)), 8).as("a"),
        LayoutOps.zValueN(Seq(lit(0), lit(1), lit(0)), 8).as("b"),
        LayoutOps.zValueN(Seq(lit(0), lit(0), lit(1)), 8).as("c"),
        LayoutOps.zValueN(Seq(lit(2), lit(0), lit(0)), 8).as("d"),
        LayoutOps.zValueN(Seq(lit(7), lit(7), lit(7)), 8).as("e"))
      .collect()(0)
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L && r.getLong(2) == 4L)
    assert(r.getLong(3) == 8L) // x bit 1 -> position 3 with 3 dims
    assert(r.getLong(4) == 511L) // 3 dims × 3 low bits all set
    intercept[IllegalArgumentException] {
      LayoutOps.zValueN(Seq(lit(1), lit(1), lit(1)), 31) // 93 bits > long
    }
  }

  test("compaction rewrites a shattered directory into size-targeted files") {
    val base = java.nio.file.Files.createTempDirectory("compact").toString
    val events = graft.Tables(spark, sfDir, "events")
      .select("event_id", "user_id", "event_type", "value")
    events.repartition(64).write.mode("overwrite").parquet(s"$base/small")
    val nSmall = new java.io.File(s"$base/small").listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(nSmall == 64, s"expected 64 shattered files, got $nSmall")
    val nParts = LayoutOps.compact(spark, s"$base/small", s"$base/big",
      targetBytes = 512L * 1024, sortCols = Seq("user_id"))
    val nBig = new java.io.File(s"$base/big").listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(nBig == nParts && nBig <= 4, s"compacted to $nBig files (planned $nParts)")
    // content preserved, and the range-partitioned sort means per-file
    // user_id ranges can overlap only at partition boundaries
    assert(spark.read.parquet(s"$base/big").count() == events.count())
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
  }

  test("clustered layout makes parquet stats skip data at the scan") {
    // The end-to-end point of layout work: with rows clustered on the
    // predicate column, parquet min/max stats let the reader skip whole
    // files/row-groups, so the scan DECODES far fewer rows (scan metric
    // numOutputRows is pre-filter). Unclustered, every file straddles
    // the full key range and nothing skips.
    val events = graft.Tables(spark, sfDir, "events")
      .select("event_id", "user_id", "event_type", "value")
    val base = java.nio.file.Files.createTempDirectory("skip").toString
    events.orderBy("event_id") // uncorrelated with user_id -> no locality
      .coalesce(1).write.option("maxRecordsPerFile", 100)
      .mode("overwrite").parquet(s"$base/shuffled")
    events.orderBy("user_id")
      .coalesce(1).write.option("maxRecordsPerFile", 100)
      .mode("overwrite").parquet(s"$base/clustered")
    def decodedRows(path: String): Long = {
      val df = spark.read.parquet(path).filter(col("user_id") === 3)
      df.collect()
      df.queryExecution.executedPlan.collectLeaves().head
        .metrics("numOutputRows").value
    }
    val full = decodedRows(s"$base/shuffled")
    val pruned = decodedRows(s"$base/clustered")
    assert(spark.read.parquet(s"$base/clustered").filter(col("user_id") === 3).count() ==
      spark.read.parquet(s"$base/shuffled").filter(col("user_id") === 3).count())
    assert(pruned < full / 2,
      s"clustered scan decoded $pruned rows, expected far fewer than unclustered $full")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
  }

  test("runtime bloom filter prunes the fact side of a selective join") {
    // At 100 TB the fact-side scan of a selective dim join is the cost;
    // Spark's InjectRuntimeFilter turns the dim keys into a bloom filter
    // applied at the fact scan. Default thresholds (10GB application
    // side) are sized for clusters, so this spec lowers them to prove
    // the engine's plans accept runtime filters when eligible.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "50MB")
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val li = graft.Tables(s2, sfDir, "lineitem")
    val ord = graft.Tables(s2, sfDir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
    val j = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
    val plan = j.queryExecution.optimizedPlan.toString.toLowerCase
    assert(plan.contains("might_contain") || plan.contains("bloom"),
      s"no runtime bloom filter injected: ${plan.take(2000)}")
  }
}
