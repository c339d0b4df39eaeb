package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the r15 hot-user sub-sharding (SubShard): a per-user sequence
  * window computed over (user, time-bucket) sub-shards with boundary
  * stitching must equal the plain user-partitioned window EXACTLY for
  * any bucket width, while bounding the rows any single window
  * partition holds (the hot user no longer serializes one task).
  */
class SubShardSpec extends SparkSpec {

  /** One 9k-event hot user (every 60s — crosses the 8k threshold, so
    * day-wide sub-shards engage) + 50 cold users, deliberately
    * including same-ts ties resolved by event_id.
    */
  private def fixture(): DataFrame = {
    import spark.implicits._
    val hot = (0 until 9000).map(i => (i.toLong, 0L, (i / 2).toLong * 60L, s"t${i % 5}"))
    val cold = for (u <- 1 to 50; i <- 0 until 100)
      yield (100000L + u * 1000L + i, u.toLong, i.toLong * 7200L, s"t${i % 3}")
    spark.sparkContext.parallelize(hot ++ cold, 8)
      .toDF("event_id", "user_id", "ts_s", "event_type")
  }

  test("widthTicks table with exact thresholds") {
    val single = Long.MaxValue / 4
    val exp = Map(1L -> single, 7999L -> single, 8000L -> 86400L,
      63999L -> 86400L, 64000L -> 3600L, 511999L -> 3600L,
      512000L -> 900L, 10000000L -> 900L)
    exp.foreach { case (n, w) =>
      assert(SubShard.widthTicks(n, 1L) == w, s"width($n) != $w")
      // Micro-tick widths scale by 1e6 except the single-bucket sentinel.
      val expUs = if (w == single) single else w * 1000000L
      assert(SubShard.widthTicks(n, 1000000L) == expUs, s"widthUs($n) != $expUs")
    }
  }

  test("cold corpus takes the plain-window plan: constant bucket, exact output") {
    import spark.implicits._
    // 60 users × 100 events — max per user far below the 8k threshold.
    val d = (for (u <- 0 until 60; i <- 0 until 100)
      yield (u * 1000L + i, u.toLong, i.toLong * 300L, s"t${i % 4}"))
      .toDF("event_id", "user_id", "ts_s", "event_type")
    assert(SubShard.maxPerUser(d) == 100L)
    val got = SubShard.withPrev(d, Seq("event_type"))
    assert(got.select("__bkt").distinct().count() == 1, "cold path must not shard")
    val plain = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    val expect = d.withColumn("p", lag("event_type", 1).over(plain))
      .select("event_id", "p").collect().map(_.toSeq).toSet
    assert(got.select(col("event_id"), col("prev_event_type").as("p"))
      .collect().map(_.toSeq).toSet == expect)
  }

  test("withPrev equals the plain user window, including boundary rows and ties") {
    val d = fixture()
    val plain = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    val expect = d.withColumn("prev_event_type", lag("event_type", 1).over(plain))
      .withColumn("prev_ts_s", lag("ts_s", 1).over(plain))
      .select("user_id", "event_id", "prev_ts_s", "prev_event_type")
      .collect().map(_.toSeq).toSet
    val got = SubShard.withPrev(d, Seq("ts_s", "event_type"))
      .select("user_id", "event_id", "prev_ts_s", "prev_event_type")
      .collect().map(_.toSeq).toSet
    assert(got == expect)
    // The hot user genuinely sub-sharded: >1 bucket, so boundary
    // stitching was exercised (not the degenerate single-bucket path).
    val hotBuckets = SubShard.withPrev(d, Seq("ts_s"))
      .filter(col("user_id") === 0L).select("__bkt").distinct().count()
    assert(hotBuckets > 1, "hot user stayed in one bucket — threshold not engaged")
  }

  test("chainedCumsum equals the plain running sum across sub-shard boundaries") {
    val d = fixture()
    val flagged = SubShard.withPrev(d, Seq("ts_s"))
      .withColumn("is_new",
        when(col("prev_ts_s").isNull || col("ts_s") - col("prev_ts_s") > 1800, 1L)
          .otherwise(0L))
    val plainW = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expect = flagged.withColumn("sidx", sum("is_new").over(plainW))
      .select("user_id", "event_id", "sidx").collect().map(_.toSeq).toSet
    val got = SubShard.chainedCumsum(flagged, "is_new", "sidx")
      .select("user_id", "event_id", "sidx").collect().map(_.toSeq).toSet
    assert(got == expect)
  }

  test("chainedRunningAgg hot path equals the plain window (min+max, all-null prefix)") {
    // The hot (sub-sharded) branch of chainedRunningAgg — used by
    // ev_attribution / ev_interval_merge — against the plain
    // rowsBetween(unboundedPreceding, -1) window it replaces. The value
    // column is null for the whole first day-bucket of the hot user
    // (ts < 100000 spans bucket 0 entirely), so the least/greatest
    // boundary stitch is exercised through null bucket totals and an
    // all-null prefix, not just dense data.
    val d = fixture().withColumn("v",
      when(col("ts_s") < 100000L, lit(null).cast("double"))
        .otherwise(pmod(col("event_id"), lit(997)).cast("double") - lit(300.0)))
    val w = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val expect = d
      .withColumn("mn", min("v").over(w)).withColumn("mx", max("v").over(w))
      .select("user_id", "event_id", "mn", "mx").collect().map(_.toSeq).toSet
    val got = SubShard.chainedRunningAgg(d, Seq(("v", "min", "mn"), ("v", "max", "mx")))
    assert(got.filter(col("user_id") === 0L).select("__bkt").distinct().count() > 1,
      "hot user stayed in one bucket — the sub-sharded branch was not exercised")
    assert(got.select("user_id", "event_id", "mn", "mx")
      .collect().map(_.toSeq).toSet == expect)
  }

  test("asofCarry hot path equals the plain window, incl. same-ts purchase ties at bucket boundaries") {
    import spark.implicits._
    // Tagged click∪purchase union straight into JoinOps.asofCarry so
    // both dispatch branches run on the SAME frame. The fixture breaks
    // the production pre-aggregation invariant on purpose: duplicate
    // (user, ts) purchase pairs with DIFFERENT values and event_ids —
    // the higher event_id carries the SMALLER value, so a cross-bucket
    // struct max that tie-broke by value instead of event_id would pick
    // a different row than the window's `last`. Pairs also sit exactly
    // ON day-bucket boundaries next to an equal-ts click.
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, java.lang.Long, java.lang.Double, Int)]
    for (i <- 0 until 9000) {
      val ts = i.toLong * 60L
      rows += ((0L, ts, java.lang.Long.valueOf(i.toLong), null, 0))
      if (i % 10 == 7) {
        rows += ((0L, ts, java.lang.Long.valueOf(100000L + i), java.lang.Double.valueOf((i % 7).toDouble + 1.0), 1))
        if (i % 100 == 7)
          rows += ((0L, ts, java.lang.Long.valueOf(200000L + i), java.lang.Double.valueOf(0.5), 1))
      }
    }
    for (k <- 1 to 6) { // exactly on the 86400-wide bucket boundary
      val ts = 86400L * k
      rows += ((0L, ts, java.lang.Long.valueOf(300000L + k), null, 0))
      rows += ((0L, ts, java.lang.Long.valueOf(400000L + k), java.lang.Double.valueOf(9.0), 1))
      rows += ((0L, ts, java.lang.Long.valueOf(450000L + k), java.lang.Double.valueOf(2.0), 1))
    }
    // A purchase-free user: the carry must stay null on both paths.
    for (i <- 0 until 100)
      rows += ((5L, i.toLong * 900L, java.lang.Long.valueOf(500000L + i), null, 0))
    val tagged = spark.sparkContext.parallelize(rows.toSeq, 8)
      .toDF("user_id", "ts_s", "event_id", "purch_value", "is_b")
    val out = Seq("user_id", "event_id", "ts_s", "last_purch_ts", "last_purch_value")
    val cold = JoinOps.asofCarry(tagged, 0L).filter(col("is_b") === 0)
      .select(out.map(col): _*).collect().map(_.toSeq).toSet
    val hotDf = JoinOps.asofCarry(tagged, 9000L)
    assert(hotDf.filter(col("user_id") === 0L).select("__bkt").distinct().count() > 1,
      "hot user stayed in one bucket — the decomposed branch was not exercised")
    val hot = hotDf.filter(col("is_b") === 0)
      .select(out.map(col): _*).collect().map(_.toSeq).toSet
    assert(hot == cold)
    // The boundary tie really resolved to the higher-event_id (smaller
    // value) purchase — pin the semantics, not just path agreement.
    val bClick = hotDf.filter(col("event_id") === 300001L)
      .select("last_purch_ts", "last_purch_value").collect()(0)
    assert(bClick.getLong(0) == 86400L && bClick.getDouble(1) == 2.0)
  }

  test("per-partition row bound: no (user, bucket) holds the whole hot history") {
    val d = fixture()
    val perBucket = SubShard.withPrev(d, Seq("ts_s"))
      .groupBy("user_id", "__bkt").agg(count(lit(1)).as("n"))
      .agg(max("n")).collect()(0).getLong(0)
    // Hot user: 9000 events at 30-per-hour → ≤ 1440/day + the tie rows;
    // the plain window would have held all 9000 in one partition.
    assert(perBucket <= 2900, s"a sub-shard holds $perBucket rows — width rule broken")
    assert(perBucket < 9000, "hot user serialized into one partition")
  }
}
