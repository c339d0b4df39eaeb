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
