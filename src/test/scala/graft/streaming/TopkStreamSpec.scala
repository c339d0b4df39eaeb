package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

object TopkStreamSpec {
  final case class Ev(user_id: Long)
}

class TopkStreamSpec extends SparkSpec {
  import TopkStreamSpec.Ev

  test("streaming heavy hitters: bounded state, interval soundness, floor completeness") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("topk").toString
    val table = s"$base/hh"; val ckpt = s"$base/ckpt"
    val k = 8
    val input = MemoryStream[Ev]
    def drain(): Unit =
      TopkStream.topkSink(input.toDF(), table, ckpt, k = k).awaitTermination()

    // Heavy hitters 0/1/2 ride through a churning long tail that is
    // wider than K, forcing evictions every batch.
    val b0 = Seq.fill(30)(Ev(0L)) ++ Seq.fill(20)(Ev(1L)) ++
      (100L to 119L).map(Ev(_))
    val b1 = Seq.fill(25)(Ev(0L)) ++ Seq.fill(15)(Ev(2L)) ++
      (200L to 219L).map(Ev(_))
    val b2 = Seq.fill(10)(Ev(1L)) ++ Seq.fill(12)(Ev(2L)) ++
      (300L to 319L).map(Ev(_))
    input.addData(b0: _*); drain()
    input.addData(b1: _*); drain()
    input.addData(b2: _*); drain()

    val state = SnapshotStore.latest(spark, table).get.collect()
    assert(state.length <= k + 1, s"state has ${state.length} rows, bound ${k + 1}")

    val tracked = state.filter(_.getLong(0) != -1L)
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val fl = TopkStream.floor(spark, table)
    val exact = (b0 ++ b1 ++ b2).groupBy(_.user_id).view.mapValues(_.size.toLong).toMap

    // Interval soundness for every tracked item.
    tracked.foreach { case (item, (lo, hi)) =>
      val t = exact.getOrElse(item, 0L)
      assert(lo <= t && t <= hi, s"item $item: true $t outside [$lo, $hi]")
    }
    // Floor completeness: anything heavier than the floor is tracked.
    exact.foreach { case (item, t) =>
      if (t > fl)
        assert(tracked.contains(item), s"item $item (count $t > floor $fl) evicted")
    }
    // The three designed heavy hitters must all have survived the churn.
    Seq(0L, 1L, 2L).foreach(h =>
      assert(tracked.contains(h), s"heavy hitter $h lost"))
    // Reader orders best-first and excludes the sentinel.
    val top = TopkStream.topk(spark, table).collect()
    assert(top.forall(_.getLong(0) != -1L))
    assert(top.map(_.getLong(2)).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))

    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
  }

  test("streaming heavy hitters: floor is monotone through a no-eviction batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("topkne").toString
    val table = s"$base/hh"; val ckpt = s"$base/ckpt"
    val k = 4
    val input = MemoryStream[Ev]
    def drain(): Unit =
      TopkStream.topkSink(input.toDF(), table, ckpt, k = k).awaitTermination()

    // Batch 0 overflows K so the floor rises above 0; batch 1 touches
    // ONLY already-tracked keys (the steady state): nothing is evicted
    // and the anti-join frame is empty. The floor must carry over, not
    // reset — a reset would un-track-ably hide key 500 (count 3 from
    // batch 0) behind floor 0 while its true count exceeds it.
    val b0 = Seq.fill(10)(Ev(0L)) ++ Seq.fill(9)(Ev(1L)) ++
      Seq.fill(8)(Ev(2L)) ++ Seq.fill(7)(Ev(3L)) ++ Seq.fill(3)(Ev(500L))
    input.addData(b0: _*); drain()
    val floorAfterB0 = TopkStream.floor(spark, table)
    assert(floorAfterB0 >= 3L, s"eviction of key 500 must raise floor to >= 3, got $floorAfterB0")

    val b1 = Seq.fill(5)(Ev(0L)) ++ Seq.fill(4)(Ev(1L))
    input.addData(b1: _*); drain()
    val floorAfterB1 = TopkStream.floor(spark, table)
    assert(floorAfterB1 >= floorAfterB0,
      s"no-eviction batch reset the floor: $floorAfterB0 -> $floorAfterB1")

    // Completeness still holds against the exact recompute.
    val exact = (b0 ++ b1).groupBy(_.user_id).view.mapValues(_.size.toLong).toMap
    val tracked = SnapshotStore.latest(spark, table).get.collect()
      .filter(_.getLong(0) != -1L).map(_.getLong(0)).toSet
    exact.foreach { case (item, t) =>
      if (t > floorAfterB1)
        assert(tracked.contains(item), s"item $item (count $t > floor $floorAfterB1) untracked")
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
  }
}
