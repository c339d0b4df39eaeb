package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

object CmsStreamSpec {
  final case class Ev(user_id: Long)
}

class CmsStreamSpec extends SparkSpec {
  import CmsStreamSpec.Ev

  test("streaming CMS: fixed-size state, exact linear merge, one-sided estimates") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("cms").toString
    val table = s"$base/sketch"; val ckpt = s"$base/ckpt"
    val input = MemoryStream[Ev]
    def drain(): Unit = CmsStream.cmsSink(input.toDF(), table, ckpt).awaitTermination()

    val b0 = Seq.tabulate(40)(i => Ev(i.toLong % 7))   // users 0..6, skewed
    val b1 = Seq.tabulate(25)(i => Ev(i.toLong % 5 + 3)) // users 3..7 overlap
    input.addData(b0: _*)
    drain()
    input.addData(b1: _*)
    drain()

    // 1. Fixed-size state: never more than d × w cell rows.
    val snap = SnapshotStore.latest(spark, table).get.cache()
    assert(snap.count() <= CmsStream.D.toLong * CmsStream.W)

    // 2. Linearity: the maintained sketch equals a full recompute over
    //    everything that flowed through — cell-for-cell.
    val maintained = snap.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val recomputed = CmsStream.cells((b0 ++ b1).toDF())
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(maintained == recomputed)

    // 3. One-sided estimate: est ≥ exact count for every seen user.
    val exact = (b0 ++ b1).groupBy(_.user_id).view.mapValues(_.size.toLong).toMap
    val keys = exact.keys.toSeq.toDF("user_id")
    val est = CmsStream.estimate(spark, table, keys).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    exact.foreach { case (u, c) =>
      assert(est(u) >= c, s"user $u: est ${est(u)} < exact $c")
    }
    snap.unpersist()
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
  }
}
