package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

object LineDedupStreamSpec {
  final case class Doc(doc_id: Long, text: String)
}

/** Online line-dedup contracts: in-batch triple suppression, history +
  * batch counts compose (2 historical + 1 arriving reaches K), unique
  * lines survive, and the state stays one row per distinct line.
  */
class LineDedupStreamSpec extends SparkSpec {
  import LineDedupStreamSpec.Doc

  private val boiler = "accept all cookies now" // the repeated line
  private val twice = "top story of today"      // seen 2x in batch 0

  test("lines are suppressed once their prefix-inclusive count reaches K") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("linestream").toString
    val table = s"$base/state"; val out = s"$base/clean"; val ckpt = s"$base/ckpt"
    val input = MemoryStream[Doc]
    def drain(): Unit =
      LineDedupStream.cleanSink(input.toDF(), table, out, ckpt).awaitTermination()

    // Batch 0: boiler appears in 3 docs -> dropped from all three at
    // arrival; twice appears in 2 docs -> below K, survives.
    input.addData(
      Doc(1L, s"$boiler alpha beta gamma delta"),
      Doc(2L, s"epsilon zeta eta theta $boiler"),
      Doc(3L, s"$boiler $twice"),
      Doc(4L, s"$twice iota kappa lambda mu"))
    drain()
    val b0 = LineDedupStream.readCleaned(spark, out, 0L)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(b0(1L) == ((1L, "alpha beta gamma delta")))
    assert(b0(2L) == ((1L, "epsilon zeta eta theta")))
    assert(b0(3L) == ((1L, twice)))
    assert(b0(4L) == ((0L, s"$twice iota kappa lambda mu")))

    // Batch 1: one more copy of `twice` arrives -> its corpus count is
    // now 3 = K, so the ARRIVING copy is dropped (history + batch
    // compose); a fresh unique line survives; batch-0 outputs are not
    // rewritten.
    input.addData(Doc(5L, s"nu xi omicron pi $twice"))
    drain()
    val b1 = LineDedupStream.readCleaned(spark, out, 1L)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(b1(5L) == ((1L, "nu xi omicron pi")))
    assert(LineDedupStream.readCleaned(spark, out, 0L)
      .filter(col("doc_id") === 3L).collect()(0).getString(3) == twice)

    // State: one row per distinct line ever seen, counts exact.
    val state = SnapshotStore.latest(spark, table, below = None).get
    assert(state.groupBy("lh").count().filter(col("count") > 1).count() == 0)
    val boilerCnt = state.filter(col("lh") === md5(lit(boiler)))
      .collect()(0).getLong(1)
    assert(boilerCnt == 3L)
    val twiceCnt = state.filter(col("lh") === md5(lit(twice)))
      .collect()(0).getLong(1)
    assert(twiceCnt == 3L)
  }
}
