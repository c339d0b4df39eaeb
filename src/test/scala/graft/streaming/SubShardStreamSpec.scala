package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

object SubShardStreamSpec {
  final case class Ev(user_id: Long, event_id: Long, ts_s: Long, event_type: String)
}

/** The streaming SubShard twins share the batch operators' boundary
  * stitching algebra: after every micro-batch the maintained session
  * table / attribution outputs must equal the BATCH operator
  * (plain user-ordered window) recomputed over the full stream prefix
  * — including sessions that span batch boundaries (the open-session
  * stitch), users appearing mid-stream, and purchases whose only
  * clicks arrived in earlier batches (the least/greatest summary
  * stitch).
  */
class SubShardStreamSpec extends SparkSpec {
  import SubShardStreamSpec.Ev

  private def ordW = Window.partitionBy("user_id").orderBy("ts_s", "event_id")

  /** The batch sessionize formulation (EventOps ev_sessionize's window
    * shape, with start/end kept for the comparison).
    */
  private def batchSessions(prefix: DataFrame): Set[Seq[Any]] =
    prefix
      .withColumn("__p", lag("ts_s", 1).over(ordW))
      .withColumn("__new",
        when(col("__p").isNull || col("ts_s") - col("__p") > 1800L, 1L).otherwise(0L))
      .withColumn("session_idx", sum("__new").over(
        ordW.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_idx")
      .agg(min("ts_s").as("start_ts"), max("ts_s").as("end_ts"),
        count(lit(1)).as("n_events"))
      .collect().map(_.toSeq).toSet

  private def batchAttribution(prefix: DataFrame): Set[Seq[Any]] = {
    val w = ordW.rowsBetween(Window.unboundedPreceding, -1)
    prefix
      .withColumn("click_ts", when(col("event_type") === "click", col("ts_s")))
      .withColumn("first_click", min("click_ts").over(w))
      .withColumn("last_click", max("click_ts").over(w))
      .filter(col("event_type") === "purchase" && col("first_click").isNotNull)
      .select("user_id", "event_id", "ts_s", "first_click", "last_click")
      .collect().map(_.toSeq).toSet
  }

  // Three batches with per-user event-time monotone boundaries (the
  // exact-equality contract): user 1's batch-1 head continues the open
  // session (gap 1700 <= 1800) then splits; user 2 appears mid-stream;
  // user 3 goes silent after batch 0 and returns with a huge gap;
  // same-ts rows (distinct event_ids) pin the ordering tie-break.
  private val batches = Seq(
    Seq(Ev(1L, 1L, 0L, "click"), Ev(1L, 2L, 100L, "view"), Ev(1L, 3L, 100L, "click"),
      Ev(1L, 4L, 200L, "purchase"),
      Ev(3L, 30L, 50L, "click"), Ev(3L, 31L, 60L, "purchase")),
    Seq(Ev(1L, 5L, 1900L, "purchase"), Ev(1L, 6L, 5000L, "view"),
      Ev(2L, 20L, 1000L, "purchase"), Ev(2L, 21L, 1200L, "click")),
    Seq(Ev(1L, 7L, 5100L, "purchase"),
      Ev(2L, 22L, 2000L, "purchase"),
      Ev(3L, 32L, 100000L, "purchase")))

  test("maintained sessions equal the batch operator over every stream prefix") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("subshardsess").toString
    val input = MemoryStream[Ev]
    def drain(): Unit =
      SubShardStream.sessionSink(input.toDF().drop("event_type"),
        s"$base/state", s"$base/ckpt").awaitTermination()
    var prefix = Seq.empty[Ev]
    for (b <- batches) {
      input.addData(b: _*)
      drain()
      prefix = prefix ++ b
      val expect = batchSessions(prefix.toDF().drop("event_type"))
      val got = SubShardStream.sessions(spark, s"$base/state").get
        .select("user_id", "session_idx", "start_ts", "end_ts", "n_events")
        .collect().map(_.toSeq).toSet
      assert(got == expect, s"prefix of ${prefix.size} events diverged")
    }
    // State shape: one row per (user, session) — the hot user's history
    // never collapses into a per-event state.
    val st = SubShardStream.sessions(spark, s"$base/state").get
    assert(st.groupBy("user_id", "session_idx").count()
      .filter(col("count") > 1).count() == 0)
  }

  test("per-batch attributions union to the batch operator over the stream prefix") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("subshardattr").toString
    val input = MemoryStream[Ev]
    def drain(): Unit =
      SubShardStream.attributionSink(input.toDF(),
        s"$base/state", s"$base/out", s"$base/ckpt").awaitTermination()
    for (b <- batches) { input.addData(b: _*); drain() }
    val got = (0 until batches.size).map(i =>
        SubShardStream.attributions(spark, s"$base/out", i.toLong))
      .reduce(_ unionByName _)
      .collect().map(_.toSeq).toSet
    val expect = batchAttribution(batches.flatten.toDF())
    assert(got == expect)
    // User 2's first purchase (event 20) precedes any of their clicks —
    // it must be absent from the attributions on both paths.
    assert(!got.exists(r => r.head == 2L && r(1) == 20L))
    // And the state is ONE summary row per user with clicks.
    val st = SnapshotStore.latest(spark, s"$base/state").get
    assert(st.count() == st.select("user_id").distinct().count())
  }
}
