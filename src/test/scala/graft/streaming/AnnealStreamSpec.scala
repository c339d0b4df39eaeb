package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.CCNetOps

object AnnealStreamSpec {
  final case class Doc(doc_id: Long, text: String)
}

/** Online anneal-curriculum contracts (the 25jw contract shape): the
  * maintained docWord state equals a from-scratch re-tokenization of
  * the full stream prefix (the part incremental maintenance could get
  * wrong), and the emitted schedule equals the batch recompute over
  * that prefix — including after a second batch whose arrivals re-cut
  * the terciles and move the budget boundaries.
  */
class AnnealStreamSpec extends SparkSpec {
  import AnnealStreamSpec.Doc

  private def scheduleRows(df: org.apache.spark.sql.DataFrame) =
    df.select("phase", "bucket", "doc_id", "n_toks", "quota_toks",
        "phase_cum_before")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .sorted.toSeq

  test("maintained state and emitted schedule equal the batch recompute per prefix") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("annealstream").toString
    val table = s"$base/state"; val out = s"$base/sched"; val ckpt = s"$base/ckpt"
    val input = MemoryStream[Doc]
    def drain(): Unit =
      AnnealStream.scheduleSink(input.toDF(), table, out, ckpt).awaitTermination()

    // Distinct per-doc vocabularies with shared common words, so the
    // unigram scores spread and the terciles are non-trivial.
    val batch0 = Seq(
      Doc(1L, "the cat sat on the mat and the cat slept"),
      Doc(2L, "the dog ate the bone and then the dog barked loudly"),
      Doc(3L, "quantum chromodynamics regularization lattice gauge artifacts"),
      Doc(4L, "the the the the the the"),
      Doc(5L, "a quick brown fox jumps over a lazy dog today"),
      Doc(6L, "numerical weather prediction ensembles diverge rapidly"))
    // Batch 1 adds common-vocabulary mass and two new docs: every
    // doc's score shifts (cw changes corpus-wide), the tercile cut
    // moves, and the token budgets grow — the schedule must re-cut.
    val batch1 = Seq(
      Doc(7L, "the cat and the dog sat on the mat together quietly"),
      Doc(8L, "stochastic gradient descent convergence rates degrade"))

    def batchSchedule(docs: Seq[Doc]) =
      scheduleRows(CCNetOps.annealScheduleFromRanked(
        CCNetOps.ccnetRankedFromDocWord(CCNetOps.docWord(docs.toDF()))))

    input.addData(batch0: _*)
    drain()
    assert(scheduleRows(AnnealStream.readSchedule(spark, out, 0L)) ==
      batchSchedule(batch0))

    input.addData(batch1: _*)
    drain()

    // State == from-scratch re-tokenization of the whole prefix, one
    // row per (doc_id, w).
    val state = SnapshotStore.latest(spark, table, below = None).get
    val maintained = state.collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val scratch = CCNetOps.docWord((batch0 ++ batch1).toDF()).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(maintained == scratch)
    assert(state.groupBy("doc_id", "w").count().filter(col("count") > 1).count() == 0)

    // Emitted prefix-1 schedule == batch recompute over the full prefix.
    val s1 = scheduleRows(AnnealStream.readSchedule(spark, out, 1L))
    assert(s1 == batchSchedule(batch0 ++ batch1))
    // And the second batch actually moved the curriculum (budgets grew).
    assert(s1 != scheduleRows(AnnealStream.readSchedule(spark, out, 0L)))
  }
}
