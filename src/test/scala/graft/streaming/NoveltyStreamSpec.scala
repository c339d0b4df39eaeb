package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.TextOps3

object NoveltyStreamSpec {
  final case class Doc(doc_id: Long, text: String)
}

/** Online novelty contracts: the maintained gram → first-doc state
  * equals a from-scratch batch recompute over the full stream prefix
  * (the part incremental maintenance could get wrong), and for batches
  * arriving in doc_id order the concatenated per-batch profiles equal
  * the batch operator's novelty over the prefix corpus — including the
  * cross-batch case where a later doc repeats an earlier batch's grams
  * and the within-batch case where two docs of one batch collide.
  */
class NoveltyStreamSpec extends SparkSpec {
  import NoveltyStreamSpec.Doc

  test("maintained first-doc state and profiles equal the batch recompute") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("noveltystream").toString
    val table = s"$base/state"; val out = s"$base/profiles"; val ckpt = s"$base/ckpt"
    val input = MemoryStream[Doc]
    def drain(): Unit =
      NoveltyStream.noveltySink(input.toDF(), table, out, ckpt).awaitTermination()

    // doc 2 repeats doc 1's opening trigram (within-batch collision);
    // doc 3 is all-fresh; docs under 3 tokens contribute nothing.
    val batch0 = Seq(
      Doc(1L, "a b c d"),
      Doc(2L, "a b c x"),
      Doc(3L, "p q r s t"),
      Doc(4L, "one two"))
    // doc 5 repeats batch0 grams verbatim (cross-batch: novelty 0);
    // doc 6 mixes one old gram with fresh ones.
    val batch1 = Seq(
      Doc(5L, "a b c d"),
      Doc(6L, "b c x y z"))

    def batchNovelty(docs: Seq[Doc]) = {
      val tri = TextOps3.docTrigrams(docs.toDF())
      val first = tri.groupBy("g").agg(min("doc_id").as("fd"))
      tri.join(first, "g").groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("doc_id") === col("fd"), 1L).otherwise(0L)).as("n_novel"))
        .withColumn("novelty",
          round(col("n_novel") / col("n_grams").cast("double"), 4))
    }

    input.addData(batch0: _*)
    drain()
    val p0 = NoveltyStream.readProfiles(spark, out, 0L).orderBy("doc_id")
    assert(p0.collect().toSeq ==
      batchNovelty(batch0).orderBy("doc_id").collect().toSeq)
    // The within-batch collision: doc 2's first trigram "a b c" belongs
    // to doc 1, so exactly one of its two grams is novel.
    val d2 = p0.filter(col("doc_id") === 2L).collect().head
    assert(d2.getLong(1) == 2L && d2.getLong(2) == 1L)

    input.addData(batch1: _*)
    drain()

    // Maintained state == from-scratch first-doc table over the union,
    // one row per distinct gram, keyed by the gram hash.
    val state = SnapshotStore.latest(spark, table, below = None).get
    val expect = {
      val tri = TextOps3.docTrigrams((batch0 ++ batch1).toDF())
        .withColumn("gh", md5(col("g")))
      tri.groupBy("gh").agg(min("doc_id").as("fd"))
    }
    assert(state.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
      expect.collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
    assert(state.groupBy("gh").count().filter(col("count") > 1).count() == 0)

    // Batch-1 profiles == the batch operator over the prefix corpus,
    // restricted to batch-1 docs (doc_id order aligns with arrival).
    val p1 = NoveltyStream.readProfiles(spark, out, 1L).orderBy("doc_id")
    val expect1 = batchNovelty(batch0 ++ batch1)
      .filter(col("doc_id") >= 5L).orderBy("doc_id")
    assert(p1.collect().toSeq == expect1.collect().toSeq)
    // Cross-batch memorization: doc 5 is a verbatim repeat — novelty 0.
    assert(p1.filter(col("doc_id") === 5L).collect().head.getDouble(3) == 0.0)
  }
}
