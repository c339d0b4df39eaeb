package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.DomainMixOps

object DoremiStreamSpec {
  final case class Doc(doc_id: Long, lang: String, text: String)
}

/** Online DoReMi contracts: the maintained (lang, w) count state equals
  * a from-scratch batch recompute over the full stream prefix (the part
  * incremental maintenance could get wrong), the emitted weight table
  * equals the batch operator's closed form over the same prefix, and
  * weights shift toward a domain whose arriving text diverges from the
  * global mix.
  */
class DoremiStreamSpec extends SparkSpec {
  import DoremiStreamSpec.Doc

  test("maintained counts and weights equal the batch recompute per prefix") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("doremistream").toString
    val table = s"$base/state"; val out = s"$base/weights"; val ckpt = s"$base/ckpt"
    val input = MemoryStream[Doc]
    def drain(): Unit =
      DoremiStream.weightSink(input.toDF(), table, out, ckpt).awaitTermination()

    val batch0 = Seq(
      Doc(1L, "en", "the cat sat on the mat"),
      Doc(2L, "en", "the dog ate the bone"),
      Doc(3L, "de", "der hund und die katze"),
      Doc(4L, "fr", "le chat et le chien"))
    // Batch 1 adds only en/fr mass: de's share of the global mix
    // shrinks, so its KL from the global LM — the closed-form excess
    // loss — strictly rises (its vocabulary is disjoint, making the
    // excess exactly ln(T_g/T_de), monotone in T_g).
    val batch1 = Seq(
      Doc(5L, "en", "the cat sat on the mat again"),
      Doc(6L, "en", "the dog sat on the bone"),
      Doc(7L, "fr", "le chien dort"))

    input.addData(batch0: _*)
    drain()

    def batchWeights(docs: Seq[Doc]) =
      DomainMixOps.weightsFromCounts(
        DomainMixOps.domainCounts(docs.toDF())).collect().toSeq
    def batchCounts(docs: Seq[Doc]) =
      DomainMixOps.domainCounts(docs.toDF())
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

    // Prefix 0: weights written by the sink == batch closed form.
    assert(DoremiStream.readWeights(spark, out, 0L)
      .orderBy("lang").collect().toSeq == batchWeights(batch0))

    input.addData(batch1: _*)
    drain()

    // Maintained state after the full-outer merge == from-scratch counts
    // over batch0 ++ batch1, one row per (lang, w).
    val state = SnapshotStore.latest(spark, table, below = None).get
    val maintained = state.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(maintained == batchCounts(batch0 ++ batch1))
    assert(state.groupBy("lang", "w").count().filter(col("count") > 1).count() == 0)

    // Prefix 1 weights == batch closed form over the full prefix.
    val w1 = DoremiStream.readWeights(spark, out, 1L).orderBy("lang").collect().toSeq
    assert(w1 == batchWeights(batch0 ++ batch1))

    // Direction: batch1's divergent de text raises de's excess loss, so
    // de's weight strictly rises vs prefix 0 (the monitor's purpose).
    def weightOf(rows: Seq[org.apache.spark.sql.Row], lang: String): Double =
      rows.find(_.getString(0) == lang).get.getDouble(3)
    val w0 = DoremiStream.readWeights(spark, out, 0L).orderBy("lang").collect().toSeq
    assert(weightOf(w1, "de") > weightOf(w0, "de"))
  }
}
