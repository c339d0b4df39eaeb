package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Durable IVF-PQ index (r9 verdict task 5): build once, persist,
  * search the on-disk index repeatedly — byte-equal results, no
  * retraining — and fail typed on an uncommitted index directory.
  */
class IvfPqPersistSpec extends SparkSpec {

  test("persisted index: build once, search twice byte-equal, matches the in-memory search") {
    val dir = java.nio.file.Files.createTempDirectory("ivfpqidx").toString
    val e = graft.Tables(spark, sf("embeddings"), "embeddings")
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v")).cache()
    val model = IvfPqOps.train(e, cells = 16, m = 8, sub = 8, codes = 16, iters = 2)
    val encoded = IvfPqOps.encode(e, model)
    IvfPqOps.persistIndex(spark, dir, model, encoded)

    val probes = e.filter(col("vec_id") < 5)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq

    val s1 = canon(IvfPqOps.searchIndex(spark, dir, probes))
    val s2 = canon(IvfPqOps.searchIndex(spark, dir, probes))
    assert(s1 === s2, "two searches of the same on-disk index diverged")
    assert(s1.nonEmpty && s1 ===
      canon(IvfPqOps.searchEncodedCells(spark, encoded, model, probes)),
      "on-disk search diverged from the in-memory search")
    e.unpersist()
  }

  test("an uncommitted index directory (no model.json marker) fails typed") {
    val dir = java.nio.file.Files.createTempDirectory("ivfpqempty").toString
    val err = intercept[graft.api.GraftError.QueryError](
      IvfPqOps.loadIndex(spark, dir))
    assert(err.getMessage.contains("model.json"))
  }
}
