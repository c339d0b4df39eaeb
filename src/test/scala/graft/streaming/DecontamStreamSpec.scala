package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

object DecontamStreamSpec {
  final case class Doc(doc_id: Long, text: String)
}

class DecontamStreamSpec extends SparkSpec {
  import DecontamStreamSpec.Doc

  test("streaming decontamination reloads the benchmark gram table every batch: grams registered mid-stream flag the next batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("decontam").toString
    val benchDir = s"$base/bench"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"

    Seq("w1 w2 w3 w4").toDF("g").write.parquet(benchDir)

    val input = MemoryStream[Doc]
    def drain(): Unit =
      DecontamStream.decontamSink(input.toDF(), benchDir, outDir, ckpt)
        .awaitTermination()
    def flags(): Map[Long, (Long, Boolean)] =
      spark.read.parquet(s"$outDir/batch_*").collect()
        .map(r => r.getLong(r.fieldIndex("doc_id")) ->
          (r.getLong(r.fieldIndex("n_matched")), r.getBoolean(r.fieldIndex("contaminated"))))
        .toMap

    // batch 0: doc 10 shares the registered gram; 11 is clean; 12 holds
    // the gram that will only be registered AFTER this batch.
    input.addData(
      Doc(10L, "w1 w2 w3 w4 x"),
      Doc(11L, "clean words only here now"),
      Doc(12L, "p q r s t"))
    drain()
    assert(flags() == Map(
      10L -> (1L, true), 11L -> (0L, false), 12L -> (0L, false)))

    // Register a new eval gram BETWEEN batches (append, no restart).
    Seq("p q r s").toDF("g").write.mode("append").parquet(benchDir)

    // batch 1: the same text that passed in batch 0 now flags — the gram
    // table was reloaded, not frozen at stream start. A sub-n-token doc
    // flags clean instead of erroring on an empty shingle range.
    input.addData(Doc(13L, "p q r s t"), Doc(14L, "one two"))
    drain()
    assert(flags() == Map(
      10L -> (1L, true), 11L -> (0L, false), 12L -> (0L, false),
      13L -> (1L, true), 14L -> (0L, false)))

    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
  }
}
