package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

object DimRefreshStreamSpec {
  final case class Fact(cust: Long, amount: Long)
}

class DimRefreshStreamSpec extends SparkSpec {
  import DimRefreshStreamSpec.Fact

  test("an SCD2 upsert between micro-batches changes enrichment without a restart") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("dimrefresh").toString
    val dimDir = s"$base/dim"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"

    // Dimension v1: customer 1 lives in "east".
    Seq((1L, "east", true)).toDF("cust", "region", "is_current")
      .write.parquet(dimDir)

    val input = MemoryStream[Fact]
    def drain(): Unit =
      DimRefreshStream.enrichSink(input.toDF(), dimDir, outDir, ckpt, "cust", "region")
        .awaitTermination()
    def rows(): Set[(Long, Long, String, Long)] =
      spark.read.parquet(s"$outDir/batch_*").collect()
        .map(r => (r.getLong(r.fieldIndex("cust")), r.getLong(r.fieldIndex("amount")),
          Option(r.getString(r.fieldIndex("region"))).getOrElse("∅"),
          r.getLong(r.fieldIndex("ingest_batch")))).toSet

    input.addData(Fact(1L, 100L), Fact(2L, 50L))
    drain()
    // Known customer enriched; unknown customer passes through null.
    assert(rows() == Set((1L, 100L, "east", 0L), (2L, 50L, "∅", 0L)))

    // SCD2 upsert: close the east row, open a west one (append-only —
    // exactly what q_scd2_upsert's history shape produces).
    Seq((1L, "east", false), (1L, "west", true)).toDF("cust", "region", "is_current")
      .write.mode("overwrite").parquet(dimDir)

    input.addData(Fact(1L, 70L))
    drain()
    // The same key now enriches from the NEW current row — the stream
    // picked the upsert up between batches.
    assert(rows() == Set(
      (1L, 100L, "east", 0L), (2L, 50L, "∅", 0L), (1L, 70L, "west", 1L)))

    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
  }
}
