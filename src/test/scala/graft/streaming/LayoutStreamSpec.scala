package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

object LayoutStreamSpec {
  final case class Pt(id: Long, zx: Long, zy: Long)
}

class LayoutStreamSpec extends SparkSpec {
  import LayoutStreamSpec.Pt

  // Two independent hash-derived dimensions, like LayoutSpec — uniform
  // over [0, 64) so per-file extents are meaningful.
  private def pts(ids: Range): Seq[Pt] = ids.map { i =>
    def h(salt: Long) = {
      val x = java.lang.Long.rotateLeft(i.toLong * 0x9E3779B97F4A7C15L + salt, 17)
      math.floorMod(x, 64L)
    }
    Pt(i.toLong, h(1L), h(2L))
  }

  test("z-clustered sink: ingests raw, compacts every N batches, readers see exactly-once, base stays clustered") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("zsink").toString
    val dir = s"$base/table"; val ckpt = s"$base/ckpt"
    val input = MemoryStream[Pt]
    def drain(): Unit =
      LayoutStream.zClusteredSink(input.toDF(), dir, ckpt, "zx", "zy",
        compactEvery = 2, targetFileBytes = 4L << 10)
        .awaitTermination()
    def dirs(): Seq[String] =
      new java.io.File(dir).listFiles().map(_.getName)
        .filter(n => n.startsWith("base_") || n.startsWith("landing_")).sorted.toSeq

    // batches 0..3 with compactEvery=2: compaction fires at 1 and 3.
    input.addData(pts(0 until 2000): _*); drain()
    input.addData(pts(2000 until 4000): _*); drain()
    assert(dirs() == Seq("base_1"), dirs().toString)
    input.addData(pts(4000 until 6000): _*); drain()
    assert(dirs() == Seq("base_1", "landing_2"), dirs().toString)
    input.addData(pts(6000 until 8000): _*); drain()
    assert(dirs() == Seq("base_3"), dirs().toString)

    // Exactly-once across ingest + two compactions.
    val got = LayoutStream.readTable(spark, dir)
    assert(got.count() == 8000L)
    assert(got.select("id").distinct().count() == 8000L)

    // The compacted base is still z-clustered: files bound the SECOND
    // dimension (mean per-file zy extent well under the full 64 range —
    // a plain append/lexicographic layout leaves it ~full-range).
    val baseFiles = spark.read.parquet(s"$dir/base_3")
      .groupBy(input_file_name().as("f"))
      .agg((max("zy") - min("zy") + 1).as("y_extent"), count(lit(1)).as("n"))
    assert(baseFiles.count() >= 4, "compaction produced too few files to measure clustering")
    val meanExtent = baseFiles.agg(avg("y_extent")).collect()(0).getDouble(0)
    assert(meanExtent < 32.0, s"base files span zy $meanExtent on average — not clustered")

    // A post-compaction batch lands raw and is immediately readable.
    input.addData(pts(8000 until 8100): _*); drain()
    assert(dirs() == Seq("base_3", "landing_4"), dirs().toString)
    assert(LayoutStream.readTable(spark, dir).count() == 8100L)

    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
  }
}
