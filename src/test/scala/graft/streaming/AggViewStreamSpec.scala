package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

object AggViewStreamSpec {
  final case class Sale(store: String, amount: Double)
  final case class SaleOp(store: String, amount: Double, op: String)
}

class AggViewStreamSpec extends SparkSpec {
  import AggViewStreamSpec.Sale

  test("materialized aggregate view merges partial aggregates across batches and matches a full recompute") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("aggview").toString
    val table = s"$base/view"; val ckpt = s"$base/ckpt"
    val input = MemoryStream[Sale]
    def drain(): Unit =
      AggViewStream.aggViewSink(input.toDF(), "store", "amount", table, ckpt)
        .awaitTermination()
    def view(): Map[String, (Long, Double, Double, Double, Double)] =
      AggViewStream.readView(spark, table).collect()
        .map(r => r.getAs[String]("store") -> ((r.getAs[Long]("n"),
          r.getAs[Double]("s"), r.getAs[Double]("mn"), r.getAs[Double]("mx"),
          r.getAs[Double]("avg_v")))).toMap

    input.addData(Sale("a", 10.0), Sale("a", 30.0), Sale("b", 5.0))
    drain()
    assert(view() == Map(
      "a" -> ((2L, 40.0, 10.0, 30.0, 20.0)),
      "b" -> ((1L, 5.0, 5.0, 5.0, 5.0))))

    // Batch 2 touches an existing key (merge path: count+count, sum+sum,
    // min/max fold) and introduces a new one — the view equals what a
    // full recompute over all rows would produce, without re-reading
    // batch 1.
    input.addData(Sale("a", 2.0), Sale("c", 7.0))
    drain()
    assert(view() == Map(
      "a" -> ((3L, 42.0, 2.0, 30.0, 14.0)),
      "b" -> ((1L, 5.0, 5.0, 5.0, 5.0)),
      "c" -> ((1L, 7.0, 7.0, 7.0, 7.0))))

    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
  }

  test("retractions subtract from the view and a fully-revoked key leaves it") {
    import AggViewStreamSpec.SaleOp
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("aggretract").toString
    val table = s"$base/view"; val ckpt = s"$base/ckpt"
    val input = MemoryStream[SaleOp]
    def drain(): Unit =
      AggViewStream.aggViewSink(input.toDF(), "store", "amount", table, ckpt)
        .awaitTermination()
    def view(): Map[String, (Long, Double)] =
      AggViewStream.readView(spark, table).collect()
        .map(r => r.getAs[String]("store") ->
          ((r.getAs[Long]("n"), r.getAs[Double]("s")))).toMap

    input.addData(
      SaleOp("a", 10.0, "u"), SaleOp("a", 30.0, "u"), SaleOp("b", 5.0, "u"))
    drain()
    assert(view() == Map("a" -> ((2L, 40.0)), "b" -> ((1L, 5.0))))

    // Retraction records re-send the original values flagged 'd' (the
    // takedown pipeline's replay): a's revoked row subtracts exactly; b,
    // fully revoked, LEAVES the view — its count reaches zero, and a
    // reader never sees a zero-count residue row.
    input.addData(SaleOp("a", 30.0, "d"), SaleOp("b", 5.0, "d"))
    drain()
    assert(view() == Map("a" -> ((1L, 10.0))))

    // The revoked key can return later as a fresh insert.
    input.addData(SaleOp("b", 8.0, "u"))
    drain()
    assert(view() == Map("a" -> ((1L, 10.0)), "b" -> ((1L, 8.0))))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
  }

  test("stats catalog stays current under ingestion without rescanning history") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("statscat").toString
    val table = s"$base/cat"; val ckpt = s"$base/ckpt"
    val input = MemoryStream[Sale]
    def drain(): Unit =
      AggViewStream.statsCatalogSink(input.toDF(), Seq("amount"), table, ckpt)
        .awaitTermination()
    def cat(): Map[String, (Long, Long, Double, Double)] =
      StreamOps.latestSnapshot(spark, table).get.collect()
        .map(r => r.getAs[String]("col_name") -> ((r.getAs[Long]("n"),
          r.getAs[Long]("n_null"), r.getAs[Double]("mn"), r.getAs[Double]("mx")))).toMap

    input.addData(Sale("a", 10.0), Sale("b", 4.0))
    drain()
    assert(cat() == Map("amount" -> ((2L, 0L, 4.0, 10.0))))

    // Second batch extends the extremes and the count; the catalog must
    // reflect ALL ingested rows while having aggregated only batch 2.
    input.addData(Sale("c", 50.0), Sale("d", 1.0))
    drain()
    assert(cat() == Map("amount" -> ((4L, 0L, 1.0, 50.0))))

    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
  }
}
