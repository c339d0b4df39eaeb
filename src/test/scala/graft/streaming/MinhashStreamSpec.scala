package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

object MinhashStreamSpec {
  final case class Doc(doc_id: Long, text: String)
  final case class DocOp(doc_id: Long, text: String, deleted: Boolean)
}

class MinhashStreamSpec extends SparkSpec {
  import MinhashStreamSpec.Doc

  // Near-dup pairs share almost all 3-shingles (J ≈ 0.8-0.9, far above
  // τ=0.5, so 16-band×2-row LSH recall is ~1); unrelated docs use
  // disjoint vocabularies — zero shared shingles by construction.
  private val base1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
  private val dup1 = base1 + " nu" // one appended word: J = 10/12
  private val base4 = "red orange yellow green blue indigo violet white black brown pink gray"
  private val dup4 = base4.replace(" gray", " cyan")
  private val lone = "one two three four five six seven eight nine ten eleven twelve"

  test("incremental MinHash-LSH: cross-batch near-dups detected, re-sent docs are no-ops, ledger grows atomically") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val baseDir = java.nio.file.Files.createTempDirectory("mhlsh").toString
    val table = s"$baseDir/nd"; val ckpt = s"$baseDir/ckpt"
    val input = MemoryStream[Doc]
    def drain(): Unit =
      MinhashStream.minhashSink(input.toDF(), table, ckpt).awaitTermination()
    def pairSet(): Set[(Long, Long)] =
      MinhashStream.pairs(spark, table).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    def stateCounts(): (Long, Long) = {
      val s = SnapshotStore.latest(spark, table).get
      (s.filter(org.apache.spark.sql.functions.col("kind") === "doc").count(),
        s.filter(org.apache.spark.sql.functions.col("kind") === "pair").count())
    }

    // batch 0: doc 1 and an unrelated doc — no pairs yet.
    input.addData(Doc(1L, base1), Doc(2L, lone))
    drain()
    assert(pairSet() == Set.empty)
    assert(stateCounts() == ((2L, 0L)))

    // batch 1: doc 3 is a planted near-dup of doc 1 FROM BATCH 0 — the
    // cross-batch candidate join (new-batch bands × stored buckets) must
    // surface it; doc 4 is new and unrelated.
    input.addData(Doc(3L, dup1), Doc(4L, base4))
    drain()
    assert(pairSet() == Set((1L, 3L)))
    assert(stateCounts() == ((4L, 1L)))
    // The verified similarity is the exact Jaccard, not an estimate.
    // base1 yields 10 shingles, dup1 11, sharing all 10 → J = 10/11.
    val j13 = MinhashStream.pairs(spark, table).collect().head.getDouble(2)
    assert(j13 == 0.9091, s"J(1,3) = $j13, expected 10/11 rounded to 4dp")

    // batch 2: an IN-batch near-dup pair (5 ~ 4's text family) plus a
    // re-send of doc 1 — the re-sent doc is a no-op (already indexed;
    // emitting (1,3) again would double the ledger).
    input.addData(Doc(5L, dup4), Doc(1L, base1))
    drain()
    assert(pairSet() == Set((1L, 3L), (4L, 5L)))
    assert(stateCounts() == ((5L, 2L)))

    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(baseDir))
  }

  test("doc tombstones purge the index row AND its ledger pairs; re-insert re-derives them") {
    import MinhashStreamSpec.DocOp
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val baseDir = java.nio.file.Files.createTempDirectory("mhtomb").toString
    val table = s"$baseDir/nd"; val ckpt = s"$baseDir/ckpt"
    val input = MemoryStream[DocOp]
    def drain(): Unit =
      MinhashStream.minhashSink(input.toDF(), table, ckpt).awaitTermination()
    def pairSet(): Set[(Long, Long)] =
      MinhashStream.pairs(spark, table).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    def docSet(): Set[Long] =
      MinhashStream.indexedDocs(spark, table).collect().map(_.getLong(0)).toSet

    // Near-dup trio: 1 ~ 3 and 4 ~ 5 established across two batches.
    input.addData(DocOp(1L, base1, false), DocOp(3L, dup1, false))
    drain()
    input.addData(DocOp(4L, base4, false), DocOp(5L, dup4, false))
    drain()
    assert(pairSet() == Set((1L, 3L), (4L, 5L)))

    // Takedown of doc 1: its index row AND the (1,3) ledger pair leave;
    // the unrelated (4,5) pair survives.
    input.addData(DocOp(1L, base1, true))
    drain()
    assert(docSet() == Set(3L, 4L, 5L))
    assert(pairSet() == Set((4L, 5L)))

    // Re-insert doc 1: it re-pairs with the still-indexed doc 3.
    input.addData(DocOp(1L, base1, false))
    drain()
    assert(docSet() == Set(1L, 3L, 4L, 5L))
    assert(pairSet() == Set((1L, 3L), (4L, 5L)))

    // Same-batch delete + upsert of doc 4: delete wins — the doc AND
    // its pair are gone even though an upsert rode the same batch.
    input.addData(DocOp(4L, base4, true), DocOp(4L, base4, false))
    drain()
    assert(docSet() == Set(1L, 3L, 5L))
    assert(pairSet() == Set((1L, 3L)))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(baseDir))
  }

  test("incremental ledger equals the batch operator over the ingested corpus") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val baseDir = java.nio.file.Files.createTempDirectory("mhlsh2").toString
    val table = s"$baseDir/nd"; val ckpt = s"$baseDir/ckpt"
    val input = MemoryStream[Doc]
    val corpus = Seq(Doc(1L, base1), Doc(2L, lone), Doc(3L, dup1),
      Doc(4L, base4), Doc(5L, dup4))
    // Stream the corpus in three uneven batches.
    input.addData(corpus(0), corpus(1))
    MinhashStream.minhashSink(input.toDF(), table, ckpt).awaitTermination()
    input.addData(corpus(2))
    MinhashStream.minhashSink(input.toDF(), table, ckpt).awaitTermination()
    input.addData(corpus(3), corpus(4))
    MinhashStream.minhashSink(input.toDF(), table, ckpt).awaitTermination()

    // Batch recompute with the same kernels over the whole corpus: the
    // ledger after the last batch must match pair-for-pair (same τ, same
    // rounding).
    import org.apache.spark.sql.functions._
    import graft.queries.TextOps
    val d = corpus.toDF("doc_id", "text")
      .select(col("doc_id"), array_sort(TextOps.shingleHashes(
        TextOps.shinglesFromToks(split(col("text"), " ")))).as("hs"))
    val expected = d.as("a").join(d.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        round(graft.functions.GraftFunctions.jaccardSortedLong(
          col("a.hs"), col("b.hs")), 4).as("jaccard"))
      .filter(col("jaccard") >= 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val got = MinhashStream.pairs(spark, table).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expected, s"ledger $got != batch recompute $expected")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(baseDir))
  }
}
