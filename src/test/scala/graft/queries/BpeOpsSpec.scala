package graft.queries

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** BPE tokenizer hardening (r9 verdict tasks 2+3): sentinel-collision
  * normalization proven on a poisoned document, the batched disjoint
  * merge selection rule, and the ≥32-merge vocabulary target on the
  * real fixture.
  */
class BpeOpsSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def frame(rows: (Long, String)*) =
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map { case (i, t) => Row(i, t) }: _*), schema)

  test("a document containing the U+001F sentinel tokenizes exactly like its clean twin") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "pack my box with five dozen liquor jugs",
      "sphinx of black quartz judge my vow")
    // Poison doc 0 with sentinels in the middle, at the start, at the
    // end, and doubled — every placement that could fabricate or split
    // a token boundary.
    val poisoned = frame(
      (0L, "\u001f" + texts(0).replace("quick", "qu\u001fick") + "\u001f\u001f"),
      (1L, texts(1)), (2L, texts(2)))
    val clean = frame((0L, texts(0)), (1L, texts(1)), (2L, texts(2)))
    val p = BpeOps.encodeStats(poisoned, rounds = 3).orderBy("doc_id").collect().toSeq
    val c = BpeOps.encodeStats(clean, rounds = 3).orderBy("doc_id").collect().toSeq
    assert(p === c)
  }

  test("selectDisjoint: rank order wins, shared symbols and merged-string aliases are skipped") {
    val ranked = Seq(
      ("a", "b"),   // accepted
      ("b", "c"),   // skipped: b consumed
      ("x", "y"),   // accepted
      ("ab", "z"),  // skipped: "ab" is (a,b)'s merged symbol
      ("p", "q"),   // accepted
      ("m", "m"))   // accepted (a == b is legal: uses m and mm)
    assert(BpeOps.selectDisjoint(ranked, perRound = 8) ===
      Seq(("a", "b"), ("x", "y"), ("p", "q"), ("m", "m")))
    assert(BpeOps.selectDisjoint(ranked, perRound = 2) ===
      Seq(("a", "b"), ("x", "y")))
    assert(BpeOps.selectDisjoint(Nil, perRound = 8) === Nil)
  }

  test("fixture corpus trains >= 32 merges in 8 batched rounds") {
    val docs = graft.Tables(spark, sf("documents"), "documents")
    val merges = BpeOps.encodeStats(docs).select("merges").head().getString(0)
    val n = merges.split('|').length
    assert(n >= 32, s"only $n merges learned — batching regressed")
  }
}
