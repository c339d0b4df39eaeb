package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

/** Equality pins for the r16 native BPE kernels (graftbridge.BpeKernel)
  * against the formulations they replaced: pair counting must reproduce
  * the split + transform + explode chain's per-key totals, token count
  * must equal size(split(...)), and the one-pass batched multiReplace
  * must be byte-identical to folding `replace` over a symbol-disjoint
  * batch — on the real corpus trajectory AND on adversarial fixtures
  * (self-adjacent runs, chained symbols, multibyte tokens, empties).
  */
class BpeKernelSpec extends SparkSpec {

  private val S = "\u001f"
  private val dir = "/root/testdata/sf0.001"

  private def charString(text: String): String =
    if (text.isEmpty) S + S
    else S + text.replace(S, "").map(_.toString).mkString(S + S) + S

  /** The pre-r16 pair-count chain, verbatim. */
  private def oldPairCounts(curSql: String): Map[String, Long] = {
    import spark.implicits._
    val cur = spark.sql(curSql)
    cur
      .select(split(
        col("s").substr(lit(2), greatest(length(col("s")) - 2, lit(0))),
        java.util.regex.Pattern.quote(S + S), -1).as("t"))
      .filter(size(col("t")) >= 2)
      .select(explode(expr(
        s"transform(sequence(1, size(t) - 1), i -> concat(element_at(t, i), '$S', element_at(t, i + 1)))"))
        .as("p"))
      .groupBy(col("p")).agg(count(lit(1)).as("cnt"))
      .as[(String, Long)].collect().toMap
  }

  private def newPairCounts(curSql: String): Map[String, Long] = {
    import spark.implicits._
    spark.sql(curSql)
      .select(explode(graft.functions.GraftFunctions.bpePairCounts(col("s"))).as(Seq("p", "c")))
      .groupBy(col("p")).agg(sum("c").as("cnt"))
      .as[(String, Long)].collect().toMap
  }

  test("pairCounts == old split/transform/explode chain on the real corpus") {
    val docs = graft.Tables(spark, dir, "documents")
    docs.select(col("doc_id"), col("text")).createOrReplaceTempView("bpek_docs")
    val curSql =
      s"""SELECT concat('$S', array_join(split(replace(text, '$S', ''), ''), '$S$S'), '$S') AS s
         |FROM bpek_docs""".stripMargin
    val o = oldPairCounts(curSql)
    val n = newPairCounts(curSql)
    assert(n === o)
    assert(o.nonEmpty)
  }

  test("tokenCount == size(split) incl. empty and multibyte") {
    import spark.implicits._
    val fixtures = Seq(
      "", "a", "héllo wörld", "日本語 テスト", S + "inside" + S, "a b c d")
    val df = fixtures.map(charString).toDF("s")
    val both = df.select(
      size(split(col("s").substr(lit(2), greatest(length(col("s")) - 2, lit(0))),
        java.util.regex.Pattern.quote(S + S), -1)).cast("long").as("old"),
      graft.functions.GraftFunctions.bpeTokenCount(col("s")).as("nw"))
      .collect()
    both.foreach(r => assert(r.getLong(0) === r.getLong(1), r.toString))
  }

  private def seqReplace(s: String, batch: Seq[(String, String)]): String =
    batch.foldLeft(s) { case (acc, (a, b)) =>
      acc.replace(S + a + S + S + b + S, S + a + b + S)
    }

  private def kernelReplace(s: String, batch: Seq[(String, String)]): String =
    org.apache.spark.sql.graftbridge.BpeKernel.multiReplace(
      UTF8String.fromString(s),
      batch.map { case (a, b) => (S + a + S + S + b + S).getBytes("UTF-8") }.toArray,
      batch.map { case (a, b) => (S + a + b + S).getBytes("UTF-8") }.toArray).toString

  test("multiReplace == sequential replace fold on adversarial disjoint batches") {
    val cases: Seq[(String, Seq[(String, String)])] = Seq(
      // self-adjacent run: leftmost non-overlapping within one rule
      ("a a a a a", Seq(("a", "a"))),
      // adjacent rules across the string: a·b then c·d back to back
      ("a b c d a b", Seq(("a", "b"), ("c", "d"))),
      // rule symbol is a PREFIX of another rule's symbol
      ("x xy z x xy", Seq(("x", "xy"), ("z", "x2"))),
      // multibyte tokens
      ("日 本 語 日 本", Seq(("日", "本"))),
      // empty-effect batch (no occurrences)
      ("a b", Seq(("q", "r"))),
      // longer chain where a merge output abuts another rule's match
      ("p q r s p q", Seq(("p", "q"), ("r", "s"))))
    cases.foreach { case (text, rawBatch) =>
      val batch = BpeOps.selectDisjoint(rawBatch, perRound = 8)
      val s = charString(text)
      assert(kernelReplace(s, batch) === seqReplace(s, batch), s"text=$text batch=$batch")
    }
  }

  test("multiReplace == sequential fold along the real training trajectory") {
    import spark.implicits._
    val docs = graft.Tables(spark, dir, "documents")
      .select(col("text")).as[String].collect().toSeq
    var cur = docs.map(charString)
    // Re-derive each round's selection locally (same ranking + greedy
    // disjoint batch as BpeOps.train) and check both replace forms on
    // every document at every round.
    for (_ <- 1 to BpeOps.Rounds) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      cur.foreach { s =>
        val t = s.substring(1, math.max(s.length - 1, 1)).split(
          java.util.regex.Pattern.quote(S + S), -1)
        if (t.length >= 2) t.sliding(2).foreach { w =>
          counts((w(0), w(1))) = counts.getOrElse((w(0), w(1)), 0L) + 1L
        }
      }
      val ranked = counts.toSeq
        .sortBy { case ((a, b), c) => (-c, a, b) }.take(BpeOps.TopM).map(_._1)
      val sel = BpeOps.selectDisjoint(ranked, BpeOps.PerRound)
      if (sel.nonEmpty) {
        cur = cur.map { s =>
          val viaSeq = seqReplace(s, sel)
          val viaKernel = kernelReplace(s, sel)
          assert(viaKernel === viaSeq)
          viaKernel
        }
      }
    }
  }
}
