package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Corpus-level line dedup contracts: map-only line construction,
  * exact removal semantics on a hand-built corpus, and reassembly
  * identity for untouched documents on the real sf0.001 corpus.
  */
class LineDedupSpec extends SparkSpec {

  test("docLines builds 4-word lines map-only, tail line short") {
    import spark.implicits._
    val d = Seq((1L, "a b c d e f g h i")).toDF("doc_id", "text")
    val lines = LineDedupOps.docLines(d).select("line_no", "line")
      .orderBy("line_no").collect().map(r => (r.getInt(0), r.getString(1)))
    assert(lines.toSeq == Seq((0, "a b c d"), (1, "e f g h"), (2, "i")))
    // No shuffle in line construction: the plan up to the explode is
    // scan + generate only (no Exchange node).
    val plan = LineDedupOps.docLines(d).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"line construction shuffled:\n$plan")
  }

  test("boilerplate lines are removed everywhere, order preserved") {
    import spark.implicits._
    val boiler = "x x x x"
    val docs = Seq(
      (0L, s"$boiler a b c d"),
      (1L, s"e f g h $boiler"),
      (2L, s"i j k l $boiler m"),
      (3L, "unique words only here")).toDF("doc_id", "text")
    val dir = Files.createTempDirectory("linededup").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = LineDedupOps.defs("text_line_dedup").run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // "x x x x" appears 3 times (docs 0,1,2) => dropped from all three;
    // doc 2's tail line is "m" (5 words -> lines "i j k l","x x x x"?
    // no: words are [i j k l x x x x m] -> lines "i j k l","x x x x","m").
    assert(out.toSeq == Seq(
      (0L, 2L, 1L, "a b c d"),
      (1L, 2L, 1L, "e f g h"),
      (2L, 3L, 1L, "i j k l m"),
      (3L, 1L, 0L, "unique words only here")))
  }

  test("source overlap matrix matches a brute-force line-set self-join") {
    val dir = "/root/testdata/sf0.001"
    val d = graft.Tables(spark, dir, "documents")
    val ls = LineDedupOps.docLines(d.select(col("doc_id"), col("text")))
      .join(d.select(col("doc_id"), col("source")), "doc_id")
      .select("line", "source").distinct().cache()
    val brute = ls.as("a").join(ls.as("b"),
        col("a.line") === col("b.line") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("shared_lines"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val fast = LineDedupOps.defs("text_source_overlap").run(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(fast == brute)
    LineDedupOps.defs("text_source_overlap").run(spark, dir).collect().foreach { r =>
      val j = r.getDouble(3)
      assert(j > 0.0 && j <= 1.0, s"jaccard $j out of range")
    }
  }

  test("documents with nothing dropped reassemble to their exact text") {
    val dir = "/root/testdata/sf0.001"
    val out = LineDedupOps.defs("text_line_dedup").run(spark, dir)
    val orig = graft.Tables(spark, dir, "documents").select("doc_id", "text")
    val untouched = out.filter(col("n_dropped") === 0)
      .join(orig, "doc_id")
      .filter(col("clean_text") =!= col("text"))
    assert(untouched.count() == 0,
      "reassembly changed a document that lost no lines")
  }
}
