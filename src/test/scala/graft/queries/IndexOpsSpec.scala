package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IndexOpsSpec extends SparkSpec {

  private val dir = sf("documents")

  test("tfidf: per-doc ranks are 1..k with non-increasing scores, terms from the doc") {
    val out = IndexOps.defs("text_tfidf_topk").run(spark, dir).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getLong(0)).foreach { case (doc, rows) =>
      val ranks = rows.map(_.getLong(1)).sorted
      assert(ranks.sameElements(1L to ranks.length), s"doc $doc ranks not contiguous")
      val scores = rows.sortBy(_.getLong(1)).map(_.getDouble(4))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"doc $doc scores not non-increasing")
    }
    // Every (doc, term) really occurs in that document's text.
    val docs = graft.Tables(spark, dir, "documents")
      .filter(col("doc_id") < 40)
      .collect().map(r => r.getLong(0) -> r.getString(1).split(" ").toSet).toMap
    out.foreach(r =>
      assert(docs(r.getLong(0)).contains(r.getString(2)),
        s"term ${r.getString(2)} not in doc ${r.getLong(0)}"))
  }

  test("inverted index: df equals posting length, postings sorted, phrases verifiable") {
    val out = IndexOps.defs("text_inverted_index").run(spark, dir).collect()
    assert(out.nonEmpty, "df band selected no bigrams at this scale")
    out.foreach { r =>
      val posts = r.getString(2).split(",").map(_.toLong)
      assert(posts.length == r.getLong(1), s"df ${r.get(1)} != |postings| for ${r.getString(0)}")
      assert(posts.sameElements(posts.sorted), s"postings unsorted for ${r.getString(0)}")
    }
    // Spot-check the first phrase: every listed doc contains it.
    val phrase = out.head.getString(0)
    val listed = out.head.getString(2).split(",").map(_.toLong).toSet
    val actual = graft.Tables(spark, dir, "documents")
      .filter(col("text").contains(phrase))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(listed.subsetOf(actual),
      s"postings for '$phrase' include a doc that lacks the phrase")
  }
}
