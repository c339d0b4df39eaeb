package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contracts for the round-13 curation additions: n-gram novelty,
  * the KN perplexity-band filter, and temperature-scaled domain
  * sampling.
  */
class NoveltyCurriculumSpec extends SparkSpec {

  test("ngram novelty: first doc fully novel, verbatim repeat fully stale") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b c d e"),
      (1L, "a b c d e"),          // verbatim repeat -> novelty 0
      (2L, "x y z w"),            // fresh -> novelty 1
      (3L, "c d e x y z q"))      // mixes old and new grams
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = Files.createTempDirectory("novelty").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextOps3.defs("text_ngram_novelty").run(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows(0L) == (3L, 3L))
    assert(rows(1L) == (3L, 0L))
    assert(rows(2L) == (2L, 2L))
    // doc 3: grams "c d e","d e x","e x y","x y z","y z q" — c-d-e is
    // doc 0's, x-y-z is doc 2's, the other three are first seen here.
    assert(rows(3L) == (5L, 3L))
    // Conservation: total novel occurrences == distinct grams whose
    // first doc carries them once... here every first occurrence is
    // unique within its doc, so n_novel sums to the distinct gram count.
    val distinctGrams = TextOps3.docTrigrams(docs).select("g").distinct().count()
    assert(rows.values.map(_._2).sum == distinctGrams)
  }

  test("perplexity filter: exact quartile bands and a true rank permutation") {
    val df = TextOps3.defs("text_perplexity_filter")
      .run(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    val n = rows.length
    val q = n / 4
    val bands = rows.groupBy(_.getString(4)).view.mapValues(_.length).toMap
    assert(bands("low") == q && bands("high") == q)
    assert(bands("keep") == n - 2 * q)
    // The bucket-offset composition must produce the global permutation.
    assert(rows.map(_.getLong(3)).sorted.toSeq == (1L to n).toSeq)
    // Band boundaries follow the score order: every 'low' scores at or
    // below every 'high'.
    val lowMax = rows.filter(_.getString(4) == "low").map(_.getDouble(2)).max
    val highMin = rows.filter(_.getString(4) == "high").map(_.getDouble(2)).min
    assert(lowMax <= highMin)
  }

  test("temperature sample: exact apportionment and alpha<1 upweights small domains") {
    val df = DomainMixOps.defs("curate_temperature_sample")
      .run(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    val nTotal = rows.map(_.getLong(1)).sum
    val budget = nTotal / 5 * 2
    // Largest-remainder apportionment: quotas sum to the budget exactly.
    assert(rows.map(_.getLong(2)).sum == budget)
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(1), s"${r.getString(0)} takes over supply")
      assert(r.getLong(3) <= r.getLong(2))
    }
    // alpha = 0.5 flattens the mixture: the smallest domain's sampled
    // share strictly exceeds its corpus share; the largest's shrinks.
    val byN = rows.sortBy(_.getLong(1))
    val (small, large) = (byN.head, byN.last)
    if (small.getLong(1) < large.getLong(1)) {
      assert(small.getLong(2).toDouble / budget >
        small.getLong(1).toDouble / nTotal)
      assert(large.getLong(2).toDouble / budget <
        large.getLong(1).toDouble / nTotal)
    }
  }

  test("temperature sample: bucket-offset membership equals a plain per-lang window") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val rows = DomainMixOps.defs("curate_temperature_sample").run(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(3), r.getLong(4))).toMap
    val docs = graft.Tables(spark, dir, "documents")
      .select(col("lang"), col("doc_id"),
        substring(md5(col("doc_id").cast("string")), 1, 12).as("h"))
      .withColumn("lrank", row_number().over(
        Window.partitionBy("lang").orderBy(col("h"), col("doc_id"))).cast("long"))
      .collect()
    rows.foreach { case (lang, (taken, selSum)) =>
      val direct = docs.filter(r => r.getString(0) == lang &&
        r.getLong(3) <= taken).map(_.getLong(1)).sum
      assert(direct == selSum, s"$lang: plain-window sum $direct != $selSum")
    }
  }
}
