package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Content-hash split contracts: verbatim duplicates co-locate in one
  * split (the leakage rule), and per-language fractions partition the
  * corpus exactly.
  */
class CurateSplitSpec extends SparkSpec {

  test("verbatim duplicate texts always land in the same split") {
    import spark.implicits._
    // 60 docs, 20 distinct texts, each duplicated 3x under different ids.
    val docs = (0 until 60).map { i =>
      (i.toLong, s"duplicated content number ${i % 20} with more words", "en", "src0",
        40L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = Files.createTempDirectory("split").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // Re-derive the assignment exactly as the operator does and check
    // each text maps to one split.
    val assigned = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("b",
        conv(substring(md5(col("text")), 1, 12), 16, 10).cast("long") % 10)
      .withColumn("split",
        when(col("b") < 8, "train").when(col("b") === 8, "val").otherwise("test"))
    val multi = assigned.groupBy("text")
      .agg(countDistinct("split").as("ns")).filter(col("ns") > 1)
    assert(multi.count() == 0, "a duplicated text was split across partitions")
  }

  test("per-language fractions sum to 1 and counts partition the corpus") {
    val dir = "/root/testdata/sf0.001"
    val out = CurateOps2.defs("curate_split").run(spark, dir).cache()
    val fracs = out.groupBy("lang").agg(sum("frac").as("f"), sum("n_docs").as("n"))
      .collect()
    val perLang = graft.Tables(spark, dir, "documents")
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    fracs.foreach { r =>
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-5,
        s"${r.getString(0)} fractions sum to ${r.getDouble(1)}")
      assert(r.getLong(2) == perLang(r.getString(0)))
    }
  }
}
