package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QualityOpsSpec extends SparkSpec {

  private val dir = sf("lineitem")

  test("expectations contract: all five checks pass on the synthetic data") {
    val out = QualityOps.defs("q_expectations").run(spark, dir).collect()
    assert(out.length == 5)
    out.foreach(r => assert(r.getBoolean(1), s"check ${r.getString(0)} failed, observed ${r.get(2)}"))
    val byName = out.map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(byName("row_count_positive") > 0)
    assert(byName("l_orderkey_in_orders") == 0L)
  }

  test("skew diagnostics: descending counts, exact integer hot flag") {
    val out = QualityOps.defs("q_skew_diagnose").run(spark, dir).collect()
    assert(out.length == 10)
    val counts = out.map(_.getLong(1))
    assert(counts.sameElements(counts.sorted(Ordering[Long].reverse)))
    val total = graft.Tables(spark, dir, "events").count()
    out.foreach { r =>
      assert(r.getBoolean(3) == (r.getLong(1) * 1000 > total),
        s"hot flag for user ${r.get(0)} disagrees with cnt*1000 > total")
    }
  }

  test("global index: gid is the contiguous 0..N-1 enumeration in doc_id order") {
    val out = QualityOps.defs("curate_global_index").run(spark, dir).collect()
    val n = out.length
    assert(n > 0)
    // Output arrives ordered by doc_id; gid must be exactly 0..N-1 in place.
    out.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(1) == i.toLong, s"doc ${r.get(0)} got gid ${r.get(1)}, expected $i")
    }
    val ids = out.map(_.getLong(0))
    assert(ids.sameElements(ids.sorted), "rows not in doc_id order")
  }

  test("native per-group top-k matches the window-function formulation") {
    val out = QualityOps.defs("q_topk_per_group_native").run(spark, dir)
    val viaWindow = {
      import org.apache.spark.sql.expressions.Window
      graft.Tables(spark, dir, "orders")
        .filter(col("o_custkey") <= 200)
        .withColumn("rank", row_number().over(
          Window.partitionBy("o_custkey")
            .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)).cast("long"))
        .filter(col("rank") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rank")
    }
    assert(out.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(out).isEmpty,
      "bounded-heap top-k disagrees with the window formulation")
  }
}
