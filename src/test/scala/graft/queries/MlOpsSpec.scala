package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MlOpsSpec extends SparkSpec {

  private val dir = sf("orders")

  test("knn labels: five votes per query, majority honored, brute-force agrees") {
    val out = MlOps.defs("ml_knn_label").run(spark, dir).collect()
    assert(out.length == 50)
    out.foreach { r =>
      assert(r.getLong(3) >= 1 && r.getLong(3) <= 5, "vote count out of range")
      assert(r.getLong(4) == (if (r.getLong(1) == r.getLong(2)) 1L else 0L))
    }
    // Brute-force the first three queries entirely on the driver.
    val all = graft.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("label").cast("long"),
        VectorOps.asDouble(col("embedding")))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2).toArray))
    def cos(a: Array[Double], b: Array[Double]) = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      (a.indices).foreach { i => d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      math.rint(d / (math.sqrt(na) * math.sqrt(nb)) * 1e6) / 1e6
    }
    val corpus = all.filter(_._1 >= 50)
    all.filter(_._1 < 3).foreach { case (qid, _, qv) =>
      val top5 = corpus.map(c => (-cos(qv, c._3), c._1, c._2)).sorted.take(5)
      val pred = top5.groupBy(_._3).toSeq.map { case (l, xs) => (-xs.length, l) }.min._2
      val got = out.find(_.getLong(0) == qid).get.getLong(2)
      assert(got == pred, s"query $qid: knn pred $got != brute-force $pred")
    }
  }

  test("logreg newton: the second step shrinks the gradient norm") {
    val r = MlOps.defs("ml_logreg_newton").run(spark, dir).head()
    val (b0, b1) = (r.getDouble(1), r.getDouble(2))
    val o = graft.Tables(spark, dir, "orders").select(
      (col("o_orderpriority") === "1-URGENT").cast("int").cast("double").as("y"),
      (col("o_totalprice") / 100000.0).as("x"))
    def gradNorm(bb0: Double, bb1: Double): Double = {
      val g = o.select(
        sum(col("y") - lit(1.0) / (lit(1.0) + exp(-(lit(bb0) + lit(bb1) * col("x")))))
          .as("g0"),
        sum((col("y") - lit(1.0) / (lit(1.0) + exp(-(lit(bb0) + lit(bb1) * col("x")))))
          * col("x")).as("g1")).head()
      math.hypot(g.getDouble(0), g.getDouble(1))
    }
    val at0 = gradNorm(0.0, 0.0)
    val atFit = gradNorm(b0, b1)
    assert(atFit < at0 * 0.2,
      s"gradient norm $atFit at the fit vs $at0 at zero — Newton did not descend")
  }
}
