package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Modified-KN probability axioms on the real sf0.001 corpus: every
  * scored trigram probability is a genuine probability (the clamped
  * discounts + strictly-positive back-off floor guarantee it — see
  * KnModifiedOps object doc), and per history the observed-continuation
  * mass never exceeds 1 (the unobserved tail holds the rest, so a sum
  * over OBSERVED w3 strictly below 1 is the correct invariant, and a
  * sum above 1 would prove the discounting is broken).
  */
class KnModifiedSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("every scored trigram probability lies in (0, 1)") {
    val sc = KnModifiedOps.scored(spark, dir, docLimit = 1000000).cache()
    assert(sc.count() > 0)
    val bad = sc.filter(col("p3") <= 0.0 || col("p3") >= 1.0 ||
      isnan(col("p3"))).count()
    assert(bad == 0, s"$bad scored rows outside (0,1)")
  }

  test("observed-continuation mass per history stays at or below 1") {
    // Sum DISTINCT trigram probabilities per (w1,w2): the scored frame
    // repeats a trigram once per token occurrence, so dedupe first.
    val perHist = KnModifiedOps.scored(spark, dir, docLimit = 1000000)
      .select("w1", "w2", "w3", "p3").distinct()
      .groupBy("w1", "w2").agg(sum("p3").as("mass"), count(lit(1)).as("nc"))
    val over = perHist.filter(col("mass") > 1.0 + 1e-9).count()
    assert(over == 0, s"$over histories with observed mass > 1")
    // And the mass is non-trivial (discounts didn't collapse it to ~0):
    val mx = perHist.agg(max("mass")).collect()(0).getDouble(0)
    assert(mx > 0.5, s"max observed-continuation mass $mx suspiciously low")
  }

  test("every scored quadgram probability lies in (0, 1); observed mass per history at or below 1") {
    val sc = KnModifiedOps.scoredQuad(spark, dir, docLimit = 1000000).cache()
    assert(sc.count() > 0)
    val bad = sc.filter(col("p4") <= 0.0 || col("p4") >= 1.0 ||
      isnan(col("p4"))).count()
    assert(bad == 0, s"$bad scored quadgram rows outside (0,1)")
    val perHist = sc.select("w1", "w2", "w3", "w4", "p4").distinct()
      .groupBy("w1", "w2", "w3").agg(sum("p4").as("mass"))
    val over = perHist.filter(col("mass") > 1.0 + 1e-9).count()
    assert(over == 0, s"$over quadgram histories with observed mass > 1")
  }

  test("quadgram surprisal tracks the trigram modified-KN ordering") {
    val q4 = KnModifiedOps.defs("text_kn_quadgram").run(spark, dir)
      .select(col("doc_id"), col("mean_mkn4_surprisal").as("a"))
    val q3 = KnModifiedOps.defs("text_kn_modified").run(spark, dir)
      .select(col("doc_id"), col("mean_mkn_surprisal").as("b"))
    val c = q4.join(q3, "doc_id")
      .agg(org.apache.spark.sql.functions.corr(col("a"), col("b")))
      .collect()(0).getDouble(0)
    assert(c > 0.7, s"quadgram vs trigram modified-KN correlation $c")
  }

  test("modified surprisal tracks the single-discount KN ordering") {
    // Not equality — different smoothing — but the two scores over the
    // same corpus must agree on gross document ordering (rank
    // correlation of per-doc means well above zero).
    val mod = KnModifiedOps.defs("text_kn_modified").run(spark, dir)
      .select(col("doc_id"), col("mean_mkn_surprisal").as("a"))
    val kn3 = TextOps2.defs("text_kn_trigram").run(spark, dir)
      .select(col("doc_id"), col("mean_kn3_surprisal").as("b"))
    val c = mod.join(kn3, "doc_id")
      .agg(org.apache.spark.sql.functions.corr(col("a"), col("b")))
      .collect()(0).getDouble(0)
    assert(c > 0.8, s"modified vs single-discount correlation $c")
  }
}
