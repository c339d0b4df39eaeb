package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

class Analytics6Spec extends SparkSpec {

  private val dir = sf("orders")

  test("funnel paths: counts total to (events - 2·users-with-3+) and paths are trigrams") {
    val rows = Analytics6.defs("ev_funnel_paths").run(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getString(0).split(">").length == 3))
    val counts = rows.map(_.getLong(1))
    assert(counts.sorted.reverse.sameElements(counts), "not sorted by count desc")
  }

  test("ab test: rates pool correctly and z has the sign of the rate gap") {
    val rows = Analytics6.defs("q_ab_test").run(spark, dir).collect()
    assert(rows.length >= 2)
    val (ns, ks) = (rows.map(_.getLong(1)).sum, rows.map(_.getLong(2)).sum)
    val pooled = ks.toDouble / ns
    rows.foreach { r =>
      val (n, k, z) = (r.getLong(1), r.getLong(2), r.getDouble(4))
      val rest = (ks - k).toDouble / (ns - n)
      assert(math.signum(z) == math.signum(k.toDouble / n - rest) || z == 0.0)
      assert(k <= n)
    }
    assert(pooled > 0.0 && pooled < 1.0)
  }

  test("winsorized mean is between the clamp bounds and at most the raw spread") {
    val r = Analytics6.defs("curate_winsorize").run(spark, dir).head()
    val (p5, p95, wm, rm) = (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(p5 < p95)
    assert(wm >= p5 && wm <= p95, s"winsorized mean $wm outside [$p5, $p95]")
    // Clamping pulls tail mass inward: the winsorized mean moves toward
    // the center relative to the raw mean's distance from the bounds.
    assert(math.abs(wm - rm) < (p95 - p5), "winsorization moved the mean implausibly")
  }

  test("mom growth: reconstructing revenue from growth factors matches") {
    val rows = Analytics6.defs("q_mom_growth").run(spark, dir).collect()
    assert(rows.length >= 12)
    assert(rows.head.isNullAt(2), "first month must have NULL growth")
    rows.sliding(2).foreach {
      case Array(a, b) =>
        val rebuilt = a.getDouble(1) * (1.0 + b.getDouble(2))
        assert(math.abs(rebuilt - b.getDouble(1)) < b.getDouble(1).abs * 1e-4 + 1.0,
          s"month ${b.getString(0)}: ${b.getDouble(1)} vs rebuilt $rebuilt")
      case _ =>
    }
  }

  test("rake: phrases contain no stopwords and scores are positive") {
    val rows = TextOps3.defs("text_rake_keyphrases").run(spark, dir).collect()
    assert(rows.nonEmpty)
    val stop = Set("the", "a", "of", "to", "and")
    rows.foreach { r =>
      val words = r.getString(0).split(" ")
      assert(words.forall(w => !stop.contains(w)), s"stopword inside '${r.getString(0)}'")
      assert(r.getDouble(2) > 0.0)
      // RAKE's score of a phrase is at least its length (deg/freq ≥ 1
      // per member word).
      assert(r.getDouble(2) >= words.length - 1e-9)
    }
  }
}
