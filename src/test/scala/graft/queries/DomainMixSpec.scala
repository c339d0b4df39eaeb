package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** DoReMi-style domain reweighting contracts: the excess loss is a KL
  * divergence (non-negative, zero iff the domain distribution equals
  * the global), weights form a smoothed distribution, and higher excess
  * never gets a lower weight.
  */
class DomainMixSpec extends SparkSpec {

  private def run(dir: String) =
    DomainMixOps.defs("curate_doremi").run(spark, dir).collect()

  test("weights sum to 1 and excess is non-negative (KL >= 0)") {
    val rows = run("/root/testdata/sf0.001")
    val wsum = rows.map(_.getDouble(3)).sum
    assert(math.abs(wsum - 1.0) < 1e-5, s"weights sum to $wsum")
    rows.foreach { r =>
      assert(r.getDouble(2) >= -1e-9,
        s"domain ${r.getString(0)} has negative excess ${r.getDouble(2)}")
    }
  }

  test("identical domain distributions get zero excess and uniform weights") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a a b c", "en"), (1L, "a a b c", "de"),
      (2L, "c b a a", "en"), (3L, "b a c a", "de"))
      .toDF("doc_id", "text", "lang")
    val dir = Files.createTempDirectory("doremi").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = run(dir)
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getDouble(2) == 0.0, s"excess ${r.getDouble(2)}")
      assert(math.abs(r.getDouble(3) - 0.5) < 1e-9, s"weight ${r.getDouble(3)}")
    }
  }

  test("rho-loss: disjoint-vocabulary domains get the exact closed-form excess") {
    import spark.implicits._
    // en and de vocabularies are disjoint, so c_d(w) == c_g(w) for every
    // token and per-doc excess reduces to ln(Tg/Td) exactly — for EVERY
    // doc of the domain, matching the domain-level DoReMi constant.
    val docs = Seq(
      (0L, "aa bb cc", "en"), (1L, "aa bb", "en"),
      (2L, "xx yy", "de"))
      .map { case (id, t, l) => (id, t, l, "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = Files.createTempDirectory("rho").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = DomainMixOps.defs("curate_rho_loss").run(spark, dir).collect()
    val tg = 7.0
    val expect = Map("en" -> math.log(tg / 5.0), "de" -> math.log(tg / 2.0))
    rows.foreach { r =>
      val want = BigDecimal(expect(r.getString(1)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(3) == want,
        s"doc ${r.getLong(0)}: ${r.getDouble(3)} != $want")
    }
    // de is the smaller domain -> larger ln(Tg/Td) -> ranks first.
    assert(rows.head.getString(1) == "de")
    assert(rows.length == 3)
  }

  test("weight is monotone in excess loss") {
    val rows = run("/root/testdata/sf0.001")
      .map(r => (r.getDouble(2), r.getDouble(3))).sortBy(_._1)
    rows.sliding(2).foreach {
      case Array((e1, w1), (e2, w2)) =>
        assert(w1 <= w2 + 1e-9, s"excess $e1<$e2 but weight $w1>$w2")
      case _ =>
    }
  }
}
