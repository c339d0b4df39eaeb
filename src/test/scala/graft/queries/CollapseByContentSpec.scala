package graft.queries

import org.apache.spark.graftbridge.ShuffleAccounting
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the r15 content-collapse rewrite (TextOps.collapseByContent —
  * group-by with a leading 8-byte xxhash64, replacing a window
  * partitioned by the raw hashed-shingle array):
  *   1. output is EXACTLY the windowed formulation's, both variants;
  *   2. the exchange ships partially-aggregated groups, so shuffle
  *      records/bytes scale with DISTINCT contents × input partitions,
  *      never corpus rows — the r14 verdict's "kilobytes of key
  *      material per row" hazard on long documents;
  *   3. the plan has exactly one exchange (partial → exchange → final).
  */
class CollapseByContentSpec extends SparkSpec {

  /** Hot-cluster long-document fixture: `copies` verbatim copies of each
    * of `distinct` contents, each content a `width`-element long array —
    * the shape where the old window shipped kilobytes per ROW.
    */
  private def fixture(distinct: Int, copies: Int, width: Int, withLang: Boolean): DataFrame = {
    import spark.implicits._
    val rows = for {
      c <- 0 until distinct
      k <- 0 until copies
    } yield (c.toLong * copies + k, s"l${c % 3}",
      (0 until width).map(i => c.toLong * 1000003L + i * 7L).toArray)
    val df = spark.sparkContext.parallelize(rows, 4)
      .toDF("doc_id", "lang", "hs")
    if (withLang) df.withColumn("nsh", size(col("hs"))) else df.select("doc_id", "hs")
  }

  private def windowedReference(d: DataFrame, langBlocked: Boolean): (DataFrame, DataFrame) = {
    val parts = if (langBlocked) Seq(col("lang"), col("hs")) else Seq(col("hs"))
    val withRep = d.withColumn("rep", min("doc_id").over(Window.partitionBy(parts: _*)))
    (withRep.filter(col("doc_id") === col("rep")).drop("rep"),
      withRep.select(col("rep"), col("doc_id")))
  }

  private def canon(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq.map {
      case a: scala.collection.Seq[_] => a.toVector
      case v => v
    }).toSet

  test("collapse output is bit-identical to the windowed formulation (unblocked)") {
    val d = fixture(distinct = 8, copies = 25, width = 40, withLang = false)
    val (reps, members) = TextOps.collapseByContent(d, langBlocked = false)
    val (wReps, wMembers) = windowedReference(d, langBlocked = false)
    assert(canon(reps.select("doc_id", "hs")) == canon(wReps.select("doc_id", "hs")))
    assert(canon(members) == canon(wMembers))
  }

  test("collapse output is bit-identical to the windowed formulation (lang-blocked, extra cols)") {
    val d = fixture(distinct = 9, copies = 20, width = 30, withLang = true)
    val (reps, members) = TextOps.collapseByContent(d, langBlocked = true)
    val (wReps, wMembers) = windowedReference(d, langBlocked = true)
    assert(canon(reps.select("doc_id", "lang", "hs", "nsh")) ==
      canon(wReps.select("doc_id", "lang", "hs", "nsh")))
    assert(canon(members) == canon(wMembers))
  }

  test("exchange carries distinct contents, not corpus rows, on a hot long-document cluster") {
    // 400 rows, 8 distinct 500-long contents (~4 KB of array per row),
    // spread over 4 input partitions.
    val d = fixture(distinct = 8, copies = 50, width = 500, withLang = false)
    val acct = new ShuffleAccounting
    spark.sparkContext.addSparkListener(acct)
    try {
      val (cBytes, cRecs) = acct.measure(spark.sparkContext) {
        val (reps, members) = TextOps.collapseByContent(d, langBlocked = false)
        reps.count(); members.count()
      }
      val (wBytes, wRecs) = acct.measure(spark.sparkContext) {
        val (reps, members) = windowedReference(d, langBlocked = false)
        reps.count(); members.count()
      }
      // Partial aggregation bound: ≤ distinct × partitions group rows
      // cross the wire (8 × 4 = 32) vs the window's 400 full rows.
      assert(cRecs <= 64, s"collapse shuffled $cRecs records; expected ≤ distinct×parts")
      assert(wRecs >= 400, s"windowed reference shuffled $wRecs; fixture broken?")
      assert(cBytes * 3 < wBytes,
        s"collapse shuffled $cBytes bytes vs windowed $wBytes — map-side combine lost")
    } finally spark.sparkContext.removeSparkListener(acct)
  }

  test("plan: one exchange, aggregation-shaped (no window sort over array keys)") {
    val d = fixture(distinct = 4, copies = 10, width = 20, withLang = false)
    val (_, members) = TextOps.collapseByContent(d, langBlocked = false)
    val plan = members.queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 == 1, s"expected exactly 1 exchange:\n$plan")
    assert(!plan.contains("Window"), s"window survived the rewrite:\n$plan")
  }
}
