package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class SeriesBasketSpec extends SparkSpec {

  private val dir = sf("orders")

  test("globalRowNumber equals the single-window ROW_NUMBER formulation") {
    val cust = graft.Tables(spark, dir, "orders")
      .groupBy("o_custkey")
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("mon"))
    val viaBuckets = Buckets.globalRowNumber(cust, col("mon"), col("o_custkey"))
      .select("o_custkey", "i")
    val viaWindow = cust
      .withColumn("i", row_number().over(Window.orderBy("mon", "o_custkey")))
      .select("o_custkey", "i")
    assert(viaBuckets.except(viaWindow).isEmpty && viaWindow.except(viaBuckets).isEmpty,
      "bucket-offset global row number diverged from ROW_NUMBER()")
  }

  test("max drawdown is a real non-negative peak-to-trough gap") {
    val r = SeriesOps.defs("ev_max_drawdown").run(spark, dir).collect()
    assert(r.length == 1)
    assert(r(0).getDouble(1) >= 0.0)
  }

  test("cusum change point lands inside the series and is positive") {
    val r = SeriesOps.defs("ev_cusum_changepoint").run(spark, dir).collect()
    assert(r.length == 1)
    assert(r(0).getDouble(1) > 0.0, "flat series would mean the statistic degenerated")
  }

  test("streak runs are consistent: longest <= active_days, islands partition days") {
    val rows = SeriesOps.defs("ev_streaks").run(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (longest, nStreaks, active) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(longest >= 1 && longest <= active)
      assert(nStreaks >= 1 && nStreaks <= active)
    }
  }

  test("seasonality indices average to 1 weighted by day counts") {
    val rows = SeriesOps.defs("ev_seasonality").run(spark, dir).collect()
    assert(rows.length == 7)
    // Σ n_days·idx·(total/nd) = total ⇒ Σ n_days·idx ≈ nd (idx rounded to 6dp,
    // so the weighted mean reconstructs 1 within rounding).
    val nd = rows.map(_.getLong(1)).sum.toDouble
    val weighted = rows.map(r => r.getLong(1) * r.getDouble(2)).sum
    assert(math.abs(weighted / nd - 1.0) < 1e-3, s"weighted mean ${weighted / nd}")
  }

  test("rfm segments cover every customer exactly once with scores in 1..5") {
    val rows = BasketOps.defs("q_rfm_segments").run(spark, dir).collect()
    val covered = rows.map(_.getLong(3)).sum
    val nCust = graft.Tables(spark, dir, "orders")
      .select(countDistinct("o_custkey")).head().getLong(0)
    assert(covered == nCust, s"segments cover $covered of $nCust customers")
    rows.foreach { r =>
      Seq(r.getInt(0), r.getInt(1), r.getInt(2)).foreach(sc => assert(sc >= 1 && sc <= 5))
    }
  }

  test("association rules are ordered pairs with positive lift and bounded confidence") {
    val rows = BasketOps.defs("q_assoc_rules").run(spark, dir).collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "pair not in canonical a < b order")
      assert(r.getLong(2) >= 3, "below min support")
      assert(r.getDouble(3) > 0.0)
      val conf = r.getDouble(4)
      assert(conf > 0.0 && conf <= 1.0)
    }
  }

  test("woe bins partition all orders; woe finite") {
    val rows = BasketOps.defs("q_woe_binning").run(spark, dir).collect()
    val n = rows.map(r => r.getLong(1) + r.getLong(2)).sum
    val total = graft.Tables(spark, dir, "orders").count()
    assert(n == total, s"bins cover $n of $total orders")
    rows.foreach(r => assert(!r.getDouble(3).isNaN && !r.getDouble(3).isInfinite))
  }
}
