package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Statistical aggregate surface: correlation, covariance, dispersion
  * and least-squares regression per group — one map-side-combinable
  * aggregation (all of these are single-pass moment sketches in both
  * engines, so they scale like SUM, not like a sort).
  *
  * skewness/kurtosis are deliberately absent from the oracle surface:
  * Spark computes population moments, DuckDB bias-corrected sample
  * moments — same inputs, different estimators, so a hash compare would
  * test the estimator choice rather than the engine.
  */
object StatsOps {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  val defs: Map[String, QDef] = Map(

    // Moment aggregates over lineitem: quantity vs price correlate by
    // construction, so corr/regr outputs are well-conditioned (not
    // near-zero denominators where rounding ties could flip).
    "q_stats_agg" -> QDef(
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            count(lit(1)).as("n"),
            round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("qty_price_corr"),
            round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("qty_price_covar"),
            round(covar_pop(col("l_quantity"), col("l_extendedprice")), 2).as("qty_price_covar_pop"),
            round(stddev_samp(col("l_extendedprice")), 2).as("price_sd"),
            round(var_pop(col("l_extendedprice")), 2).as("price_var_pop"),
            round(expr("regr_slope(l_extendedprice, l_quantity)"), 4).as("price_per_qty"),
            round(expr("regr_intercept(l_extendedprice, l_quantity)"), 2).as("price_at_zero"),
            round(expr("regr_r2(l_extendedprice, l_quantity)"), 4).as("fit_r2"))
          .orderBy("l_returnflag"),
      """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
        |  ROUND(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
        |  ROUND(covar_samp(l_quantity, l_extendedprice), 2) AS qty_price_covar,
        |  ROUND(covar_pop(l_quantity, l_extendedprice), 2) AS qty_price_covar_pop,
        |  ROUND(stddev_samp(l_extendedprice), 2) AS price_sd,
        |  ROUND(var_pop(l_extendedprice), 2) AS price_var_pop,
        |  ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS price_per_qty,
        |  ROUND(regr_intercept(l_extendedprice, l_quantity), 2) AS price_at_zero,
        |  ROUND(regr_r2(l_extendedprice, l_quantity), 4) AS fit_r2
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin)
  )
}
