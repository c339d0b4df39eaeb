package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact-DECIMAL money arithmetic for the TPC-H revenue family — the
  * q_tpch_q9 recipe promoted to a shared helper after the r9 sf1 sweep
  * flipped 1-cent rounding ties in the double formulations of q_tpch_q5
  * and q_star_join (a double SUM's value depends on partitioning order;
  * at 10× rows two engines landed on opposite sides of a .xx5
  * boundary). TPC-H money is DECIMAL by spec: per-row terms cast to
  * tight decimals multiply exactly, the sums are order-independent at
  * any corpus size and partitioning, and ROUND of an exact decimal is
  * half-away-from-zero on both engines. The paired SQL fragments keep
  * the oracle formulation character-identical in every call site.
  */
object Money {

  val one: Column = lit(BigDecimal("1.00"))

  def dec(c: String): Column = col(c).cast("decimal(12,2)")

  /** l_extendedprice × (1 − l_discount), exact. */
  def revenue: Column = dec("l_extendedprice") * (one - dec("l_discount"))

  /** SUM(revenue) rounded to cents, as the DOUBLE output column. */
  def revenueSum2: Column = round(sum(revenue), 2).cast("double")

  val revenueSql: String =
    "CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST('1.00' AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(12,2)))"

  val revenueSumSql2: String = s"CAST(ROUND(SUM($revenueSql), 2) AS DOUBLE)"
}
