package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Skew mitigation for heavy-hitter grouping keys: two-phase salted
  * aggregation. Phase 1 aggregates on (key, salt) — a skewed key's rows
  * spread over `salt` reducers; phase 2 combines the partials per key.
  * The result is identical to a direct groupBy (the oracle below is the
  * plain SQL aggregate), only the shuffle shape changes. Joins get the
  * same treatment for free from AQE's skew-join splitting; this is the
  * aggregation-side counterpart.
  */
object SkewOps {

  /** Salted sum/count over `keys`. `salt` ≈ number of reducers a single
    * hot key may fan out to.
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], valueCol: String, salt: Int = 16): DataFrame = {
    val keyCols: Seq[Column] = keys.map(col)
    // Salt must be deterministic under task re-execution: if a lost map
    // stage recomputes, every row must land in the same salted partition
    // or partial aggregates double/under-count. Hash row content, not
    // monotonically_increasing_id().
    val contentSalt = pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(salt.toLong))
    df.withColumn("__salt", contentSalt)
      .groupBy((keyCols :+ col("__salt")): _*)
      .agg(sum(valueCol).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(keyCols: _*)
      .agg(sum("__psum").as("sum_value"), sum("__pcnt").as("cnt"))
  }

  /** Salted equi-join for a skewed big-side key: the big side gets a
    * content-hash salt, the small side is replicated once per salt value,
    * and the join runs on (key, salt) — a single hot key spreads over
    * `salt` reducers instead of one. Use when AQE's skew splitting can't
    * apply (pre-aggregated exchanges, custom partitioners); result is
    * identical to the unsalted join.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int = 16): DataFrame = {
    val saltedBig = big.withColumn(
      "__salt", pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(salt.toLong)))
    val replicated = small.withColumn(
      "__salt", explode(sequence(lit(0L), lit(salt.toLong - 1L))))
    saltedBig.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  val defs: Map[String, QDef] = Map(
    // Salted join returns exactly what the direct join returns — verified
    // against the plain SQL join aggregate.
    "q_salted_join" -> QDef(
      (s: SparkSession, dir: String) => {
        val li = Tables(s, dir, "lineitem").select(
          col("l_orderkey"), col("l_quantity"))
        val ord = Tables(s, dir, "orders").select(
          col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
        // salt=8: replication factor is a cost knob — size it to the
        // worst key's share of a reducer, not higher.
        saltedJoin(li, ord, "l_orderkey", salt = 8)
          .groupBy("o_orderpriority")
          .agg(round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("cnt"))
          .orderBy("o_orderpriority")
      },
      """SELECT o_orderpriority, ROUND(SUM(l_quantity), 2) AS sum_qty, COUNT(*) AS cnt
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // Salted aggregation returns exactly what the direct aggregate returns
    // — verified against the plain SQL GROUP BY.
    "q_salted_agg" -> QDef(
      (s: SparkSession, dir: String) =>
        saltedAgg(Tables(s, dir, "lineitem"), Seq("l_returnflag"), "l_quantity")
          .select(
            col("l_returnflag"),
            round(col("sum_value"), 2).as("sum_qty"),
            col("cnt"))
          .orderBy("l_returnflag"),
      """SELECT l_returnflag, ROUND(SUM(l_quantity), 2) AS sum_qty, COUNT(*) AS cnt
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)
  )
}
