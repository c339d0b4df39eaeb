package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** The remaining TPC-H query patterns (Q2, Q9, Q11, Q16, Q17, Q20, Q21,
  * Q22), completing the full 22-query suite together with TpchOps /
  * Relational / Relational3 / Relational4 / Analytics3.
  *
  * The driver's synthetic schema has no `partsupp` table and no
  * l_commitdate/l_receiptdate/c_phone/s_comment columns, so each query
  * keeps the REFERENCE PATTERN (correlated min subquery, nested HAVING
  * subquery, NOT IN exclusion, EXISTS/NOT-EXISTS pair, anti-join +
  * scalar-subquery) while adapting the predicates to columns that exist:
  * - partsupp is derived from the distinct (l_partkey, l_suppkey) pairs
  *   observed in lineitem; its supply cost is MIN over per-row rounded
  *   unit prices — a min of deterministic per-row doubles is
  *   order-independent, so Spark and DuckDB agree bit-for-bit (unlike a
  *   float SUM, which is shuffle-order-sensitive).
  * - l_quantity is integral in the synthetic data, so quantity SUM/AVG
  *   are exact in doubles (< 2^53) and cross-engine deterministic;
  *   thresholds on quantity aggregates use .5 offsets to sit between
  *   lattice points.
  *
  * Scale notes (100 TB): every dimension side (part/supplier/nation/
  * region and derived filtered subsets) is broadcast; the only big-big
  * shuffles are lineitem⋈orders on the natural orderkey (bucketable) and
  * the per-key aggregations, which all have map-side partial aggregation.
  * No correlated per-row subquery survives into the physical plan — each
  * is re-expressed as a window over the grouping key or a broadcast
  * scalar, so nothing degenerates to a nested loop.
  */
object TpchOps2 {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  /** Suppliers in one region with their nation name (dim ⋈ dim ⋈ dim —
    * tiny, always broadcast at the use site).
    */
  private def regionSuppliers(s: SparkSession, dir: String, region: String): DataFrame =
    t(s, dir, "supplier")
      .join(
        broadcast(t(s, dir, "nation")
          .join(
            broadcast(t(s, dir, "region").filter(col("r_name") === region)),
            col("n_regionkey") === col("r_regionkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name", "s_acctbal", "n_name")

  val defs: Map[String, QDef] = Map(

    // TPC-H Q2 minimum-cost supplier: for each qualifying part, the
    // EUROPE supplier(s) offering the minimum derived supply cost.
    // Reference pattern: correlated MIN subquery per part — realized in
    // Spark as a window MIN over the part key (one shuffle, no
    // per-row subquery execution).
    "q_tpch_q2" -> QDef(
      (s, dir) => {
        val partKeys = t(s, dir, "part")
          .filter(col("p_size").isin(5, 15, 25, 35, 45) && col("p_type") === "LARGE")
          .select("p_partkey")
        // Derived part-supplier catalog, pruned by the part filter
        // BEFORE the groupBy so the aggregate only shuffles matching
        // lineitems. MIN over per-row rounded unit prices is
        // order-independent -> deterministic across engines.
        val ps = t(s, dir, "lineitem")
          .join(broadcast(partKeys), col("l_partkey") === col("p_partkey"))
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(min(round(col("l_extendedprice") / col("l_quantity"), 2)).as("ps_cost"))
        val minW = Window.partitionBy("l_partkey")
        ps.join(broadcast(regionSuppliers(s, dir, "EUROPE")),
            col("l_suppkey") === col("s_suppkey"))
          .withColumn("min_cost", min("ps_cost").over(minW))
          .filter(col("ps_cost") === col("min_cost"))
          .select(
            col("s_acctbal"), col("s_name"), col("n_name"),
            col("l_partkey").as("p_partkey"), col("ps_cost"))
          .orderBy(col("p_partkey"), col("s_name"))
      },
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey,
        |    MIN(ROUND(l_extendedprice / l_quantity, 2)) AS ps_cost
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_size IN (5, 15, 25, 35, 45) AND p_type = 'LARGE'
        |  GROUP BY 1, 2),
        |es AS (
        |  SELECT s_suppkey, s_name, s_acctbal, n_name
        |  FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE')
        |SELECT s_acctbal, s_name, n_name, l_partkey AS p_partkey, ps_cost
        |FROM ps JOIN es ON l_suppkey = s_suppkey
        |WHERE ps_cost = (
        |  SELECT MIN(ps2.ps_cost)
        |  FROM ps ps2 JOIN es es2 ON ps2.l_suppkey = es2.s_suppkey
        |  WHERE ps2.l_partkey = ps.l_partkey)
        |ORDER BY p_partkey, s_name""".stripMargin),

    // TPC-H Q9 product-type profit: profit by supplier nation and order
    // year for one part family. Supply cost is a deterministic function
    // of the part (0.6 * retail price), standing in for ps_supplycost.
    "q_tpch_q9" -> QDef(
      (s, dir) => {
        val parts = t(s, dir, "part")
          .filter(col("p_name").like("%bolt%"))
          .select("p_partkey", "p_retailprice")
        val supp = t(s, dir, "supplier")
          .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
          .select("s_suppkey", "n_name")
        // Exact DECIMAL profit terms: the double formulation rounded a
        // 1-cent tie differently per engine at sf0.001 (a .xx5-boundary
        // sum). Tight casts keep the product precision at (28,5);
        // sums stay exact at any corpus size, and ROUND of an exact
        // decimal is half-away-from-zero on both engines.
        val profit =
          col("l_extendedprice").cast("decimal(12,2)") *
            (lit(BigDecimal("1.00")) - col("l_discount").cast("decimal(12,2)")) -
            lit(BigDecimal("0.6")) * col("p_retailprice").cast("decimal(12,2)") *
              col("l_quantity").cast("decimal(12,2)")
        t(s, dir, "lineitem")
          .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
          .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
          // the one big-big shuffle: lineitem ⋈ orders on orderkey
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
          .agg(round(sum(profit), 2).cast("double").as("sum_profit"))
          .orderBy(col("nation"), col("o_year").desc)
      },
      """SELECT n_name AS nation,
        |  CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |              * (CAST('1.00' AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(12,2)))
        |            - CAST('0.6' AS DECIMAL(2,1)) * CAST(p_retailprice AS DECIMAL(12,2))
        |              * CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_name LIKE '%bolt%'
        |GROUP BY 1, 2
        |ORDER BY nation, o_year DESC""".stripMargin),

    // TPC-H Q11 important stock: parts whose ASIA-supplied value exceeds
    // a fraction of the total. Reference pattern: GROUP BY ... HAVING >
    // scalar subquery over the same aggregate. The grouped frame is
    // cached so the per-part values and the grand total come from ONE
    // evaluation (float SUM is order-sensitive; two evaluations could
    // disagree in ULPs near the threshold).
    "q_tpch_q11" -> QDef(
      (s, dir) => {
        val asiaSupp = regionSuppliers(s, dir, "ASIA").select("s_suppkey")
        val perPart = t(s, dir, "lineitem")
          .join(broadcast(asiaSupp), col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("l_partkey"))
          // Exact DECIMAL values ([[Money]], r9/r10): the threshold
          // compare is value×1000 > tot, IDENTICALLY on both engines and
          // entirely in bounded decimals — value recast to decimal(32,4)
          // so the ×1000 product (decimal(37,4) here, decimal(36,4) in
          // DuckDB) never exceeds precision 38 on either engine. The r9
          // tot×0.001 form overflowed: Spark rounded the product's scale
          // under allowPrecisionLoss while DuckDB fell back to DOUBLE, so
          // the two thresholds could disagree within ~1e-6 of the cutoff.
          .agg(sum(Money.revenue).as("value"))
          .cache()
        val total = perPart.agg(sum("value").as("tot"))
        val out = perPart.join(broadcast(total))
          .filter(col("value").cast("decimal(32,4)") * lit(1000).cast("decimal(4,0)") > col("tot"))
          .select(col("l_partkey").as("p_partkey"),
            round(col("value"), 2).cast("double").as("part_value"))
          .orderBy("p_partkey")
          // Pin the single evaluation, then release the cache: the suite
          // runs 130 queries in one JVM, and a left-behind cache leaks
          // storage-pool pages into every later query.
          .localCheckpoint()
        perPart.unpersist()
        out
      },
      s"""WITH perpart AS (
        |  SELECT l_partkey, SUM(${Money.revenueSql}) AS value
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'ASIA'
        |  GROUP BY 1)
        |SELECT l_partkey AS p_partkey, CAST(ROUND(value, 2) AS DOUBLE) AS part_value
        |FROM perpart
        |WHERE CAST(value AS DECIMAL(32,4)) * CAST(1000 AS DECIMAL(4,0))
        |  > (SELECT SUM(value) FROM perpart)
        |ORDER BY p_partkey""".stripMargin),

    // TPC-H Q16 parts/supplier relationship: distinct supplier count per
    // part descriptor, excluding suppliers on a denylist (negative
    // account balance stands in for the complaints filter). Reference
    // pattern: NOT IN subquery — realized as a broadcast anti-join.
    "q_tpch_q16" -> QDef(
      (s, dir) => {
        val parts = t(s, dir, "part")
          .filter(
            col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
              col("p_size").isin(1, 14, 23, 45, 19, 3, 36, 9))
          .select("p_partkey", "p_brand", "p_type", "p_size")
        val denied = t(s, dir, "supplier")
          .filter(col("s_acctbal") < 0).select("s_suppkey")
        t(s, dir, "lineitem")
          .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
          .join(broadcast(denied), col("l_suppkey") === col("s_suppkey"), "left_anti")
          .groupBy("p_brand", "p_type", "p_size")
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
          .orderBy("p_brand", "p_type", "p_size")
      },
      """SELECT p_brand, p_type, p_size,
        |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 14, 23, 45, 19, 3, 36, 9)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY p_brand, p_type, p_size""".stripMargin),

    // TPC-H Q17 small-quantity-order revenue: lines whose quantity is
    // below half the part's average. Reference pattern: correlated AVG
    // subquery per part — realized as a window AVG over the part key.
    // l_quantity is integral, so the AVG is exact and both engines pick
    // the identical line set.
    "q_tpch_q17" -> QDef(
      (s, dir) => {
        val partKeys = t(s, dir, "part")
          .filter(col("p_brand") === "Brand#23" && col("p_type") === "MEDIUM")
          .select("p_partkey")
        val avgW = Window.partitionBy("l_partkey")
        t(s, dir, "lineitem")
          .join(broadcast(partKeys), col("l_partkey") === col("p_partkey"))
          .withColumn("avg_qty", avg("l_quantity").over(avgW))
          .filter(col("l_quantity") < col("avg_qty") * 0.5)
          .agg(round(sum("l_extendedprice") / 7.0, 2).as("avg_yearly"))
      },
      """SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand = 'Brand#23' AND p_type = 'MEDIUM'
        |  AND l_quantity < (
        |    SELECT AVG(l2.l_quantity) * 0.5 FROM lineitem l2
        |    WHERE l2.l_partkey = p_partkey)""".stripMargin),

    // TPC-H Q20 promotion candidates: AMERICA suppliers who moved a
    // significant quantity of a part family in 1996. Reference pattern:
    // nested IN subqueries (parts by name -> qualifying part-supplier
    // pairs -> suppliers) — realized as broadcast semi-joins over a
    // partial-aggregated quantity sum. Threshold 45.5 sits between the
    // integral quantity-sum lattice points.
    "q_tpch_q20" -> QDef(
      (s, dir) => {
        val redParts = t(s, dir, "part")
          .filter(col("p_name").like("red%")).select("p_partkey")
        val qualified = t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01")
          .join(broadcast(redParts), col("l_partkey") === col("p_partkey"))
          .groupBy("l_suppkey", "l_partkey")
          .agg(sum("l_quantity").as("qty"))
          .filter(col("qty") > 45.5)
          .select("l_suppkey")
        regionSuppliers(s, dir, "AMERICA")
          .join(qualified, col("s_suppkey") === col("l_suppkey"), "left_semi")
          .select("s_suppkey", "s_name")
          .orderBy("s_suppkey")
      },
      """SELECT s_suppkey, s_name
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'AMERICA'
        |  AND s_suppkey IN (
        |    SELECT l_suppkey FROM lineitem
        |    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
        |      AND l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
        |    GROUP BY l_suppkey, l_partkey
        |    HAVING SUM(l_quantity) > 45.5)
        |ORDER BY s_suppkey""".stripMargin),

    // TPC-H Q21 suppliers who kept orders waiting: the sole supplier
    // with returned ('R') lines in a finished multi-supplier order.
    // The oracle keeps the classic EXISTS / NOT-EXISTS pair; the Spark
    // plan re-expresses it as ONE aggregation over orderkey (distinct
    // supplier counts + the lone R-supplier) — no self-join explosion,
    // no correlated subquery, one shuffle on the natural key.
    "q_tpch_q21" -> QDef(
      (s, dir) => {
        val isR = col("l_returnflag") === "R"
        // Two-stage exact aggregation instead of a double COUNT DISTINCT:
        // countDistinct×2 would plan an Expand (3 row copies through the
        // shuffle); aggregating per (order, supplier) first then per
        // order moves each row through a shuffle once.
        val perPair = t(s, dir, "lineitem")
          .groupBy("l_orderkey", "l_suppkey")
          .agg(
            max(when(isR, lit(1)).otherwise(lit(0))).as("has_r"),
            sum(when(isR, lit(1L)).otherwise(lit(0L))).as("pair_r_lines"))
        val perOrder = perPair
          .groupBy("l_orderkey")
          .agg(
            count(lit(1)).as("nsupp"),
            sum("has_r").as("nrsupp"),
            max(when(col("has_r") === 1, col("l_suppkey"))).as("r_supp"),
            sum("pair_r_lines").as("r_lines"))
          .filter(col("nsupp") > 1 && col("nrsupp") === 1)
        val finished = t(s, dir, "orders")
          .filter(col("o_orderstatus") === "F").select("o_orderkey")
        perOrder
          .join(finished, col("l_orderkey") === col("o_orderkey"))
          .groupBy("r_supp")
          .agg(sum("r_lines").as("numwait"))
          .join(broadcast(t(s, dir, "supplier")), col("r_supp") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"), col("numwait"))
          .orderBy(col("numwait").desc, col("s_suppkey"))
      },
      """SELECT s_suppkey, s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        |FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey AND l1.l_returnflag = 'R'
        |JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
        |WHERE EXISTS (
        |    SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_returnflag = 'R')
        |GROUP BY 1, 2
        |ORDER BY numwait DESC, s_suppkey""".stripMargin),

    // TPC-H Q22 global sales opportunity: well-funded customers in
    // selected country codes with no recent orders. The last two digits
    // of c_name stand in for the phone country code. Reference pattern:
    // scalar AVG subquery + NOT EXISTS — realized as a broadcast scalar
    // join + a left-anti join against recent orders.
    "q_tpch_q22" -> QDef(
      (s, dir) => {
        val codes = Seq("13", "31", "23", "29", "30", "18", "17",
          "03", "43", "53", "63", "73", "83", "93")
        val cust = t(s, dir, "customer")
          .withColumn("cntrycode", substring(col("c_name"), -2, 2))
          .filter(col("cntrycode").isin(codes: _*))
        val avgBal = cust.filter(col("c_acctbal") > 0.0).agg(avg("c_acctbal").as("ab"))
        val recent = t(s, dir, "orders")
          .filter(col("o_orderdate") >= "2001-01-01").select("o_custkey")
        cust
          .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
          .join(broadcast(avgBal))
          .filter(col("c_acctbal") > col("ab"))
          .groupBy("cntrycode")
          .agg(count(lit(1)).as("numcust"), round(sum("c_acctbal"), 2).as("totacctbal"))
          .orderBy("cntrycode")
      },
      """WITH cust AS (
        |  SELECT c_custkey, c_acctbal,
        |    substr(c_name, length(c_name) - 1, 2) AS cntrycode
        |  FROM customer
        |  WHERE substr(c_name, length(c_name) - 1, 2)
        |    IN ('13', '31', '23', '29', '30', '18', '17',
        |        '03', '43', '53', '63', '73', '83', '93'))
        |SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
        |  ROUND(SUM(c_acctbal), 2) AS totacctbal
        |FROM cust
        |WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM cust WHERE c_acctbal > 0.0)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey AND o_orderdate >= '2001-01-01')
        |GROUP BY 1
        |ORDER BY cntrycode""".stripMargin)
  )
}
