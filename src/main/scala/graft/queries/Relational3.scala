package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Third tranche of relational coverage: join variants the BigQuery
  * surface exposes (semi / anti / full outer), the remaining window
  * functions (FIRST_VALUE / LAST_VALUE / PERCENT_RANK / CUME_DIST),
  * QUALIFY-style latest-per-key, timestamp arithmetic, null-handling
  * scalars, array functions over split text, and three more TPC-H
  * shapes (Q4 exists-semi, Q10 returned-item top-k, Q19 OR-of-ANDs
  * predicate pushdown).
  *
  * Scale notes: semi/anti joins shuffle once on the join key and never
  * materialize the probe side's payload; Q10's top-20 is a partial
  * TakeOrdered (no global sort of the aggregate); Q19's disjunctive
  * predicate stays in the scan filter (pushed conjuncts) + codegen'd
  * residual, so the 100 TB scan prunes before the broadcast join.
  */
object Relational3 {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  val defs: Map[String, QDef] = Map(

    // LEFT SEMI: customers that placed at least one open ('O') order.
    // Semi join keeps only the left columns — at scale the right side
    // reduces to its distinct keys before the shuffle.
    "q_semi_join" -> QDef(
      (s, dir) => {
        val cust = t(s, dir, "customer")
        val open = t(s, dir, "orders").filter(col("o_orderstatus") === "O")
        cust
          .join(open, cust("c_custkey") === open("o_custkey"), "left_semi")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")
      },
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        |ORDER BY c_custkey""".stripMargin),

    // LEFT ANTI: customers who never placed a large urgent order.
    "q_anti_join" -> QDef(
      (s, dir) => {
        val cust = t(s, dir, "customer")
        val ord = t(s, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 100000)
        cust
          .join(ord, cust("c_custkey") === ord("o_custkey"), "left_anti")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")
      },
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT' AND o_totalprice > 100000)
        |ORDER BY c_custkey""".stripMargin),

    // FULL OUTER: per-nation customer counts vs supplier counts — the
    // outer join surfaces nations present on only one side.
    "q_full_outer_join" -> QDef(
      (s, dir) => {
        val c = t(s, dir, "customer")
          .groupBy(col("c_nationkey").cast("int").as("nationkey"))
          .agg(count(lit(1)).as("n_customers"))
        val sup = t(s, dir, "supplier")
          .groupBy(col("s_nationkey").cast("int").as("nationkey"))
          .agg(count(lit(1)).as("n_suppliers"))
        c.join(sup, Seq("nationkey"), "full_outer")
          .select(
            col("nationkey"),
            coalesce(col("n_customers"), lit(0L)).as("n_customers"),
            coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"))
          .orderBy("nationkey")
      },
      """SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
        |       CAST(COALESCE(c.n_customers, 0) AS BIGINT) AS n_customers,
        |       CAST(COALESCE(s.n_suppliers, 0) AS BIGINT) AS n_suppliers
        |FROM (SELECT CAST(c_nationkey AS INT) AS nationkey, COUNT(*) AS n_customers FROM customer GROUP BY 1) c
        |FULL OUTER JOIN (SELECT CAST(s_nationkey AS INT) AS nationkey, COUNT(*) AS n_suppliers FROM supplier GROUP BY 1) s
        |ON c.nationkey = s.nationkey
        |ORDER BY nationkey""".stripMargin),

    // FIRST_VALUE / LAST_VALUE / NTH_VALUE over each customer's order
    // history (full-partition frame so LAST_VALUE sees the true last).
    "q_window_first_last" -> QDef(
      (s, dir) => {
        val w = Window
          .partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t(s, dir, "orders")
          .select(
            col("o_custkey"),
            col("o_orderkey"),
            first_value(col("o_orderkey")).over(w).as("first_order"),
            last_value(col("o_orderkey")).over(w).as("last_order"),
            nth_value(col("o_orderkey"), 2).over(w).as("second_order"))
          .orderBy("o_custkey", "o_orderkey")
      },
      """SELECT o_custkey, o_orderkey,
        |  FIRST_VALUE(o_orderkey) OVER w AS first_order,
        |  LAST_VALUE(o_orderkey)  OVER w AS last_order,
        |  NTH_VALUE(o_orderkey, 2) OVER w AS second_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin),

    // PERCENT_RANK + CUME_DIST of order value within each priority class.
    "q_window_percent_rank" -> QDef(
      (s, dir) => {
        val w = Window
          .partitionBy("o_orderpriority")
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        // 6-dp quantization via floor(v·1e6 + 0.5), not ROUND(v, 6):
        // both engines compute the identical IEEE double v (one
        // division), but their ROUNDs differ in method (exact BigDecimal
        // HALF_UP vs multiply-and-round) and at sf10 ~1e-4 of rows sat
        // exactly on a 6-dp tie and rounded apart. floor/multiply/add
        // are single IEEE ops with bit-identical results on any engine.
        t(s, dir, "orders")
          .select(
            col("o_orderpriority"),
            col("o_orderkey"),
            (floor(percent_rank().over(w) * lit(1000000.0) + lit(0.5))
              .cast("double") / lit(1000000.0)).as("pct_rank"),
            (floor(cume_dist().over(w) * lit(1000000.0) + lit(0.5))
              .cast("double") / lit(1000000.0)).as("cume"))
          .orderBy("o_orderpriority", "o_orderkey")
      },
      """SELECT o_orderpriority, o_orderkey,
        |  FLOOR(PERCENT_RANK() OVER w * 1000000.0 + 0.5) / 1000000.0 AS pct_rank,
        |  FLOOR(CUME_DIST()    OVER w * 1000000.0 + 0.5) / 1000000.0 AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin),

    // BigQuery QUALIFY: each customer's single most recent order.
    // Spark has no QUALIFY keyword; the idiom is window + filter, which
    // Catalyst plans identically (rank inside the window exchange).
    "q_qualify_latest" -> QDef(
      (s, dir) => {
        val w = Window
          .partitionBy("o_custkey")
          .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
        t(s, dir, "orders")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(
            col("o_custkey"),
            col("o_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("latest_date"))
          .orderBy("o_custkey")
      },
      """SELECT o_custkey, o_orderkey, STRFTIME(o_orderdate, '%Y-%m-%d') AS latest_date
        |FROM orders
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
        |ORDER BY o_custkey""".stripMargin),

    // Timestamp arithmetic: truncation + day diffs between ship and
    // order dates (all map-side scalar work, stays in codegen).
    "q_timestamp_funcs" -> QDef(
      (s, dir) => {
        val li = t(s, dir, "lineitem").select("l_orderkey", "l_linenumber", "l_shipdate")
        val ord = t(s, dir, "orders").select("o_orderkey", "o_orderdate")
        li.join(ord, li("l_orderkey") === ord("o_orderkey"))
          .select(
            col("l_orderkey"),
            col("l_linenumber"),
            date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("order_month"),
            datediff(col("l_shipdate"), col("o_orderdate")).cast("long").as("ship_days"),
            quarter(col("o_orderdate")).cast("long").as("order_quarter"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      """SELECT l_orderkey, l_linenumber,
        |  STRFTIME(DATE_TRUNC('month', o_orderdate), '%Y-%m-%d') AS order_month,
        |  CAST(DATE_DIFF('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS BIGINT) AS ship_days,
        |  CAST(EXTRACT(QUARTER FROM o_orderdate) AS BIGINT) AS order_quarter
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |ORDER BY l_orderkey, l_linenumber""".stripMargin),

    // Null-handling scalars: NULLIF manufactures nulls, COALESCE and
    // IFNULL repair them, plus a null-safe equality comparison.
    "q_null_handling" -> QDef(
      (s, dir) =>
        t(s, dir, "lineitem")
          .select(
            col("l_orderkey"),
            col("l_linenumber"),
            round(
              coalesce(col("l_extendedprice") / nullif(col("l_discount"), lit(0.0)), lit(-1.0)),
              2).as("price_per_disc"),
            nullif(col("l_returnflag"), lit("N")).as("flag_or_null"),
            (col("l_discount") <=> col("l_tax")).as("disc_eq_tax"))
          .orderBy("l_orderkey", "l_linenumber"),
      """SELECT l_orderkey, l_linenumber,
        |  ROUND(COALESCE(l_extendedprice / NULLIF(l_discount, 0.0), -1.0), 2) AS price_per_disc,
        |  NULLIF(l_returnflag, 'N') AS flag_or_null,
        |  l_discount IS NOT DISTINCT FROM l_tax AS disc_eq_tax
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber""".stripMargin),

    // Array functions over tokenized text: build, measure, slice and
    // re-serialize (output stays scalar so the oracle hash is stable).
    "q_array_funcs" -> QDef(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        docs
          .select(
            col("doc_id"),
            split(trim(col("text")), "\\s+").as("words"))
          .select(
            col("doc_id"),
            size(col("words")).cast("long").as("n_words"),
            array_join(slice(col("words"), 1, 3), " ").as("first3"),
            array_contains(col("words"), "the").as("has_the"))
          .orderBy("doc_id")
      },
      """SELECT doc_id,
        |  CAST(LEN(words) AS BIGINT) AS n_words,
        |  ARRAY_TO_STRING(words[1:3], ' ') AS first3,
        |  LIST_CONTAINS(words, 'the') AS has_the
        |FROM (SELECT doc_id, REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+') AS words FROM documents)
        |ORDER BY doc_id""".stripMargin),

    // TPC-H Q4: priority counts of orders having at least one late
    // lineitem — a semi join so each order counts once regardless of
    // how many lineitems qualify.
    "q_tpch_q4" -> QDef(
      (s, dir) => {
        val ord = t(s, dir, "orders")
          .filter(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1996-07-01")
        // l_commitdate/l_receiptdate are absent from the synthetic
        // schema; "late" is approximated as shipped after a fixed
        // horizon, preserving the EXISTS-then-count shape.
        val lateLi = t(s, dir, "lineitem").filter(col("l_shipdate") >= "1996-03-01")
        ord
          .join(lateLi, ord("o_orderkey") === lateLi("l_orderkey"), "left_semi")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
          .orderBy("o_orderpriority")
      },
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
        |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate >= TIMESTAMP '1996-03-01')
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin),

    // TPC-H Q10: top 20 customers by revenue from returned items in a
    // quarter. Aggregate shuffles on custkey; the final top-20 is a
    // TakeOrdered (partial per partition, merged on the driver) — no
    // global sort of the full aggregate at scale.
    "q_tpch_q10" -> QDef(
      (s, dir) => {
        val cust = t(s, dir, "customer")
        val nat = t(s, dir, "nation")
        val ord = t(s, dir, "orders")
          .filter(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1996-04-01")
        val li = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        li.join(ord, li("l_orderkey") === ord("o_orderkey"))
          .join(cust, ord("o_custkey") === cust("c_custkey"))
          .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
          .groupBy("c_custkey", "c_name", "n_name")
          // Accumulate in DECIMAL: a double sum's value depends on
          // partition merge order, which flips round() at .xx5
          // boundaries between engines (and between cluster runs).
          .agg(round(
            sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(18,4)")),
            2).cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
      },
      """SELECT c_custkey, c_name, n_name,
        |  CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin),

    // TPC-H Q19: revenue under an OR of conjunct brackets. The point at
    // scale: the common conjuncts and the OR get pushed/evaluated in the
    // scan (codegen'd residual filter), and part is broadcast.
    "q_tpch_q19" -> QDef(
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val part = t(s, dir, "part")
        li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
          .filter(
            (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
              col("l_quantity").between(1, 20)) ||
            (col("p_brand") === "Brand#2" && col("p_size").between(10, 30) &&
              col("l_quantity").between(10, 40)) ||
            (col("p_brand") === "Brand#3" && col("p_size").between(20, 50) &&
              col("l_quantity").between(20, 60)))
          .agg(Money.revenueSum2.as("revenue"))
      },
      s"""SELECT ${Money.revenueSumSql2} AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 40)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 60)""".stripMargin)
  )
}
