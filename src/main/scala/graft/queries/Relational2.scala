package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Second tranche of relational coverage: multi-dimensional aggregation
  * (ROLLUP / CUBE / GROUPING SETS), set operations (INTERSECT / EXCEPT)
  * and PIVOT — all BigQuery-surface constructs the reference's YachtSQL
  * engine emulates.
  */
object Relational2 {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  val defs: Map[String, QDef] = Map(

    // WITH RECURSIVE (Spark 4's recursive CTE): an iterative graph walk
    // over the supplier table — each recursion level JOINS the previous
    // frontier against a real table, the org-chart/BOM pattern.
    // IDENTICAL SQL runs on both engines; the functional successor
    // (sk*3+1 mod 100) plus the depth bound keeps the recursion finite
    // and deterministic.
    "q_recursive_cte" -> QDef(
      (s, dir) => {
        t(s, dir, "supplier").createOrReplaceTempView("supplier_rec")
        s.sql(
          """WITH RECURSIVE reach AS (
            |  SELECT CAST(0 AS BIGINT) AS sk, 0 AS depth
            |  UNION ALL
            |  SELECT (s.s_suppkey * 3 + 1) % 100, r.depth + 1
            |  FROM reach r JOIN supplier_rec s ON s.s_suppkey = r.sk
            |  WHERE r.depth < 15)
            |SELECT sk, CAST(MIN(depth) AS BIGINT) AS first_seen
            |FROM reach GROUP BY sk ORDER BY sk""".stripMargin)
      },
      """WITH RECURSIVE reach AS (
        |  SELECT CAST(0 AS BIGINT) AS sk, 0 AS depth
        |  UNION ALL
        |  SELECT (s.s_suppkey * 3 + 1) % 100, r.depth + 1
        |  FROM reach r JOIN supplier s ON s.s_suppkey = r.sk
        |  WHERE r.depth < 15)
        |SELECT sk, CAST(MIN(depth) AS BIGINT) AS first_seen
        |FROM reach GROUP BY sk ORDER BY sk""".stripMargin),

    // VARIANT (Spark 4's semi-structured type, the analog of BigQuery's
    // JSON type): parse once, typed extraction via variant_get. Unlike
    // string re-parsing per path, the variant value is a parsed binary —
    // the right shape for wide semi-structured scans.
    "q_variant_json" -> QDef(
      (s, dir) =>
        t(s, dir, "events")
          .selectExpr(
            "event_id",
            "variant_get(parse_json(props), '$.k', 'long') AS k_long",
            "variant_get(parse_json(props), '$.k', 'string') AS k_str",
            "variant_get(parse_json(props), '$.missing', 'long') IS NULL AS missing_is_null")
          .orderBy("event_id"),
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_long,
        |  json_extract_string(props, '$.k') AS k_str,
        |  json_extract(props, '$.missing') IS NULL AS missing_is_null
        |FROM events ORDER BY event_id""".stripMargin),

    // Correlated LATERAL subquery with ORDER BY + LIMIT (top order per
    // customer) — the per-row-subquery shape; Spark decorrelates it into
    // a ranked join rather than executing a query per row. Identical
    // SQL runs on DuckDB.
    "q_lateral_join" -> QDef(
      (s, dir) => {
        t(s, dir, "customer").createOrReplaceTempView("customer_lat")
        t(s, dir, "orders").createOrReplaceTempView("orders_lat")
        s.sql(
          """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
            |FROM customer_lat c,
            |LATERAL (SELECT o_orderkey, o_totalprice FROM orders_lat
            |  WHERE o_custkey = c.c_custkey
            |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) AS o
            |WHERE c.c_custkey < 200 ORDER BY c.c_custkey""".stripMargin)
      },
      """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        |FROM customer c,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) AS o
        |WHERE c.c_custkey < 200 ORDER BY c.c_custkey""".stripMargin),

    // UNPIVOT (wide → long melt), the inverse of q_pivot: identical
    // Snowflake-style syntax on both engines; mixed int/double value
    // columns coerce to the common double type in both.
    "q_unpivot" -> QDef(
      (s, dir) => {
        t(s, dir, "part").createOrReplaceTempView("part_unp")
        s.sql(
          """SELECT p_partkey, metric, val FROM part_unp
            |UNPIVOT (val FOR metric IN (p_retailprice, p_size))
            |ORDER BY p_partkey, metric""".stripMargin)
      },
      """SELECT p_partkey, metric, val FROM part
        |UNPIVOT (val FOR metric IN (p_retailprice, p_size))
        |ORDER BY p_partkey, metric""".stripMargin),

    // GROUP BY ALL: grouping keys inferred from the non-aggregate select
    // list — same inference rules on both engines. Money discipline
    // (r13): the sf10 sweep proved ROUND(SUM(double)) here is not even
    // deterministic WITHIN one engine (DuckDB's own cents flip with its
    // thread count at 60M rows) — the sum is exact DECIMAL on both
    // sides, cast to double only after the round.
    "q_group_by_all" -> QDef(
      (s, dir) => {
        t(s, dir, "lineitem").createOrReplaceTempView("lineitem_gba")
        s.sql(
          """SELECT l_returnflag, l_linestatus,
            |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS rev,
            |  COUNT(*) AS n
            |FROM lineitem_gba GROUP BY ALL
            |ORDER BY l_returnflag, l_linestatus""".stripMargin)
      },
      """SELECT l_returnflag, l_linestatus,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS rev,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY ALL
        |ORDER BY l_returnflag, l_linestatus""".stripMargin),

    // Higher-order array functions with lambdas (transform / filter /
    // aggregate-fold) — codegen-adjacent Catalyst HOFs on the Spark
    // side, list_* lambdas on DuckDB, same results.
    "q_hof_arrays" -> QDef(
      (s, dir) =>
        t(s, dir, "part")
          .selectExpr(
            "p_partkey",
            "size(filter(split(p_name, ' '), w -> length(w) > 4)) AS n_long",
            "array_join(transform(split(p_name, ' '), w -> upper(w)), '-') AS upname",
            "aggregate(split(p_name, ' '), 0, (acc, w) -> acc + length(w)) AS n_chars")
          .orderBy("p_partkey"),
      """SELECT p_partkey,
        |  CAST(len(list_filter(string_split(p_name, ' '), w -> length(w) > 4)) AS INT) AS n_long,
        |  array_to_string(list_transform(string_split(p_name, ' '), w -> upper(w)), '-') AS upname,
        |  CAST(list_sum(list_transform(string_split(p_name, ' '), w -> length(w))) AS INT) AS n_chars
        |FROM part ORDER BY p_partkey""".stripMargin),

    // ROLLUP: region → nation revenue hierarchy with subtotals + grand total
    "q_rollup" -> QDef(
      (s, dir) => {
        // Via SQL: Dataset.rollup on join output trips Spark 4.1's
        // DetectAmbiguousSelfJoin (Expand duplicates the tagged grouping
        // attributes); the parser path has no dataset-id metadata.
        t(s, dir, "nation").createOrReplaceTempView("nation")
        t(s, dir, "region").createOrReplaceTempView("region")
        t(s, dir, "customer").createOrReplaceTempView("customer")
        s.sql(
          """SELECT r_name, n_name, COUNT(*) AS n_customers, ROUND(SUM(c_acctbal), 2) AS total_bal
            |FROM customer
            |JOIN nation ON c_nationkey = n_nationkey
            |JOIN region ON n_regionkey = r_regionkey
            |GROUP BY ROLLUP(r_name, n_name)
            |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin)
      },
      """SELECT r_name, n_name, COUNT(*) AS n_customers, ROUND(SUM(c_acctbal), 2) AS total_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin),

    // CUBE over lineitem flags
    "q_cube" -> QDef(
      (s, dir) =>
        t(s, dir, "lineitem")
          .cube("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("cnt"), round(sum("l_quantity"), 2).as("sum_qty"))
          .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt, ROUND(SUM(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin),

    // GROUPING SETS: order counts by priority and, separately, by status
    "q_grouping_sets" -> QDef(
      (s, dir) => {
        t(s, dir, "orders").createOrReplaceTempView("orders")
        s.sql(
          """SELECT o_orderpriority, o_orderstatus, COUNT(*) AS cnt
            |FROM orders
            |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
            |ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin)
      },
      """SELECT o_orderpriority, o_orderstatus, COUNT(*) AS cnt
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
        |ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin),

    // INTERSECT: customers active in both 1996 and 1997
    "q_intersect" -> QDef(
      (s, dir) => {
        val ord = t(s, dir, "orders")
        val y96 = ord.filter(year(col("o_orderdate")) === 1996).select("o_custkey")
        val y97 = ord.filter(year(col("o_orderdate")) === 1997).select("o_custkey")
        y96.intersect(y97).orderBy("o_custkey")
      },
      """SELECT o_custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1997
        |ORDER BY o_custkey""".stripMargin),

    // EXCEPT: customers with no order above 200k
    "q_except" -> QDef(
      (s, dir) => {
        val cust = t(s, dir, "customer").select("c_custkey")
        val big = t(s, dir, "orders").filter(col("o_totalprice") > 300000)
          .select(col("o_custkey").as("c_custkey"))
        cust.except(big).orderBy("c_custkey")
      },
      """SELECT c_custkey FROM customer
        |EXCEPT
        |SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 300000
        |ORDER BY c_custkey""".stripMargin),

    // RANGE BETWEEN interval window: per-customer rolling 30-day order
    // total. Spark's rangeBetween needs a numeric sort key, so the date
    // becomes epoch-days; peers (same customer, same day) aggregate
    // together on both engines — RANGE semantics, not ROWS.
    "q_window_range_between" -> QDef(
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("o_custkey")
          .orderBy(col("epoch_day"))
          .rangeBetween(-30, org.apache.spark.sql.expressions.Window.currentRow)
        t(s, dir, "orders")
          .withColumn("epoch_day", datediff(to_date(col("o_orderdate")), lit("1970-01-01")).cast("long"))
          .select(
            col("o_custkey"), col("o_orderkey"), col("epoch_day"),
            round(sum("o_totalprice").over(w), 2).as("rolling_30d"))
          .orderBy("o_custkey", "o_orderkey")
      },
      """SELECT o_custkey, o_orderkey,
        |  CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS epoch_day,
        |  ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW), 2) AS rolling_30d
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin),

    // STRING_AGG / ARRAY_AGG: ordered list aggregation (BigQuery surface).
    // collect_list order is nondeterministic under parallelism — sort the
    // array before joining so the result is stable (same contract as
    // STRING_AGG ... ORDER BY).
    "q_string_agg" -> QDef(
      (s, dir) => {
        val nat = t(s, dir, "nation")
        val reg = t(s, dir, "region")
        nat.join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
          .groupBy("r_name")
          .agg(
            array_join(array_sort(collect_list(col("n_name"))), ",").as("nations"),
            count(lit(1)).as("n"))
          .orderBy("r_name")
      },
      """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations, COUNT(*) AS n
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin),

    // PIVOT: customer counts per nation pivoted by market segment
    "q_pivot" -> QDef(
      (s, dir) => {
        val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
        val nat = t(s, dir, "nation")
        val cust = t(s, dir, "customer")
        cust.join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
          .groupBy("n_name")
          .pivot("c_mktsegment", segs)
          .agg(coalesce(count(lit(1)), lit(0L)))
          .na.fill(0L, segs)
          .orderBy("n_name")
      },
      """SELECT n_name,
        |  CAST(SUM(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END) AS BIGINT) AS "AUTOMOBILE",
        |  CAST(SUM(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END) AS BIGINT) AS "BUILDING",
        |  CAST(SUM(CASE WHEN c_mktsegment = 'FURNITURE' THEN 1 ELSE 0 END) AS BIGINT) AS "FURNITURE",
        |  CAST(SUM(CASE WHEN c_mktsegment = 'HOUSEHOLD' THEN 1 ELSE 0 END) AS BIGINT) AS "HOUSEHOLD",
        |  CAST(SUM(CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END) AS BIGINT) AS "MACHINERY"
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin)
  )
}
