package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Data-governance operators a production warehouse runs continuously:
  * a declarative expectations contract (the Deequ/Great-Expectations
  * pattern) compiled into ONE single-pass aggregate, hot-key skew
  * diagnostics (the measurement that precedes a salting decision —
  * SkewOps is the treatment), a scalable global row-index assignment,
  * and per-group top-k through the native bounded-heap aggregate.
  *
  * Scale discipline: the expectations contract reads the fact table
  * once (every check is a partial-aggregable expression in a single
  * agg); the referential-integrity branch is the only join and rides
  * the runtime bloom filter. Skew diagnostics reduce to |keys| rows
  * before any exchange. The global index shuffles once (hash by a
  * derived range bucket) and moves only bucket COUNTS — never rows —
  * through the cumulative-offset step.
  */
object QualityOps {

  private def li(s: SparkSession, dir: String): DataFrame = Tables(s, dir, "lineitem")

  val defs: Map[String, QDef] = Map(

    // Declarative data-quality contract over lineitem: five checks
    // (row count, null rate, value range, NDV bound, referential
    // integrity) evaluated in a SINGLE pass — one aggregate row feeds
    // four checks; the RI orphan count is the only second branch (an
    // anti join on the fact key, bloom-pruned at scale). All observed
    // values are integral, so pass/fail booleans are exact on both
    // engines. The output is the violations report a pipeline gates on.
    "q_expectations" -> QDef(
      (s, dir) => {
        val fact = li(s, dir)
        val base = fact.agg(
          count(lit(1)).as("n_rows"),
          sum(when(col("l_discount").isNull, 1L).otherwise(0L)).as("n_null_disc"),
          min(col("l_quantity")).cast("long").as("min_qty"),
          max(col("l_quantity")).cast("long").as("max_qty"),
          countDistinct(col("l_returnflag")).as("ndv_flag"))
        val orphans = fact.select(col("l_orderkey"))
          .join(Tables(s, dir, "orders").select(col("o_orderkey")),
            col("l_orderkey") === col("o_orderkey"), "left_anti")
          .agg(count(lit(1)).as("n_orphan"))
        // Both branches are single-row frames; the cross join is two
        // broadcast singletons, and stack() unpivots the scalars into
        // the violations report — no driver round-trip anywhere.
        base.crossJoin(broadcast(orphans)).select(expr(
          """stack(5,
            |  'l_orderkey_in_orders', n_orphan = 0, n_orphan,
            |  'l_quantity_in_1_50', min_qty >= 1 AND max_qty <= 50, max_qty,
            |  'l_returnflag_ndv_le_3', ndv_flag <= 3, ndv_flag,
            |  'no_null_discounts', coalesce(n_null_disc, 0) = 0, coalesce(n_null_disc, 0),
            |  'row_count_positive', n_rows > 0, n_rows
            |) AS (check_name, passed, observed)""".stripMargin))
          .orderBy("check_name")
      },
      """WITH base AS (
        |  SELECT COUNT(*) AS n_rows,
        |         SUM(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS n_null_disc,
        |         CAST(MIN(l_quantity) AS BIGINT) AS min_qty,
        |         CAST(MAX(l_quantity) AS BIGINT) AS max_qty,
        |         COUNT(DISTINCT l_returnflag) AS ndv_flag
        |  FROM lineitem),
        |orph AS (
        |  SELECT COUNT(*) AS n_orphan FROM lineitem l
        |  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        |SELECT * FROM (
        |  SELECT 'l_orderkey_in_orders' AS check_name, n_orphan = 0 AS passed,
        |         CAST(n_orphan AS BIGINT) AS observed FROM orph
        |  UNION ALL
        |  SELECT 'l_quantity_in_1_50', min_qty >= 1 AND max_qty <= 50, max_qty FROM base
        |  UNION ALL
        |  SELECT 'l_returnflag_ndv_le_3', ndv_flag <= 3, CAST(ndv_flag AS BIGINT) FROM base
        |  UNION ALL
        |  SELECT 'no_null_discounts', n_null_disc = 0, CAST(COALESCE(n_null_disc, 0) AS BIGINT) FROM base
        |  UNION ALL
        |  SELECT 'row_count_positive', n_rows > 0, CAST(n_rows AS BIGINT) FROM base
        |) ORDER BY check_name""".stripMargin),

    // Hot-key diagnostics over the events stream: per-user event counts
    // (partial-aggregated — the exchange carries |users| rows, not
    // events), top-10 hottest with integer-exact hot flags (cnt*1000 >
    // total avoids a float threshold whose rounding could diverge).
    // This is the report you read BEFORE reaching for SkewOps' salting.
    "q_skew_diagnose" -> QDef(
      (s, dir) => {
        val ev = Tables(s, dir, "events")
        val total = ev.agg(count(lit(1)).as("total"))
        ev.groupBy("user_id").agg(count(lit(1)).as("cnt"))
          .crossJoin(broadcast(total))
          .select(
            col("user_id"), col("cnt"),
            round(col("cnt") / col("total"), 6).as("share"),
            (col("cnt") * 1000 > col("total")).as("hot"))
          .orderBy(col("cnt").desc, col("user_id").asc)
          .limit(10)
      },
      """WITH t AS (SELECT COUNT(*) AS total FROM events),
        |c AS (SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id)
        |SELECT user_id, cnt, ROUND(CAST(cnt AS DOUBLE) / total, 6) AS share,
        |       cnt * 1000 > total AS hot
        |FROM c, t ORDER BY cnt DESC, user_id LIMIT 10""".stripMargin),

    // Contiguous global row ids 0..N-1 in doc_id order WITHOUT a global
    // single-partition window: docs land in range buckets derived from
    // a broadcast max, per-bucket counts (a few dozen rows) roll into
    // cumulative offsets, and each bucket numbers its rows locally —
    // gid = bucket offset + local rank. One corpus shuffle (hash by
    // bucket, same magnitude as any repartition); the offset step moves
    // bucket counts only. The pattern that shards training corpora.
    "curate_global_index" -> QDef(
      (s, dir) => {
        val nb = 16
        val d = Tables(s, dir, "documents").select(col("doc_id"))
        val mx = d.agg(max(col("doc_id")).as("max_id"))
        val bucketed = d.crossJoin(broadcast(mx))
          .select(col("doc_id"),
            least(lit(nb - 1), (col("doc_id") * nb / (col("max_id") + 1)).cast("int")).as("b"))
        // Bucket counts: nb rows total — the tiny-window exception.
        val offsets = bucketed.groupBy("b").agg(count(lit(1)).as("bc"))
          .withColumn("off",
            coalesce(sum(col("bc")).over(
              Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select("b", "off")
        bucketed.join(broadcast(offsets), "b")
          .withColumn("rn",
            row_number().over(Window.partitionBy("b").orderBy("doc_id")).cast("long"))
          .select(col("doc_id"), (col("off") + col("rn") - 1).as("gid"))
          .orderBy("doc_id")
      },
      """SELECT doc_id,
        |       CAST(ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS gid
        |FROM documents ORDER BY doc_id""".stripMargin),

    // Join-size profiling WITHOUT executing the join — the planner
    // statistic that decides broadcast vs shuffle vs pre-aggregation:
    // per-key counts on each side (partial-aggregated to |keys| rows),
    // count tables joined (|keys|-row join, never the facts), output
    // cardinality = Σ cnt_l × cnt_r. All integers — exact on both
    // engines. At 100 TB this costs two column scans + a tiny join
    // where running the real join to count it would cost the shuffle.
    "q_join_cardinality" -> QDef(
      (s, dir) => {
        val l = li(s, dir).groupBy("l_partkey").agg(count(lit(1)).as("cl"))
        val r = Tables(s, dir, "part").groupBy(col("p_partkey"))
          .agg(count(lit(1)).as("cr"))
        l.join(r, col("l_partkey") === col("p_partkey"))
          .agg(
            sum(col("cl") * col("cr")).as("join_rows"),
            count(lit(1)).as("matched_keys"),
            sum(col("cl")).as("lhs_matched_rows"))
      },
      """WITH l AS (SELECT l_partkey, COUNT(*) AS cl FROM lineitem GROUP BY 1),
        |r AS (SELECT p_partkey, COUNT(*) AS cr FROM part GROUP BY 1)
        |SELECT CAST(SUM(cl * cr) AS BIGINT) AS join_rows,
        |       COUNT(*) AS matched_keys,
        |       CAST(SUM(cl) AS BIGINT) AS lhs_matched_rows
        |FROM l JOIN r ON l_partkey = p_partkey""".stripMargin),

    // Cross-table reconciliation audit: recompute each order's total
    // from its lineitems (partial-aggregated on the fact side — the
    // exchange carries |orders| rows) and surface the 10 largest
    // header-vs-detail discrepancies. The synthetic generator does NOT
    // maintain the invariant, which is exactly what the audit shows —
    // and at a real warehouse this is the nightly header/detail
    // consistency check. Fixed-order arithmetic + round(2) both sides.
    "q_reconciliation" -> QDef(
      (s, dir) => {
        val calc = li(s, dir)
          .groupBy(col("l_orderkey"))
          // Exact DECIMAL charge ([[Money]], r9): order-independent
          // per-order sums at any scale.
          .agg(round(sum(Money.revenue *
            (Money.one + Money.dec("l_tax"))), 2).cast("double").as("calc"))
        Tables(s, dir, "orders")
          .select(col("o_orderkey"), col("o_totalprice"))
          .join(calc, col("o_orderkey") === col("l_orderkey"))
          .select(col("o_orderkey"), col("o_totalprice"), col("calc"),
            round(abs(col("o_totalprice") - col("calc")), 2).as("diff"))
          .orderBy(col("diff").desc, col("o_orderkey").asc)
          .limit(10)
      },
      s"""WITH c AS (
        |  SELECT l_orderkey,
        |         CAST(ROUND(SUM(${Money.revenueSql}
        |           * (CAST('1.00' AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(12,2)))), 2) AS DOUBLE) AS calc
        |  FROM lineitem GROUP BY 1)
        |SELECT o_orderkey, o_totalprice, calc,
        |       ROUND(ABS(o_totalprice - calc), 2) AS diff
        |FROM orders JOIN c ON o_orderkey = l_orderkey
        |ORDER BY diff DESC, o_orderkey LIMIT 10""".stripMargin),

    // Grouped quantile normalization: per-language quartile boundaries
    // from the mergeable percentile sketch (one pass, |langs|×3 rows),
    // broadcast back for a map-only bucket assignment — the feature-
    // binning shape that normalizes heterogeneous subcorpora before
    // mixing. The oracle can't see Spark's sketch boundaries, so the
    // gate is behavioral: exact per-language doc counts (hashable) plus
    // a boolean that every quartile holds 25% ± 40% of its language —
    // loose enough for sketch skew, far tighter than any assignment bug.
    "curate_quantile_norm" -> QDef(
      (s, dir) => {
        val d = Tables(s, dir, "documents").select(col("lang"), col("n_chars"))
        val bounds = d.groupBy("lang").agg(
          expr("percentile_approx(n_chars, array(0.25D, 0.5D, 0.75D), 10000)").as("bs"))
        val bucketed = d.join(broadcast(bounds), "lang")
          .select(col("lang"),
            when(col("n_chars") <= element_at(col("bs"), 1), 1)
              .when(col("n_chars") <= element_at(col("bs"), 2), 2)
              .when(col("n_chars") <= element_at(col("bs"), 3), 3)
              .otherwise(4).as("bkt"))
          .groupBy("lang", "bkt").agg(count(lit(1)).as("c"))
        bucketed.groupBy("lang")
          .agg(sum("c").as("n_docs"), min("c").as("mn"), max("c").as("mx"))
          .select(col("lang"), col("n_docs"),
            (col("mn") * 4 * 10 >= col("n_docs") * 6 &&
              col("mx") * 4 * 10 <= col("n_docs") * 14).as("balanced_ok"))
          .orderBy("lang")
      },
      """SELECT lang, COUNT(*) AS n_docs, true AS balanced_ok
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin),

    // Top-3 orders per customer through the native bounded-heap
    // aggregate (graftbridge.BoundedTopK — the ANN rank kernel): each
    // map-side partial buffer holds at most k entries, so the exchange
    // carries partitions×customers×3 rows, never the orders table. The
    // window-function formulation this replaces shuffles EVERY order
    // into its customer's partition before ranking.
    "q_topk_per_group_native" -> QDef(
      (s, dir) =>
        Tables(s, dir, "orders")
          .filter(col("o_custkey") <= 200)
          .groupBy("o_custkey")
          .agg(graft.functions.GraftFunctions
            .boundedTopK(col("o_totalprice"), col("o_orderkey"), 3).as("top"))
          .select(col("o_custkey"), posexplode(col("top")).as(Seq("pos", "t")))
          .select(col("o_custkey"), col("t.id").as("o_orderkey"),
            col("t.score").as("o_totalprice"), (col("pos") + 1).cast("long").as("rank"))
          .orderBy("o_custkey", "rank"),
      """SELECT o_custkey, o_orderkey, o_totalprice, rank FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rank
        |  FROM orders WHERE o_custkey <= 200)
        |WHERE rank <= 3 ORDER BY o_custkey, rank""".stripMargin)
  )
}
