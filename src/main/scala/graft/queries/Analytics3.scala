package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-3 analytics tranche: event funnels, retention cohorts, TPC-H Q8
  * market share, corpus n-gram stats, and embedding-norm aggregates —
  * the composite analyses a training-data/product pipeline runs daily.
  *
  * Funnel/retention stay one-shuffle window/agg plans keyed by user_id
  * (high cardinality — cluster-wide parallelism at any scale); n-gram
  * stats are map-side explode + one aggregation keyed by the n-gram.
  */
object Analytics3 {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  val defs: Map[String, QDef] = Map(

    // Ordered funnel: signup → first click AFTER signup → first purchase
    // AFTER that click, per user; stage counts. Window-per-user keeps it
    // one shuffle; the stage conditions chain through sequential projects
    // (each references the previous window result).
    "ev_funnel" -> QDef(
      (s, dir) => {
        val w = Window.partitionBy("user_id")
        val e = t(s, dir, "events")
          .select(col("user_id"), col("event_type"), unix_timestamp(col("ts")).as("ts_s"))
        val staged = e
          .withColumn("s_ts", min(when(col("event_type") === "signup", col("ts_s"))).over(w))
          .withColumn("c_ts", min(when(col("event_type") === "click" && col("ts_s") > col("s_ts"), col("ts_s"))).over(w))
          .withColumn("p_ts", min(when(col("event_type") === "purchase" && col("ts_s") > col("c_ts"), col("ts_s"))).over(w))
          .groupBy("user_id")
          .agg(max("s_ts").as("s"), max("c_ts").as("c"), max("p_ts").as("p"))
        staged.agg(
          count(col("s")).as("n_signup"),
          count(col("c")).as("n_click_after_signup"),
          count(col("p")).as("n_purchase_after_click"))
      },
      """WITH staged AS (
        |  SELECT user_id,
        |    MIN(CASE WHEN event_type = 'signup' THEN ts_s END) OVER (PARTITION BY user_id) AS s_ts,
        |    ts_s, event_type
        |  FROM (SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s FROM events)
        |), c AS (
        |  SELECT user_id, s_ts,
        |    MIN(CASE WHEN event_type = 'click' AND ts_s > s_ts THEN ts_s END) OVER (PARTITION BY user_id) AS c_ts,
        |    ts_s, event_type
        |  FROM staged
        |), p AS (
        |  SELECT user_id, s_ts, c_ts,
        |    MIN(CASE WHEN event_type = 'purchase' AND ts_s > c_ts THEN ts_s END) OVER (PARTITION BY user_id) AS p_ts
        |  FROM c
        |), per_user AS (
        |  SELECT user_id, MAX(s_ts) AS s, MAX(c_ts) AS c, MAX(p_ts) AS p FROM p GROUP BY user_id
        |)
        |SELECT COUNT(s) AS n_signup,
        |  COUNT(c) AS n_click_after_signup,
        |  COUNT(p) AS n_purchase_after_click
        |FROM per_user""".stripMargin),

    // D1–D7 retention per signup-date cohort: a user is retained if any
    // event lands 1..7 days after their signup day. One join keyed by
    // user_id, aggregation keyed by cohort date.
    "ev_retention" -> QDef(
      (s, dir) => {
        val e = t(s, dir, "events")
          .select(col("user_id"), to_date(col("ts")).as("d"), col("event_type"))
        val signups = e.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min("d").as("signup_d"))
        val activity = e.select(col("user_id").as("a_user"), col("d")).distinct()
        signups
          .join(activity,
            signups("user_id") === col("a_user") &&
              datediff(col("d"), col("signup_d")).between(1, 7),
            "left")
          .groupBy("signup_d")
          .agg(
            countDistinct("user_id").as("n_signups"),
            countDistinct(when(col("a_user").isNotNull, col("user_id"))).as("n_retained_7d"))
          .select(
            date_format(col("signup_d"), "yyyy-MM-dd").as("signup_date"),
            col("n_signups"), col("n_retained_7d"))
          .orderBy("signup_date")
      },
      """WITH signups AS (
        |  SELECT user_id, MIN(CAST(ts AS DATE)) AS signup_d
        |  FROM events WHERE event_type = 'signup' GROUP BY 1
        |), activity AS (
        |  SELECT DISTINCT user_id AS a_user, CAST(ts AS DATE) AS d FROM events
        |)
        |SELECT strftime(signup_d, '%Y-%m-%d') AS signup_date,
        |  COUNT(DISTINCT user_id) AS n_signups,
        |  COUNT(DISTINCT CASE WHEN a_user IS NOT NULL THEN user_id END) AS n_retained_7d
        |FROM signups LEFT JOIN activity
        |  ON user_id = a_user AND d - signup_d BETWEEN 1 AND 7
        |GROUP BY signup_d ORDER BY 1""".stripMargin),

    // TPC-H Q8-style market share: NATION_3 suppliers' share of EUROPE
    // customers' revenue per order year. Two nation lookups (supplier
    // side and customer→region side), both broadcast.
    "q_tpch_q8" -> QDef(
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val ord = t(s, dir, "orders")
        val cust = t(s, dir, "customer")
        val supp = t(s, dir, "supplier")
        val natC = t(s, dir, "nation").select(col("n_nationkey").as("nc_key"), col("n_regionkey"))
        val reg = t(s, dir, "region").filter(col("r_name") === "EUROPE")
        val natS = t(s, dir, "nation").select(col("n_nationkey").as("ns_key"), col("n_name").as("supp_nation"))
        li.join(ord, li("l_orderkey") === ord("o_orderkey"))
          .join(cust, ord("o_custkey") === cust("c_custkey"))
          .join(broadcast(natC), cust("c_nationkey") === col("nc_key"))
          .join(broadcast(reg), col("n_regionkey") === reg("r_regionkey"))
          .join(broadcast(supp), li("l_suppkey") === supp("s_suppkey"))
          .join(broadcast(natS), supp("s_nationkey") === col("ns_key"))
          .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
          // Exact DECIMAL sums ([[Money]], r9) + ONE fixed-operand-order
          // double division: both operands are identical exact decimals
          // on both engines, so the ratio is the identical double.
          .agg(round(
            sum(when(col("supp_nation") === "NATION_3", Money.revenue)
              .otherwise(lit(BigDecimal("0.00")))).cast("double") /
              sum(Money.revenue).cast("double"), 4).as("mkt_share"))
          .orderBy("o_year")
      },
      s"""SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
        |  ROUND(CAST(SUM(CASE WHEN ns.n_name = 'NATION_3'
        |                 THEN ${Money.revenueSql} ELSE CAST('0.00' AS DECIMAL(3,2)) END) AS DOUBLE)
        |    / CAST(SUM(${Money.revenueSql}) AS DOUBLE), 4) AS mkt_share
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation nc ON c_nationkey = nc.n_nationkey
        |JOIN region ON nc.n_regionkey = r_regionkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ns ON s_nationkey = ns.n_nationkey
        |WHERE r_name = 'EUROPE'
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // Corpus bigram stats: top-20 word bigrams by occurrence (ties broken
    // lexicographically). Map-side explode, one count shuffle keyed by
    // the bigram, TakeOrdered for the top-k.
    "text_ngram_topk" -> QDef(
      (s, dir) => {
        t(s, dir, "documents").createOrReplaceTempView("documents")
        s.sql(
          """WITH toks AS (
            |  SELECT split(text, ' ') AS sp FROM documents
            |  WHERE size(split(text, ' ')) >= 2
            |), bg AS (
            |  SELECT bigram FROM toks
            |  LATERAL VIEW explode(
            |    transform(sequence(1, size(sp) - 1),
            |      i -> concat(element_at(sp, i), ' ', element_at(sp, i + 1)))) t AS bigram
            |)
            |SELECT bigram, COUNT(*) AS cnt FROM bg
            |GROUP BY bigram ORDER BY cnt DESC, bigram LIMIT 20""".stripMargin)
      },
      """WITH toks AS (
        |  SELECT string_split(text, ' ') AS sp FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2
        |), bg AS (
        |  SELECT unnest(list_transform(range(1, len(sp)), i -> sp[i] || ' ' || sp[i + 1])) AS bigram
        |  FROM toks
        |)
        |SELECT bigram, COUNT(*) AS cnt FROM bg
        |GROUP BY bigram ORDER BY cnt DESC, bigram LIMIT 20""".stripMargin),

    // Embedding norm statistics per label: L2 norms via a single
    // higher-order aggregate over the vector — map-side only until the
    // tiny per-label rollup.
    "emb_norm_stats" -> QDef(
      (s, dir) =>
        t(s, dir, "embeddings")
          .select(
            col("label").cast("long").as("label"),
            sqrt(aggregate(col("embedding"), lit(0.0d),
              (acc, x) => acc + x.cast("double") * x.cast("double"))).as("norm"),
            element_at(col("embedding"), 1).cast("double").as("x0"))
          .groupBy("label")
          .agg(
            count(lit(1)).as("n"),
            round(avg("norm"), 4).as("avg_norm"),
            round(min("norm"), 4).as("min_norm"),
            round(max("norm"), 4).as("max_norm"),
            round(avg("x0"), 4).as("avg_x0"))
          .orderBy("label"),
      """WITH norms AS (
        |  SELECT CAST(label AS BIGINT) AS label,
        |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS norm,
        |    CAST(embedding[1] AS DOUBLE) AS x0
        |  FROM embeddings
        |)
        |SELECT label, COUNT(*) AS n,
        |  ROUND(AVG(norm), 4) AS avg_norm,
        |  ROUND(MIN(norm), 4) AS min_norm,
        |  ROUND(MAX(norm), 4) AS max_norm,
        |  ROUND(AVG(x0), 4) AS avg_x0
        |FROM norms GROUP BY 1 ORDER BY 1""".stripMargin),

    // Exact-dedup canonical selection with a QUALITY policy: within each
    // content-hash group keep the longest doc (ties → lowest id) — the
    // "keep best, not first" variant real curation pipelines use. One
    // window over the hash key; no self-join.
    "dedup_keep_best" -> QDef(
      (s, dir) => {
        val w = Window.partitionBy("h").orderBy(col("n_chars").desc, col("doc_id"))
        t(s, dir, "documents")
          .select(col("doc_id"), col("n_chars"), md5(col("text")).as("h"))
          .withColumn("rk", row_number().over(w))
          .select(col("doc_id"), col("h"), (col("rk") === 1).as("is_kept"))
          .orderBy("doc_id")
      },
      """SELECT doc_id, md5(text) AS h,
        |  (ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY n_chars DESC, doc_id) = 1) AS is_kept
        |FROM documents ORDER BY doc_id""".stripMargin),

    // Equi-width histogram via width_bucket: one map-side bucket
    // assignment + one count shuffle keyed by bucket — the scalable
    // histogram shape (never a sort).
    // Bucket width 8192 = 2^13: division by a power of two is exact in
    // binary, so Spark's width_bucket and the oracle's floor-division
    // agree bit-for-bit even at bucket boundaries.
    "q_histogram" -> QDef(
      (s, dir) =>
        t(s, dir, "lineitem")
          .select(width_bucket(col("l_extendedprice"), lit(0.0), lit(131072.0), lit(16L)).as("bucket"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("cnt"))
          .orderBy("bucket"),
      """SELECT CASE WHEN l_extendedprice < 0 THEN 0
        |            WHEN l_extendedprice >= 131072.0 THEN 17
        |            ELSE CAST(FLOOR(l_extendedprice / 8192.0) AS BIGINT) + 1 END AS bucket,
        |  COUNT(*) AS cnt
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin),

    // TPC-H Q13-style customer order-count distribution: left join keeps
    // zero-order customers, then a histogram of per-customer counts.
    "q_tpch_q13" -> QDef(
      (s, dir) => {
        val cust = t(s, dir, "customer").select("c_custkey")
        val ord = t(s, dir, "orders")
          .filter(col("o_orderpriority") =!= "1-URGENT")
          .select("o_custkey", "o_orderkey")
        cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy("c_count")
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      },
      """SELECT c_count, COUNT(*) AS custdist FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey) c_orders
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin),

    // DAU / WAU / stickiness: daily actives and the trailing-7-day active
    // count per day. Each distinct (user, day) contributes to the WAU of
    // days d..d+6 — a 7× explode into an EQUI-join on the day (shuffle
    // keyed by day, cluster-parallel), never an inequality-predicate
    // nested loop.
    "ev_dau_wau" -> QDef(
      (s, dir) => {
        val ud = t(s, dir, "events")
          .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
        val days = ud.select(col("d").as("day")).distinct()
        val dau = ud.groupBy(col("d").as("day")).agg(countDistinct("user_id").as("dau"))
        val contrib = ud.select(
          col("user_id"),
          explode(sequence(col("d"), date_add(col("d"), 6))).as("day"))
        val wau = contrib.join(days, "day")
          .groupBy("day")
          .agg(countDistinct("user_id").as("wau"))
        dau.join(wau, "day")
          .select(
            date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("dau"), col("wau"),
            round(col("dau") / col("wau"), 4).as("stickiness"))
          .orderBy("day")
      },
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |days AS (SELECT DISTINCT d AS day FROM ud),
        |dau AS (SELECT d AS day, COUNT(DISTINCT user_id) AS dau FROM ud GROUP BY 1),
        |wau AS (
        |  SELECT days.day, COUNT(DISTINCT ud.user_id) AS wau
        |  FROM days JOIN ud ON days.day - ud.d BETWEEN 0 AND 6
        |  GROUP BY 1)
        |SELECT strftime(dau.day, '%Y-%m-%d') AS day, dau, wau,
        |  ROUND(dau * 1.0 / wau, 4) AS stickiness
        |FROM dau JOIN wau ON dau.day = wau.day ORDER BY 1""".stripMargin),

    // GROUPING() markers distinguish "NULL because rolled up" from "NULL
    // in the data" across ROLLUP levels.
    "q_grouping_id" -> QDef(
      (s, dir) =>
        t(s, dir, "lineitem")
          .rollup("l_returnflag", "l_linestatus")
          .agg(
            count(lit(1)).as("cnt"),
            grouping("l_returnflag").cast("long").as("g_rf"),
            grouping("l_linestatus").cast("long").as("g_ls"))
          .orderBy(col("g_rf"), col("g_ls"), col("l_returnflag"), col("l_linestatus")),
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
        |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
        |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin),

    // Trailing-window anomaly score: each day's total valued against the
    // mean/stddev of the PRECEDING 7 days (never the current row — no
    // self-leakage). Emits the score for every day rather than a
    // thresholded subset so float-boundary flips can't change the row
    // set. The unpartitioned window runs over the per-DAY aggregate —
    // bounded by calendar span, not corpus size, so the single-partition
    // stage holds at any scale.
    "ev_daily_anomaly" -> QDef(
      (s, dir) => {
        val w = Window.orderBy("day").rowsBetween(-7, -1)
        t(s, dir, "events")
          .groupBy(to_date(col("ts")).as("day"))
          // Money discipline: per-day groups grow with event density
          // (2-dp-exact value → lossless DECIMAL, order-independent sum)
          .agg(round(sum(col("value").cast("decimal(12,2)")), 2)
            .cast("double").as("total"))
          .withColumn("mu", avg("total").over(w))
          .withColumn("sd", stddev_samp(col("total")).over(w))
          .select(
            date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("total"),
            round((col("total") - col("mu")) / col("sd"), 4).as("zscore"))
          .orderBy("day")
      },
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS total
        |  FROM events GROUP BY 1)
        |SELECT strftime(day, '%Y-%m-%d') AS day, total,
        |  ROUND((total - AVG(total) OVER w) / STDDEV_SAMP(total) OVER w, 4) AS zscore
        |FROM daily
        |WINDOW w AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
        |ORDER BY day""".stripMargin),

    // Pad / trim / translate / repeat / reverse string surface.
    "q_string_pad_trim" -> QDef(
      (s, dir) =>
        t(s, dir, "nation")
          .select(
            col("n_nationkey"),
            lpad(col("n_name"), 12, "*").as("padded"),
            rpad(col("n_name"), 12, ".").as("rpadded"),
            trim(lit("  x  ")).as("trimmed"),
            ltrim(lit("  x")).as("ltrimmed"),
            translate(col("n_name"), "_N", "-n").as("translated"),
            repeat(lit("ab"), 3).as("repeated"),
            reverse(col("n_name")).as("reversed"))
          .orderBy("n_nationkey"),
      """SELECT n_nationkey,
        |  lpad(n_name, 12, '*') AS padded,
        |  rpad(n_name, 12, '.') AS rpadded,
        |  trim('  x  ') AS trimmed,
        |  ltrim('  x') AS ltrimmed,
        |  translate(n_name, '_N', '-n') AS translated,
        |  repeat('ab', 3) AS repeated,
        |  reverse(n_name) AS reversed
        |FROM nation ORDER BY n_nationkey""".stripMargin)
  )
}
