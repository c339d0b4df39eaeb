package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Table profiling and deterministic sampling for corpus curation —
  * the catalog-side operations a 100 TB pipeline runs before and during
  * data mixing (reference exposes table stats through describeTable /
  * catalog nav, src/rpc/methods.rs; the samplers extend the
  * deterministic-split tier of CurateOps).
  */
object ProfileOps {

  private def li(s: SparkSession, dir: String): DataFrame = Tables(s, dir, "lineitem")
  private def docs(s: SparkSession, dir: String): DataFrame = Tables(s, dir, "documents")

  /** One profile branch: a COLUMN-PRUNED single-column scan (the parquet
    * reader materializes only `c` — `ReadSchema` is one field) feeding a
    * partially-aggregated reduction to a single row. Branches are
    * independent stages, so the engine runs them in parallel; at 100 TB
    * each branch reads one column chunk stream, never the table. The
    * exact COUNT(DISTINCT) exists as the oracle anchor for the sketch —
    * the production profiler keeps only the sketch column.
    */
  private def profileBranch(s: SparkSession, dir: String, c: String): DataFrame =
    li(s, dir).select(col(c).cast("double").as(c))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
        countDistinct(col(c)).as("ndv"),
        approx_count_distinct(col(c), 0.02).cast("long").as("ndv_approx"),
        min(col(c)).as("min_v"),
        max(col(c)).as("max_v"))
      .select(
        lit(c).as("col_name"),
        col("n_rows"),
        coalesce(col("n_null"), lit(0L)).as("n_null"),
        col("ndv"),
        (abs(col("ndv_approx") - col("ndv")) <= col("ndv") * 0.10 + lit(5)).as("ndv_ok"),
        col("min_v"),
        col("max_v"))

  val defs: Map[String, QDef] = Map(

    // Per-column numeric profile of a fact table: row count, null count,
    // exact NDV (oracle anchor), sketch-NDV tolerance boolean, min/max.
    // min/max come straight from stored values — no rounding needed for
    // engine parity.
    "profile_table" -> QDef(
      (s, dir) => {
        // Bounded-NDV columns only: the exact COUNT(DISTINCT) oracle
        // anchor shuffles the distinct SET, so profiling a near-unique
        // column exactly (l_extendedprice: ~|table| distinct doubles)
        // is the one profiler shape that does NOT survive 100x — for
        // those columns a production profile keeps only the sketch.
        val cols = Seq("l_discount", "l_partkey", "l_quantity", "l_tax")
        cols.map(profileBranch(s, dir, _)).reduce(_.unionByName(_)).orderBy("col_name")
      },
      Seq("l_discount", "l_partkey", "l_quantity", "l_tax").map { c =>
        s"""SELECT '$c' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
           |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS ndv, true AS ndv_ok,
           |  MIN(CAST($c AS DOUBLE)) AS min_v, MAX(CAST($c AS DOUBLE)) AS max_v
           |FROM lineitem""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")),

    // Deterministic weighted sampling without replacement
    // (Efraimidis–Spirakis A-ES): each doc draws a reproducible
    // pseudo-uniform u from a multiplicative integer hash of its id
    // (exact BIGINT arithmetic — identical in any engine, no RNG state),
    // and is ranked by ln(u)/weight with weight = n_chars, so selection
    // probability scales with document length. Top-k by that key IS the
    // weighted sample — and because the key is a pure per-row function,
    // the plan is a map-side key computation + bounded ORDER BY LIMIT
    // (per-partition top-k, no global sort shuffle): the same query
    // reproduces the same sample over a re-materialized 100 TB corpus.
    "curate_weighted_sample" -> QDef(
      (s, dir) => {
        // (doc_id * 2654435761) mod 2^32, computed as a split 16-bit
        // multiply so no intermediate exceeds 2^63: a plain product
        // overflows INT64 once doc_id passes ~3.4e9 (hit at sf10, where
        // DuckDB raises while non-ANSI Spark silently wraps — the wrap
        // happens to equal the true mod-2^32 value, so this form changes
        // nothing at any scale and is exact on both engines).
        //   a = doc_id mod 2^32 = a1*2^16 + a0
        //   a*b mod 2^32 = ((a1*b mod 2^16)*2^16 + a0*b) mod 2^32
        val b = 2654435761L
        val a = pmod(col("doc_id"), lit(4294967296L))
        val a1 = floor(a / 65536L).cast("long")
        val a0 = pmod(a, lit(65536L))
        val u = (pmod(pmod(a1 * b, lit(65536L)) * 65536L + a0 * b,
          lit(4294967296L)).cast("double")
          + lit(0.5)) / lit(4294967296.0)
        val key = log(u) / col("n_chars").cast("double")
        val keyed = docs(s, dir)
          .select(col("doc_id"), col("lang"), col("n_chars"), key.as("key"))
          .orderBy(col("key").desc, col("doc_id"))
          .limit(50)
        keyed
          .withColumn("sample_rank",
            row_number().over(Window.orderBy(col("key").desc, col("doc_id"))).cast("long"))
          .select(col("doc_id"), col("lang"), col("n_chars"),
            round(col("key") * 1000, 6).as("key_milli"), col("sample_rank"))
          .orderBy("sample_rank")
      },
      """WITH keyed AS (
        |  SELECT doc_id, lang, n_chars,
        |    ln((((((doc_id // 65536) % 65536) * 2654435761) % 65536 * 65536
        |         + (doc_id % 65536) * 2654435761) % 4294967296 + 0.5) / 4294967296)
        |      / CAST(n_chars AS DOUBLE) AS key
        |  FROM documents),
        |top AS (SELECT * FROM keyed ORDER BY key DESC, doc_id LIMIT 50)
        |SELECT doc_id, lang, n_chars, ROUND(key * 1000, 6) AS key_milli,
        |  CAST(ROW_NUMBER() OVER (ORDER BY key DESC, doc_id) AS BIGINT) AS sample_rank
        |FROM top ORDER BY sample_rank""".stripMargin),

    // Mixture sampling to a target language composition: fixed per-lang
    // quotas (50/20/15/10/5 out of 100 — the data-mixing step that hits
    // a target training distribution), membership by md5-hex rank within
    // the language — a pure function of doc_id, so the mixture is
    // reproducible with no stored sample table. Per-language windows =
    // per-language parallel shards (the curate_pack pattern); a language
    // with fewer docs than quota contributes what it has.
    "curate_mixture" -> QDef(
      (s, dir) => {
        val quota = when(col("lang") === "en", 50L).when(col("lang") === "zh", 20L)
          .when(col("lang") === "es", 15L).when(col("lang") === "de", 10L)
          .when(col("lang") === "fr", 5L).otherwise(0L)
        val w = Window.partitionBy("lang").orderBy("h", "doc_id")
        docs(s, dir)
          .select(col("doc_id"), col("lang"),
            substring(md5(col("doc_id").cast("string")), 1, 12).as("h"))
          .withColumn("pick_rank", row_number().over(w).cast("long"))
          .filter(col("pick_rank") <= quota)
          .select(col("doc_id"), col("lang"), col("pick_rank"))
          .orderBy("lang", "pick_rank")
      },
      """WITH ranked AS (
        |  SELECT doc_id, lang,
        |    CAST(ROW_NUMBER() OVER (
        |      PARTITION BY lang
        |      ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 12), doc_id) AS BIGINT)
        |      AS pick_rank
        |  FROM documents)
        |SELECT doc_id, lang, pick_rank FROM ranked
        |WHERE pick_rank <= CASE lang WHEN 'en' THEN 50 WHEN 'zh' THEN 20
        |  WHEN 'es' THEN 15 WHEN 'de' THEN 10 WHEN 'fr' THEN 5 ELSE 0 END
        |ORDER BY lang, pick_rank""".stripMargin))
}
