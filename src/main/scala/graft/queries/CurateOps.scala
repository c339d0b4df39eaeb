package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Training-data curation utilities: reproducible sampling, PII-style
  * masking, and sketch-based approximations.
  *
  * Sampling is deterministic by construction — rows are ordered inside
  * each stratum by a content hash (md5), not by an RNG, so any engine
  * reproduces the exact sample: re-runs, retries and audits all see the
  * same rows. Sketch operators (HLL distinct counts, quantile sketches)
  * are the constant-memory path for 100 TB cardinality/quantile work;
  * they are approximate, so they are spec-verified against exact
  * aggregates (no SQL hash-oracle).
  */
object CurateOps {

  private def docs(s: SparkSession, dir: String): DataFrame = Tables(s, dir, "documents")
  private def ev(s: SparkSession, dir: String): DataFrame = Tables(s, dir, "events")

  val defs: Map[String, QDef] = Map(

    // §2.3#51 deterministic stratified sampling: 50 docs per language,
    // chosen by md5 rank — the same rows on every engine and every run.
    "q_sample_stratified" -> QDef(
      (s, dir) => {
        val w = Window.partitionBy("lang")
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
        docs(s, dir)
          .select(col("doc_id"), col("lang"))
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 50)
          .orderBy("lang", "rn")
      },
      """SELECT doc_id, lang, rn FROM (
        |  SELECT doc_id, lang,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rn
        |  FROM documents) t
        |WHERE rn <= 50 ORDER BY lang, rn""".stripMargin),

    // §2.3#52 PII-style masking: chained regexp redaction (emails, then
    // digit runs) over the events props payload, with a mask count for
    // audit. Map-only, codegen'd, no UDFs.
    "text_scrub" -> QDef(
      (s, dir) =>
        ev(s, dir)
          .select(
            col("event_id"),
            regexp_replace(
              regexp_replace(col("props"), "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+", "<EMAIL>"),
              "[0-9]+", "<NUM>").as("props_masked"),
            regexp_count(col("props"), lit("[0-9]+")).cast("long").as("n_masked"))
          .orderBy("event_id"),
      """SELECT event_id,
        |  regexp_replace(regexp_replace(props, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+', '<EMAIL>', 'g'),
        |    '[0-9]+', '<NUM>', 'g') AS props_masked,
        |  CAST(len(regexp_extract_all(props, '[0-9]+')) AS BIGINT) AS n_masked
        |FROM events ORDER BY event_id""".stripMargin),

    // §2.3#53 HLL distinct-user counts per event type: constant memory at
    // any scale (vs the exact shuffle-heavy COUNT DISTINCT). Approximate
    // → spec-verified against exact (no hash oracle).
    "q_approx_distinct" -> QDef(
      (s, dir) =>
        ev(s, dir)
          .groupBy("event_type")
          .agg(approx_count_distinct(col("user_id"), 0.02).cast("long").as("approx_users"))
          .orderBy("event_type"),
      None),

    // §2.3#54 quantile sketch of order totals per order priority —
    // percentile_approx is a mergeable sketch (one pass, bounded memory).
    // Approximate → spec-verified against exact percentiles.
    "q_approx_quantile" -> QDef(
      (s, dir) => {
        val q = percentile_approx(
          col("o_totalprice"),
          array(lit(0.25), lit(0.5), lit(0.75)),
          lit(10000))
        Tables(s, dir, "orders")
          .groupBy("o_orderpriority")
          .agg(q.as("qs"))
          .select(
            col("o_orderpriority"),
            round(element_at(col("qs"), 1), 2).as("p25"),
            round(element_at(col("qs"), 2), 2).as("p50"),
            round(element_at(col("qs"), 3), 2).as("p75"))
          .orderBy("o_orderpriority")
      },
      None)
  )
}
