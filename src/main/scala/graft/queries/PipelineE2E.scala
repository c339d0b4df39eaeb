package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** End-to-end training-data curation pipeline as one verifiable query:
  * exact-dedup (keep first per content hash) → quality gate → per-language
  * corpus statistics. Composes the individually-verified operators the
  * way a real data pipeline would.
  */
object PipelineE2E {

  val defs: Map[String, QDef] = Map(
    "llm_curate_e2e" -> QDef(
      (s: SparkSession, dir: String) => {
        val w = Window.partitionBy("content_hash").orderBy("doc_id")
        Tables(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("text"), md5(col("text")).as("content_hash"))
          .withColumn("dup_rank", row_number().over(w))
          .filter(col("dup_rank") === 1)
          .withColumn("quality_score",
            (round(round(regexp_count(col("text"), lit("[a-z]")).cast("double") / length(col("text")), 4) * 5000, 0) +
              round(least(regexp_count(col("text"), lit("\\b(the|a|of|to|and)\\b")).cast("double") / lit(20.0), lit(1.0)) * 3000, 0) +
              round(least(length(col("text")).cast("double") / lit(500.0), lit(1.0)) * 2000, 0)).cast("long"))
          .filter(col("quality_score") >= 5000)
          .withColumn("ws_tokens", size(split(trim(col("text")), "\\s+")).cast("long"))
          .groupBy("lang")
          .agg(
            count(lit(1)).as("n_docs"),
            sum("ws_tokens").as("total_tokens"),
            sum("quality_score").as("total_quality"))
          .orderBy("lang")
      },
      """WITH deduped AS (
        |  SELECT doc_id, lang, text,
        |    ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS dup_rank
        |  FROM documents),
        |scored AS (
        |  SELECT lang,
        |    CAST(ROUND(ROUND(len(regexp_extract_all(text, '[a-z]')) * 1.0 / LENGTH(text), 4) * 5000)
        |       + ROUND(LEAST(len(regexp_extract_all(text, '\b(the|a|of|to|and)\b')) / 20.0, 1.0) * 3000)
        |       + ROUND(LEAST(LENGTH(text) / 500.0, 1.0) * 2000) AS BIGINT) AS quality_score,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS ws_tokens
        |  FROM deduped WHERE dup_rank = 1)
        |SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(ws_tokens) AS BIGINT) AS total_tokens,
        |  CAST(SUM(quality_score) AS BIGINT) AS total_quality
        |FROM scored WHERE quality_score >= 5000
        |GROUP BY lang ORDER BY lang""".stripMargin)
  )
}
