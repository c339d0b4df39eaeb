package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** CCNet-style perplexity bucketing (Wenzek et al. 2020 — the CommonCrawl
  * curation recipe behind CCNet/LLaMA data: score every document under a
  * reference language model and split the corpus into head/middle/tail
  * TERCILES of the score distribution; training mixes oversample head,
  * drop or downweight tail). The reference LM here is the corpus unigram
  * model of `text_unigram_logprob` (same score expression, but over ALL
  * documents rather than its id<100 demo slice); the split is by exact
  * GLOBAL RANK terciles rather than approximate thresholds, so the cut
  * is reproducible.
  *
  * Determinism: the score is the established 4-dp-rounded avg-logprob
  * (integral corpus frequencies; ln sums round-absorbed — the recipe the
  * sf1/sf10 sweeps proved stable); ranking ties break on doc_id; the
  * tercile boundary is pure integer arithmetic on (rank, N).
  *
  * 100 TB posture: frequencies partial-aggregate to the vocabulary and
  * broadcast back; the global rank comes from the curate_global_index
  * bucket-offset composition over VALUE-RANGE buckets (per-bucket
  * counts → ≤nb-row offset window → per-bucket local ranks) — never a
  * single-partition window over the corpus.
  */
object CCNetOps {

  private val Nb = 16

  def defs: Map[String, QDef] = Map(
    "text_ccnet_buckets" -> QDef(
      (s, dir) => {
        val tok = Tables(s, dir, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        val cw = tok.groupBy("w").agg(count(lit(1)).as("cw"))
        val tot = cw.agg(sum("cw").as("t"))
        val lp = tok.join(cw, "w")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_toks"), sum(log(col("cw"))).as("slc"))
          .crossJoin(broadcast(tot))
          .select(col("doc_id"), col("n_toks"),
            round((col("slc") - col("n_toks") * log(col("t"))) / col("n_toks"), 4)
              .as("avg_logprob"))
        val mm = lp.agg(min("avg_logprob").as("lo"), max("avg_logprob").as("hi"),
          count(lit(1)).as("nd"))
        // Head = highest score, so bucket by distance below the max.
        val bucketed = lp.crossJoin(broadcast(mm))
          .withColumn("b", least(lit(Nb - 1),
            floor((col("hi") - col("avg_logprob")) /
              ((col("hi") - col("lo") + 0.001) / Nb)).cast("int")))
        val offsets = bucketed.groupBy("b").agg(count(lit(1)).as("bc"))
          .withColumn("off", coalesce(sum("bc").over(
            Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select("b", "off")
        bucketed.join(broadcast(offsets), "b")
          .withColumn("rn", row_number().over(
            Window.partitionBy("b").orderBy(col("avg_logprob").desc, col("doc_id")))
            .cast("long"))
          .withColumn("rank", col("off") + col("rn"))
          .select(col("doc_id"), col("n_toks"), col("avg_logprob"), col("rank"),
            when(floor(lit(3) * (col("rank") - 1) / col("nd")) === 0, "head")
              .when(floor(lit(3) * (col("rank") - 1) / col("nd")) === 1, "middle")
              .otherwise("tail").as("bucket"))
          .orderBy("doc_id")
      },
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |cw AS (SELECT w, COUNT(*) AS cw FROM tok GROUP BY w),
        |tot AS (SELECT SUM(cw) AS t FROM cw),
        |lp AS (
        |  SELECT doc_id, COUNT(*) AS n_toks,
        |    ROUND((SUM(ln(cw.cw)) - COUNT(*) * ln(t)) / COUNT(*), 4) AS avg_logprob
        |  FROM tok JOIN cw USING (w) CROSS JOIN tot
        |  GROUP BY doc_id, t),
        |nd AS (SELECT COUNT(*) AS nd FROM lp),
        |ranked AS (
        |  SELECT doc_id, n_toks, avg_logprob,
        |    CAST(ROW_NUMBER() OVER (ORDER BY avg_logprob DESC, doc_id) AS BIGINT)
        |      AS rank
        |  FROM lp)
        |SELECT doc_id, n_toks, avg_logprob, rank,
        |  CASE FLOOR(3 * (rank - 1) / nd)
        |    WHEN 0 THEN 'head' WHEN 1 THEN 'middle' ELSE 'tail' END AS bucket
        |FROM ranked CROSS JOIN nd
        |ORDER BY doc_id""".stripMargin)
  )
}
