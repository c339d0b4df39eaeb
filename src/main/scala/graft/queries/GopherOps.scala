package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The Gopher quality-filter battery (Rae et al. 2021, "Scaling
  * Language Models: ... Gopher", table A1) — the rule set most
  * LLM-pretraining curation pipelines start from: per document, word
  * count within [MinWords, MaxWords], mean word length within
  * [MinMwl, MaxMwl], at least MinStop stopword hits, and a minimum
  * fraction of purely-alphabetic words. Emitted as an AUDIT frame
  * (metrics + per-rule flags + the conjunction) rather than a filter,
  * the same contract as `curate_k_anonymity` — a release pipeline
  * keeps rows where `keep`.
  *
  * Complements `text_quality` (ratio scoring) and `text_repetition`
  * (dup-line/ngram rules): this is the named-threshold battery, with
  * the published Gopher constants where the synthetic corpus can
  * exercise them.
  *
  * Determinism: word counts and length sums are exact integers
  * (aggregate over the token array is a fixed-order fold, but integer
  * sums are order-independent anyway); ratios are single divisions of
  * those integers rounded at 4 dp on both engines before any
  * threshold compare, so flag ties cannot diverge.
  *
  * 100 TB posture: strictly map-only — one projection over the corpus
  * scan, no explode (token arrays stay inside per-row higher-order
  * functions), no join, no shuffle except the output ordering the
  * oracle contract requires.
  */
object GopherOps {

  private val MinWords = 50
  private val MaxWords = 100000
  private val MinMwl = 3.0
  private val MaxMwl = 10.0
  private val MinStop = 2
  private val MinAlphaFrac = 0.8

  /** Gopher's stopword probe set, restricted to words the synthetic
    * corpus vocabulary can actually contain.
    */
  private val Stopwords = Seq("the", "a", "of", "and", "to", "in")

  def defs: Map[String, QDef] = Map(
    "text_gopher_rules" -> QDef(
      (s, dir) => {
        val stopList = Stopwords.map(w => s"'$w'").mkString(", ")
        Tables(s, dir, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
          .select(col("doc_id"),
            size(col("toks")).cast("long").as("n_words"),
            aggregate(col("toks"), lit(0L), (acc, w) => acc + length(w)).as("sum_len"),
            expr(s"size(filter(toks, w -> w IN ($stopList)))").cast("long").as("stop_cnt"),
            expr("size(filter(toks, w -> w rlike '^[a-z]+$'))").cast("long").as("n_alpha"))
          .select(col("doc_id"), col("n_words"),
            round(col("sum_len").cast("double") / col("n_words"), 4).as("mean_word_len"),
            col("stop_cnt"),
            round(col("n_alpha").cast("double") / col("n_words"), 4).as("frac_alpha"))
          .select(col("doc_id"), col("n_words"), col("mean_word_len"),
            col("stop_cnt"), col("frac_alpha"),
            col("n_words").between(MinWords, MaxWords).as("words_ok"),
            col("mean_word_len").between(MinMwl, MaxMwl).as("mwl_ok"),
            (col("stop_cnt") >= MinStop).as("stop_ok"),
            (col("frac_alpha") >= MinAlphaFrac).as("alpha_ok"))
          .withColumn("keep",
            col("words_ok") && col("mwl_ok") && col("stop_ok") && col("alpha_ok"))
          .orderBy("doc_id")
      },
      s"""WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    CAST(len(toks) AS BIGINT) AS n_words,
        |    CAST(list_sum(list_transform(toks, w -> len(w))) AS BIGINT) AS sum_len,
        |    CAST(len(list_filter(toks, w -> w IN (${Stopwords.map(w => s"'$w'").mkString(", ")}))) AS BIGINT) AS stop_cnt,
        |    CAST(len(list_filter(toks, w -> regexp_full_match(w, '[a-z]+'))) AS BIGINT) AS n_alpha
        |  FROM t),
        |r AS (
        |  SELECT doc_id, n_words,
        |    ROUND(CAST(sum_len AS DOUBLE) / n_words, 4) AS mean_word_len,
        |    stop_cnt,
        |    ROUND(CAST(n_alpha AS DOUBLE) / n_words, 4) AS frac_alpha
        |  FROM m)
        |SELECT doc_id, n_words, mean_word_len, stop_cnt, frac_alpha,
        |  n_words BETWEEN $MinWords AND $MaxWords AS words_ok,
        |  mean_word_len BETWEEN $MinMwl AND $MaxMwl AS mwl_ok,
        |  stop_cnt >= $MinStop AS stop_ok,
        |  frac_alpha >= $MinAlphaFrac AS alpha_ok,
        |  (n_words BETWEEN $MinWords AND $MaxWords)
        |    AND (mean_word_len BETWEEN $MinMwl AND $MaxMwl)
        |    AND stop_cnt >= $MinStop AND frac_alpha >= $MinAlphaFrac AS keep
        |FROM r ORDER BY doc_id""".stripMargin)
  )
}
