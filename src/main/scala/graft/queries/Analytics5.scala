package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Concentration and readability analytics: the "is my corpus dominated
  * by a few sources" and "is this text readable prose" screens.
  */
object Analytics5 {

  val defs: Map[String, QDef] = Map(

    // §2 25gj revenue concentration in one pass over a global ranking:
    // Gini coefficient, top-decile share, and the 80% Pareto cut count.
    // The global rank/cumsum that every term needs comes from the
    // bucket-offset composition (third deployment of the
    // curate_global_index pattern — 32 revenue-range buckets, per-bucket
    // windows, tiny prefix tables for both row counts and revenue
    // sums), never a single-partition window. Σ(i·x) accumulates rank ×
    // EXACT DECIMAL revenue — exact on both engines — and the Pareto
    // membership test is the integer-scaled decimal inequality
    // 5·cum > total, so every reported number derives from exact
    // scalars; gini/share evaluate as one identical double expression.
    "q_concentration" -> QDef(
      (s, dir) => {
        val nb = 32
        val cust = Tables(s, dir, "orders")
          .groupBy("o_custkey")
          .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("x"))
        val bucketed = Buckets.assign(cust, col("x"), nb)
        // 32-row prefix tables (count + revenue offsets): tiny windows.
        val offs = bucketed.groupBy("b")
          .agg(count(lit(1)).as("bn"), sum("x").as("bx"))
          .withColumn("off_n", coalesce(sum("bn").over(
            Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .withColumn("off_x", coalesce(sum("bx").over(
            Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)),
            lit(BigDecimal(0)).cast("decimal(28,2)")))
          .select("b", "off_n", "off_x")
        val wb = Window.partitionBy("b").orderBy("x", "o_custkey")
        val ranked = bucketed.join(broadcast(offs), "b")
          .withColumn("i", col("off_n") + row_number().over(wb))
          .withColumn("cum", col("off_x") +
            sum("x").over(wb.rowsBetween(Window.unboundedPreceding, 0)))
          .select(col("i"), col("x"), col("cum"))
        val tot = ranked.agg(
          count(lit(1)).as("n"), sum("x").as("st"), sum(col("i") * col("x")).as("s1"))
        ranked.crossJoin(broadcast(tot))
          .groupBy("n", "st", "s1")
          .agg(
            sum(when(col("i") > col("n") - floor(col("n") / 10), col("x"))).as("top10"),
            sum(when(col("cum") * 5 > col("st"), 1L).otherwise(0L)).as("k_80"))
          .select(
            col("n").as("n_customers"),
            round(lit(2.0) * col("s1").cast("double") /
              (col("n").cast("double") * col("st").cast("double")) -
              (col("n").cast("double") + 1.0) / col("n").cast("double"), 6).as("gini"),
            round(col("top10").cast("double") / col("st").cast("double"), 6)
              .as("top10_share"),
            col("k_80"))
      },
      """WITH cust AS (
        |  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS x
        |  FROM orders GROUP BY 1),
        |r AS (
        |  SELECT x,
        |    ROW_NUMBER() OVER (ORDER BY x, o_custkey) AS i,
        |    SUM(x) OVER (ORDER BY x, o_custkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM cust),
        |tot AS (SELECT COUNT(*) AS n, SUM(x) AS st, SUM(i * x) AS s1 FROM r)
        |SELECT CAST(n AS BIGINT) AS n_customers,
        |  ROUND(2.0 * CAST(s1 AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(st AS DOUBLE)) -
        |        (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE), 6) AS gini,
        |  ROUND(CAST(SUM(CASE WHEN i > n - n // 10 THEN x END) AS DOUBLE) /
        |        CAST(st AS DOUBLE), 6) AS top10_share,
        |  CAST(SUM(CASE WHEN cum * 5 > st THEN 1 ELSE 0 END) AS BIGINT) AS k_80
        |FROM r CROSS JOIN tot
        |GROUP BY n, st, s1""".stripMargin),

    // §2 25gk Flesch readability scoring (the prose-quality screen
    // beside text_quality's ratio heuristics): sentence count from
    // terminator characters, whitespace word count, vowel-group
    // syllable heuristic — all exact integers from identical regexes
    // (character classes only, portable between Java and RE2 regex
    // engines), folded into the classic 206.835 − 1.015·(w/s) −
    // 84.6·(syll/w) formula as one identical double expression.
    // Map-only per doc; no shuffle at all before the output sort.
    "text_readability" -> QDef(
      (s, dir) => {
        Tables(s, dir, "documents")
          .select(col("doc_id"),
            greatest(lit(1L), length(regexp_replace(col("text"), "[^.!?]", "")).cast("long"))
              .as("n_sent"),
            size(split(col("text"), " ")).cast("long").as("n_words"),
            size(regexp_extract_all(lower(col("text")), lit("[aeiouy]+"), lit(0)))
              .cast("long").as("n_syll"))
          .select(col("doc_id"), col("n_sent"), col("n_words"), col("n_syll"),
            round(lit(206.835) -
              lit(1.015) * (col("n_words").cast("double") / col("n_sent").cast("double")) -
              lit(84.6) * (col("n_syll").cast("double") / col("n_words").cast("double")), 4)
              .as("flesch"))
          .orderBy("doc_id")
      },
      """SELECT doc_id,
        |  GREATEST(1, CAST(length(regexp_replace(text, '[^.!?]', '', 'g')) AS BIGINT))
        |    AS n_sent,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |  CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS n_syll,
        |  ROUND(206.835 -
        |    1.015 * (CAST(len(string_split(text, ' ')) AS DOUBLE) /
        |      CAST(GREATEST(1, length(regexp_replace(text, '[^.!?]', '', 'g'))) AS DOUBLE)) -
        |    84.6 * (CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS DOUBLE) /
        |      CAST(len(string_split(text, ' ')) AS DOUBLE)), 4) AS flesch
        |FROM documents ORDER BY doc_id""".stripMargin)
  )
}
