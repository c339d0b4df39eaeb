package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus-level LINE deduplication (the RefinedWeb / C4 cleaning rule:
  * a line repeated verbatim across the corpus is boilerplate — headers,
  * cookie banners, navigation — and is removed from EVERY document while
  * the rest of each document survives in order). The driver corpus is
  * newline-free word salad, so "lines" are fixed-width (4-word)
  * non-overlapping segments — same shape, same operator discipline.
  *
  * Scale design (the reason this is not substring dedup 25ip):
  * - Line construction is MAP-ONLY: one `transform(sequence(...))` over
  *   the split word array builds every line of a document without an
  *   explode-then-regroup shuffle — at 100 TB the only corpus-scale
  *   exchanges are the line-frequency partial aggregate and the
  *   frequency join back, both keyed on the line text.
  * - The duplicated-line set (count ≥ K) is FAR smaller than the corpus
  *   but not provably driver-small, so the membership join is a plain
  *   shuffle left join — AQE is free to broadcast it when it measures
  *   small, and to split skewed boilerplate keys (an empty banner line
  *   can appear billions of times; its frequency was already reduced by
  *   the partial agg, so the join side carries one row per DISTINCT
  *   duplicated line, never per occurrence).
  * - Reassembly groups by doc_id (the natural output partitioning) and
  *   rebuilds text by line_no sort inside the group — no global sort.
  *
  * Reference scope: the reference's curation tier stops at document
  * granularity (dedup.rs); this is the line-granular cleaning pass a
  * production corpus pipeline layers above it.
  */
object LineDedupOps {

  /** Words per pseudo-line. */
  private[graft] val LineW = 4

  /** A line occurring ≥ K times corpus-wide is boilerplate. */
  private[graft] val K = 3

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  /** doc_id, line_no, line — built map-only from the word array. */
  private[graft] def docLines(d: DataFrame): DataFrame =
    d.select(col("doc_id"),
      posexplode(expr(
        s"""transform(
           |  sequence(0, cast(ceil(size(split(text, ' ')) / $LineW.0) as int) - 1),
           |  i -> array_join(slice(split(text, ' '), i * $LineW + 1, $LineW), ' '))"""
          .stripMargin)).as(Seq("line_no", "line")))

  def defs: Map[String, QDef] = Map(

    // §2 25jl corpus-level line dedup: drop every occurrence of any
    // 4-word line that appears ≥ 3 times corpus-wide, reassemble the
    // remaining lines per document in order.
    "text_line_dedup" -> QDef(
      (s, dir) => {
        val lines = docLines(docs(s, dir))
        val dupSet = lines.groupBy("line").agg(count(lit(1)).as("cnt"))
          .filter(col("cnt") >= K)
          .select(col("line"), lit(true).as("dup"))
        lines.join(dupSet, Seq("line"), "left")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_lines"),
            sum(when(col("dup"), lit(1L)).otherwise(lit(0L))).as("n_dropped"),
            // Ordered rebuild of the surviving lines: sort the bounded
            // per-doc (line_no, line) list, then join — no window, no
            // global sort.
            concat_ws(" ", transform(
              array_sort(collect_list(when(col("dup").isNull,
                struct(col("line_no"), col("line"))))),
              e => e.getField("line"))).as("clean_text"))
          .orderBy("doc_id")
      },
      s"""WITH d AS (
         |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         |lines AS MATERIALIZED (
         |  SELECT doc_id, g.i AS line_no,
         |         array_to_string(ws[(g.i * $LineW + 1):(g.i * $LineW + $LineW)], ' ') AS line
         |  FROM d, unnest(range(0, CAST(ceil(len(ws) / $LineW.0) AS BIGINT))) AS g(i)),
         |dup AS (
         |  SELECT line FROM lines GROUP BY line HAVING COUNT(*) >= $K)
         |SELECT l.doc_id, COUNT(*) AS n_lines,
         |  CAST(SUM(CASE WHEN dup.line IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_dropped,
         |  COALESCE(string_agg(CASE WHEN dup.line IS NULL THEN l.line END,
         |                      ' ' ORDER BY l.line_no), '') AS clean_text
         |FROM lines l LEFT JOIN dup ON l.line = dup.line
         |GROUP BY l.doc_id ORDER BY l.doc_id""".stripMargin),

    // §2 25jo cross-source contamination matrix: for every source pair,
    // the number of DISTINCT 4-word lines they share and the line-set
    // Jaccard — the dataset-overlap audit (benchmark leakage across
    // ingested datasets) run before mixing sources into a training
    // corpus. Scale: reduce to the distinct (line, source) table first
    // (one corpus-scale agg), then per-line source SETS (bounded by
    // |sources|) explode to ordered pairs map-side — never a line-table
    // self-join; output is |sources|² rows.
    "text_source_overlap" -> QDef(
      (s, dir) => {
        val d = docs(s, dir)
        val ls = docLines(d.select(col("doc_id"), col("text")))
          .join(d.select(col("doc_id"), col("source")), "doc_id")
          .select("line", "source").distinct()
        val perSrc = ls.groupBy("source").agg(count(lit(1)).as("n"))
        val pairs = ls.groupBy("line")
          .agg(sort_array(collect_set("source")).as("ss"))
          .filter(size(col("ss")) >= 2)
          .select(explode(expr(
            """flatten(transform(sequence(1, size(ss) - 1), i ->
              |  transform(sequence(i + 1, size(ss)), j ->
              |    struct(element_at(ss, i) AS a, element_at(ss, j) AS b))))"""
              .stripMargin)).as("p"))
          .groupBy(col("p.a").as("src_a"), col("p.b").as("src_b"))
          .agg(count(lit(1)).as("shared_lines"))
        pairs
          .join(perSrc.select(col("source").as("src_a"), col("n").as("na")), "src_a")
          .join(perSrc.select(col("source").as("src_b"), col("n").as("nb")), "src_b")
          .select(col("src_a"), col("src_b"), col("shared_lines"),
            round(col("shared_lines").cast("double")
              / (col("na") + col("nb") - col("shared_lines")), 6).as("jaccard"))
          .orderBy("src_a", "src_b")
      },
      s"""WITH d AS (
         |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         |lines AS MATERIALIZED (
         |  SELECT doc_id, g.i AS line_no,
         |         array_to_string(ws[(g.i * $LineW + 1):(g.i * $LineW + $LineW)], ' ') AS line
         |  FROM d, unnest(range(0, CAST(ceil(len(ws) / $LineW.0) AS BIGINT))) AS g(i)),
         |ls AS MATERIALIZED (
         |  SELECT DISTINCT l.line, doc.source
         |  FROM lines l JOIN documents doc USING (doc_id)),
         |per_src AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM ls GROUP BY source),
         |pairs AS (
         |  SELECT a.source AS src_a, b.source AS src_b,
         |         CAST(COUNT(*) AS BIGINT) AS shared_lines
         |  FROM ls a JOIN ls b ON a.line = b.line AND a.source < b.source
         |  GROUP BY a.source, b.source)
         |SELECT src_a, src_b, shared_lines,
         |  ROUND(CAST(shared_lines AS DOUBLE) / (pa.n + pb.n - shared_lines), 6)
         |    AS jaccard
         |FROM pairs
         |JOIN per_src pa ON pa.source = src_a
         |JOIN per_src pb ON pb.source = src_b
         |ORDER BY src_a, src_b""".stripMargin)
  )
}
