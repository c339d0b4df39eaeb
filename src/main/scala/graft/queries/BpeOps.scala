package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** BPE tokenizer TRAINING + APPLICATION (closing the loop that
  * `text_bpe_pairs` opened — that operator counts merge candidates;
  * this one learns an ordered merge table and actually tokenizes the
  * corpus with it, the step a real pipeline needs before token-budgeted
  * packing).
  *
  * Algorithm (Sennrich et al. 2016, "Neural Machine Translation of Rare
  * Words with Subword Units"): start from characters; repeatedly (a)
  * count adjacent token-pair frequencies over the CURRENT tokenization,
  * (b) take the most frequent pair — ties broken (cnt DESC, a ASC,
  * b ASC), the deterministic rank-then-pair order — and (c) fuse every
  * leftmost non-overlapping occurrence corpus-wide. Encoding applies
  * the learned rules in order.
  *
  * Spark shape, and why it holds at 100 TB: the tokenization lives as a
  * sentinel-delimited string per document (US·tok·US US·tok·US, US = \u001f), so one merge pass is a codegen'd `replace` of the literal
  * pattern US+a+US+US+b+US with US+ab+US — MAP-ONLY, O(doc length), no
  * shuffle; leftmost non-overlapping replace IS BPE's repeated-leftmost
  * fuse, and the doubled sentinel keeps adjacent matches from sharing
  * characters (so back-to-back occurrences all fuse in one pass). Pair
  * counting explodes adjacent pairs but PARTIAL-AGGREGATES to the pair
  * vocabulary before the exchange (the text_bpe_pairs discipline: the
  * shuffle carries the vocabulary, not the corpus), and each round
  * collects exactly ONE winning row to the driver, which re-enters the
  * next pass as a literal — the merge table is the only driver traffic,
  * merges × a few bytes, constant in corpus size. Training is `merges`
  * bounded passes; encoding is one map-only chain of `merges` replaces.
  */
object BpeOps {

  private def docs(s: SparkSession, dir: String): DataFrame = Tables(s, dir, "documents")

  /** Sentinel: ASCII unit separator, absent from the corpus text. */
  private val S = "\u001f"

  /** Wrap every character: "ab" becomes S+a+S + S+b+S. Built from an
    * empty-pattern split + array_join (codegen string ops), not a
    * per-character regexp replace — the regex engine's match loop costs
    * more than the whole rest of a training pass.
    */
  private def charString(text: Column): Column =
    concat(lit(S), array_join(split(text, ""), S + S), lit(S))

  /** Tokens of a sentinel string: strip the outer sentinels, split on
    * the doubled one.
    */
  private def toks(sCol: Column): Column =
    split(sCol.substr(lit(2), greatest(length(sCol) - 2, lit(0))),
      java.util.regex.Pattern.quote(S + S))

  /** One training round: the most frequent adjacent pair of the current
    * tokenization, ties (cnt DESC, a ASC, b ASC). One vocabulary-sized
    * shuffle + a ONE-ROW collect.
    */
  private def topPair(cur: DataFrame): (String, String) = {
    // Pairs travel as ONE sentinel-joined string through the hot path
    // (half the allocation of a two-string struct per exploded row); the
    // (cnt DESC, a, b) rank splits the pair back out AFTER the
    // aggregation, where only the vocabulary-sized count table remains.
    val row = cur
      .select(toks(col("s")).as("t"))
      .filter(size(col("t")) >= 2)
      .select(explode(expr(
        s"transform(sequence(1, size(t) - 1), i -> concat(element_at(t, i), '$S', element_at(t, i + 1)))"))
        .as("p"))
      .groupBy(col("p"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        split(col("p"), java.util.regex.Pattern.quote(S), 2).as("ab"),
        col("cnt"))
      .select(element_at(col("ab"), 1).as("a"), element_at(col("ab"), 2).as("b"), col("cnt"))
      .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
      .limit(1)
      .collect()(0)
    (row.getString(0), row.getString(1))
  }

  /** Train `nMerges` rules over `corpus` (any frame with a `s` sentinel
    * string column; other columns ride along untouched) and return
    * (ordered rules, fully-encoded frame).
    */
  def train(corpus: DataFrame, nMerges: Int): (Seq[(String, String)], DataFrame) = {
    var cur = corpus
    var prev: Option[DataFrame] = None
    var rules = Vector.empty[(String, String)]
    for (_ <- 0 until nMerges) {
      // Cache the CURRENT tokenization: round k's pair count and round
      // k+1's input both read it, and without the cache every round
      // replays the whole replace chain from the raw scan. The PREVIOUS
      // round's cache has served both its readers once this round's
      // materializes (inside topPair), so it unpersists here — without
      // this the loop pins nMerges copies of the corpus in the storage
      // pool and late rounds pay the eviction churn.
      cur = cur.cache()
      val (a, b) = topPair(cur)
      prev.foreach(_.unpersist(false))
      prev = Some(cur)
      rules = rules :+ (a -> b)
      cur = cur.withColumn("s",
        replace(col("s"), lit(S + a + S + S + b + S), lit(S + a + b + S)))
    }
    (rules, cur)
  }

  def defs: Map[String, QDef] = {
    val nMerges = 6
    Map(
      // §2 25ik BPE tokenizer application: train 6 merges, encode the
      // corpus, emit per-doc char/token counts plus the learned merge
      // table (broadcast into every row — the hashable proof that BOTH
      // engines learned the identical rules in the identical order).
      // The oracle replays training as 6 unrolled CTE passes: same
      // pair counts, same (cnt DESC, a, b) rank, same leftmost
      // non-overlapping literal replace.
      "text_bpe_encode" -> QDef(
        (s, dir) => {
          // fanOut: this frame is CACHED and read by all seven passes
          // (6 training rounds + final stats), so one up-front rebalance
          // amortizes — the repo rule that reserves fanOut for cached
          // multi-pass frames (ANN training, power iteration, shingle
          // pipelines). Without it the single-row-group small-SF scan
          // serializes every pass onto one core (7.7 s → 3.7 s at
          // sf0.1); at 100 TB the materialization you'd do anyway for a
          // 7-pass loop absorbs the rebalance.
          val corpus = Eval.fanOut(docs(s, dir)).select(
            col("doc_id"),
            length(col("text")).cast("long").as("n_chars"),
            charString(col("text")).as("s"))
          val (rules, encoded) = train(corpus, nMerges)
          val merges = rules.map { case (a, b) => a + "+" + b }.mkString("|")
          encoded
            .select(
              col("doc_id"),
              col("n_chars"),
              size(toks(col("s"))).cast("long").as("n_tok"),
              lit(merges).as("merges"))
            .orderBy("doc_id")
        },
        {
          val sep = "chr(31)"
          def pass(i: Int): String =
            s"""tk$i AS MATERIALIZED (
               |  SELECT string_split(substr(s, 2, greatest(length(s) - 2, 0)), $sep || $sep) AS t
               |  FROM t${i - 1}),
               |p$i AS MATERIALIZED (
               |  SELECT u.a AS a, u.b AS b, COUNT(*) AS cnt FROM (
               |    SELECT unnest(list_transform(range(1, len(t)),
               |      j -> {'a': t[j], 'b': t[j + 1]})) AS u
               |    FROM tk$i WHERE len(t) >= 2)
               |  GROUP BY 1, 2),
               |m$i AS MATERIALIZED (SELECT a, b FROM p$i ORDER BY cnt DESC, a, b LIMIT 1),
               |t$i AS MATERIALIZED (
               |  SELECT doc_id,
               |    replace(s,
               |      $sep || (SELECT a FROM m$i) || $sep || $sep || (SELECT b FROM m$i) || $sep,
               |      $sep || (SELECT a FROM m$i) || (SELECT b FROM m$i) || $sep) AS s
               |  FROM t${i - 1})""".stripMargin
          s"""WITH t0 AS MATERIALIZED (
             |  SELECT doc_id, regexp_replace(text, '(?s)(.)', $sep || '\\1' || $sep, 'g') AS s
             |  FROM documents),
             |${(1 to nMerges).map(pass).mkString(",\n")},
             |mm AS (
             |  SELECT string_agg(a || '+' || b, '|' ORDER BY i) AS merges FROM (
             |    ${(1 to nMerges).map(i => s"SELECT $i AS i, a, b FROM m$i").mkString("\n    UNION ALL ")})),
             |enc AS (
             |  SELECT doc_id,
             |    len(string_split(substr(s, 2, greatest(length(s) - 2, 0)), $sep || $sep)) AS n_tok
             |  FROM t$nMerges)
             |SELECT d.doc_id AS doc_id,
             |  CAST(length(d.text) AS BIGINT) AS n_chars,
             |  CAST(e.n_tok AS BIGINT) AS n_tok,
             |  (SELECT merges FROM mm) AS merges
             |FROM documents d JOIN enc e USING (doc_id)
             |ORDER BY doc_id""".stripMargin
        })
    )
  }
}
