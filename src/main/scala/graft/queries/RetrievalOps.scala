package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Retrieval-and-curation operators a training-data pipeline runs at
  * corpus scale: BM25 relevance scoring, the pair-counting kernel of BPE
  * tokenizer training, and a slowly-changing-dimension (Type 2) upsert.
  *
  * Scale discipline: BM25's corpus statistics collapse to ONE tiny row
  * (integer partial aggregates — order-independent, so deterministic)
  * that broadcasts back to a map-only scoring pass; the BPE kernel is an
  * explode over characters feeding a partial aggregation on a vocabulary
  * of a few hundred distinct pairs, so the shuffle carries pairs, not the
  * corpus; the SCD2 merge broadcasts the (always comparatively small)
  * update batch against the dimension scan.
  */
object RetrievalOps {

  private def docs(s: SparkSession, dir: String): DataFrame = Tables(s, dir, "documents")

  /** Fixed query-term set for the BM25 demo — terms present in the
    * synthetic corpus vocabulary at different document frequencies.
    * Package-private: RrfOps fuses THIS ranker, so the term set, K1/B
    * and the score recipe live here once (see bm25Scored).
    */
  private[queries] val QueryTerms = Seq("spark", "data", "query")
  private[queries] val K1 = 1.2
  private[queries] val B = 0.75

  /** Shared BM25 scoring pass: (doc_id, tf_<term>..., dl, bm25) for
    * every document matching ≥1 query term. One integer-only stats row
    * broadcast back into a map-only fixed-order score expression —
    * text_bm25 projects and orders it; RrfOps takes its top-R as the
    * lexical ranker. Single definition so the K1/B recipe cannot drift
    * between the standalone query and the fusion.
    */
  private[queries] def bm25Scored(s: SparkSession, dir: String): DataFrame = {
    val tok = docs(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).cast("long").as("dl"))
    val dfCols = QueryTerms.map(t =>
      sum(when(array_contains(col("toks"), t), 1L).otherwise(0L)).as(s"df_$t"))
    val stats = tok.agg(
      count(lit(1)).as("n"),
      (sum(col("dl")).as("sumdl") +: dfCols): _*)
    // Literal-free tf columns: filter(toks, x -> x = term) length.
    val tf = QueryTerms.foldLeft(tok) { (d, t) =>
      d.withColumn(s"tf_$t", size(expr(s"filter(toks, x -> x = '$t')")).cast("long"))
    }
    val scored = tf.crossJoin(broadcast(stats))
    val avgdl = col("sumdl").cast("double") / col("n")
    val score = QueryTerms
      .map { t =>
        val idf = log((col("n") - col(s"df_$t") + lit(0.5)) / (col(s"df_$t") + lit(0.5)) + lit(1.0))
        idf * (col(s"tf_$t") * lit(K1 + 1.0)) /
          (col(s"tf_$t") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / avgdl))
      }
      .reduce(_ + _)
    scored
      .filter(QueryTerms.map(t => col(s"tf_$t")).reduce(_ + _) > 0)
      .select(
        col("doc_id") +:
          QueryTerms.map(t => col(s"tf_$t")) :+
          round(score, 4).as("bm25"): _*)
  }

  /** The oracle-side twin of bm25Scored: the tok/stats/tf CTE bodies
    * (no leading WITH), the ROUND(...,4) score expression, and the
    * ≥1-matching-term predicate — both QDefs splice these verbatim.
    */
  private[queries] val bm25SqlCtes: String =
    s"""tok AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
       |  FROM documents),
       |stats AS (
       |  SELECT COUNT(*) AS n, SUM(dl) AS sumdl,
       |${QueryTerms.map(t => s"    SUM(CASE WHEN list_contains(toks, '$t') THEN 1 ELSE 0 END) AS df_$t").mkString(",\n")}
       |  FROM tok),
       |tf AS (
       |  SELECT doc_id, dl,
       |${QueryTerms.map(t => s"    CAST(len(list_filter(toks, x -> x = '$t')) AS BIGINT) AS tf_$t").mkString(",\n")}
       |  FROM tok)""".stripMargin

  private[queries] val bm25SqlScore: String =
    s"""ROUND(${QueryTerms
      .map(t =>
        s"ln((n - df_$t + 0.5e0) / (df_$t + 0.5e0) + 1.0e0) * (tf_$t * ${K1 + 1.0}e0) / (tf_$t + ${K1}e0 * (${1.0 - B}e0 + ${B}e0 * dl / (CAST(sumdl AS DOUBLE) / n)))")
      .mkString("\n      + ")}, 4)"""

  private[queries] val bm25SqlMatch: String =
    QueryTerms.map(t => s"tf_$t").mkString(" + ") + " > 0"

  val defs: Map[String, QDef] = Map(

    // BM25 scoring of every matching document against a fixed term set.
    // Shape: one integer-only aggregate row (N, Σdl, df per term) cross-
    // joined back (Spark broadcasts a single-row side automatically), then
    // a map-only fixed-order score expression. Floating point stays
    // deterministic because every aggregate is integral; doubles only
    // appear in the final per-row expression whose operation order is
    // identical in the oracle. No per-term explode: tf comes from a
    // higher-order filter over the token array, inside codegen.
    "text_bm25" -> QDef(
      (s, dir) => bm25Scored(s, dir).orderBy("doc_id"),
      s"""WITH $bm25SqlCtes
         |SELECT doc_id, ${QueryTerms.map(t => s"tf_$t").mkString(", ")},
         |  $bm25SqlScore AS bm25
         |FROM tf, stats
         |WHERE $bm25SqlMatch
         |ORDER BY doc_id""".stripMargin),

    // The counting kernel of BPE tokenizer training: adjacent character-
    // pair frequencies over the corpus, top 20. Explode is O(chars) but
    // map-side; the partial aggregation reduces to a few hundred distinct
    // pairs before the exchange, so the shuffle is vocabulary-sized no
    // matter how big the corpus. Deterministic total order via
    // (cnt DESC, pair ASC).
    "text_bpe_pairs" -> QDef(
      (s, dir) =>
        docs(s, dir)
          .filter(length(col("text")) >= 2)
          .select(explode(
            expr("transform(sequence(1, length(text) - 1), i -> substring(text, i, 2))"))
            .as("pair"))
          .groupBy("pair")
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("pair").asc)
          .limit(20),
      """WITH p AS (
        |  SELECT unnest(list_transform(range(1, length(text)), i -> substr(text, i, 2))) AS pair
        |  FROM documents WHERE length(text) >= 2)
        |SELECT pair, COUNT(*) AS cnt FROM p
        |GROUP BY pair ORDER BY cnt DESC, pair LIMIT 20""".stripMargin),

    // Slowly-changing-dimension Type 2 upsert over the customer dimension:
    // an update batch (deterministically derived here: every c_custkey ≡ 3
    // mod 7 gets a new balance) closes the current row (valid_to set,
    // is_current false) and opens a new one. The dimension side streams
    // through a single scan; the update batch is broadcast, so the merge
    // is shuffle-free at any dimension size — the pattern a warehouse
    // applies to nightly dimension loads.
    "q_scd2_upsert" -> QDef(
      (s, dir) => {
        val cust = Tables(s, dir, "customer")
        val upd = cust
          .filter(col("c_custkey") % 7 === 3)
          .select(col("c_custkey"), round(col("c_acctbal") + 100.5, 2).as("new_bal"))
        // Validity bounds travel as 'yyyy-MM-dd' strings — the repo-wide
        // idiom for date-valued OUTPUT columns, which sidesteps the
        // DATE/TIMESTAMP mapping skew between engines' pandas exports.
        val eff = lit("2024-06-01")
        val base = lit("2024-01-01")
        val joined = cust
          .select(col("c_custkey"), col("c_acctbal"))
          .join(broadcast(upd.withColumnRenamed("c_custkey", "u_key")),
            col("c_custkey") === col("u_key"), "left")
        val history = joined.select(
          col("c_custkey"),
          col("c_acctbal"),
          base.as("valid_from"),
          when(col("u_key").isNotNull, eff).otherwise(lit(null).cast("string")).as("valid_to"),
          col("u_key").isNull.as("is_current"))
        val fresh = upd.select(
          col("c_custkey"),
          col("new_bal").as("c_acctbal"),
          eff.as("valid_from"),
          lit(null).cast("string").as("valid_to"),
          lit(true).as("is_current"))
        history.unionAll(fresh).orderBy("c_custkey", "valid_from")
      },
      """WITH upd AS (
        |  SELECT c_custkey, ROUND(c_acctbal + 100.5, 2) AS new_bal
        |  FROM customer WHERE c_custkey % 7 = 3)
        |SELECT c.c_custkey, c.c_acctbal,
        |       '2024-01-01' AS valid_from,
        |       CASE WHEN u.c_custkey IS NULL THEN NULL ELSE '2024-06-01' END AS valid_to,
        |       u.c_custkey IS NULL AS is_current
        |FROM customer c LEFT JOIN upd u ON c.c_custkey = u.c_custkey
        |UNION ALL
        |SELECT c_custkey, new_bal AS c_acctbal,
        |       '2024-06-01' AS valid_from, CAST(NULL AS VARCHAR) AS valid_to, true AS is_current
        |FROM upd
        |ORDER BY c_custkey, valid_from""".stripMargin)
  )
}
