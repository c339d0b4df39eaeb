package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus indexing operators: TF-IDF term weighting and an inverted-
  * index (posting-list) build — the retrieval-side counterparts of the
  * BM25 scorer in RetrievalOps.
  *
  * Scale discipline: document frequencies are computed corpus-wide but
  * reduce to |vocabulary| rows before any exchange; the scoring side
  * restricts to the target documents with a filter that reaches the
  * parquet scan. The inverted index prunes the term set by df BEFORE
  * collecting any posting list, so no reducer ever materializes a
  * stop-word's postings.
  */
object IndexOps {

  private def docs(s: SparkSession, dir: String): DataFrame = Tables(s, dir, "documents")

  /** Distinct (doc_id, term) pairs — the presence relation both
    * operators start from. The distinct is a partial-aggregated
    * reduction: duplicates collapse map-side within each document's
    * partition slice before the exchange.
    */
  private def presence(d: DataFrame): DataFrame =
    d.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .distinct()

  val defs: Map[String, QDef] = Map(

    // Top-3 TF-IDF terms for each of the first 40 documents. df comes
    // from the FULL corpus (a |vocab|-row aggregate joined in — Spark
    // broadcasts it under AQE since vocab is small; at web scale the
    // join is a plain shuffle join on term, still |pairs| not |corpus×
    // vocab|). tf is computed only for the target docs — the doc_id
    // predicate pushes to the scan. Smooth idf = ln((N+1)/(df+1));
    // every input to the double expression is integral, and the
    // operation order is identical in the oracle, so scores round
    // identically. Per-doc rank partitions by doc_id — high-cardinality
    // keys, no skew, scale-safe.
    "text_tfidf_topk" -> QDef(
      (s, dir) => {
        val all = docs(s, dir)
        val df = presence(all).groupBy("term").agg(count(lit(1)).as("df"))
        val n = all.agg(count(lit(1)).as("n"))
        val tf = all.filter(col("doc_id") < 40)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
          .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        val scored = tf.join(df, "term").crossJoin(broadcast(n))
          .withColumn("tfidf",
            col("tf") * log((col("n") + 1.0) / (col("df") + 1.0)))
        scored
          .withColumn("rank", row_number().over(
            Window.partitionBy("doc_id")
              .orderBy(col("tfidf").desc, col("term").asc)).cast("long"))
          .filter(col("rank") <= 3)
          .select(col("doc_id"), col("rank"), col("term"), col("tf"),
            round(col("tfidf"), 4).as("tfidf"))
          .orderBy("doc_id", "rank")
      },
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |pres AS (SELECT DISTINCT doc_id, term FROM tok),
        |dfreq AS (SELECT term, COUNT(*) AS df FROM pres GROUP BY term),
        |n AS (SELECT COUNT(*) AS n FROM documents),
        |tf AS (
        |  SELECT doc_id, term, COUNT(*) AS tf FROM tok
        |  WHERE doc_id < 40 GROUP BY doc_id, term),
        |scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf,
        |         tf.tf * ln((n + 1.0e0) / (df + 1.0e0)) AS tfidf
        |  FROM tf JOIN dfreq USING (term), n)
        |SELECT doc_id, rank, term, tf, ROUND(tfidf, 4) AS tfidf FROM (
        |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
        |            ORDER BY tfidf DESC, term) AS BIGINT) AS rank
        |  FROM scored)
        |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin),

    // Phrase (word-bigram) posting lists for the mid-frequency band —
    // bigrams present in 4–8% of the corpus (the single-word vocabulary
    // of the synthetic corpus is uniformly high-df, so the index targets
    // phrases, where document frequency actually discriminates). The df
    // band is RELATIVE to corpus size, so the operator selects the same
    // regime at any scale factor. df is computed FIRST and the surviving
    // phrase set joined back BEFORE any collect_list runs, so posting-
    // list state per reducer is bounded by the band ceiling — a stop-
    // phrase never reaches a buffer. Postings serialize as a comma-
    // joined string of numerically-sorted doc ids: deterministic,
    // engine-portable. First 100 phrases alphabetically.
    "text_inverted_index" -> QDef(
      (s, dir) => {
        val pres = docs(s, dir)
          .select(col("doc_id"), split(col("text"), " ").as("ts"))
          .filter(size(col("ts")) >= 2)
          .select(col("doc_id"), explode(expr(
            "transform(sequence(1, size(ts) - 1), i -> concat(ts[i-1], ' ', ts[i]))"))
            .as("bigram"))
          .distinct()
        val n = docs(s, dir).agg(count(lit(1)).as("n"))
        val keep = pres.groupBy("bigram").agg(count(lit(1)).as("df"))
          .crossJoin(broadcast(n))
          .filter(col("df") * 100 >= col("n") * 4 && col("df") * 100 <= col("n") * 8)
          .select("bigram", "df")
        pres.join(broadcast(keep), "bigram")
          .groupBy("bigram", "df")
          .agg(sort_array(collect_list(col("doc_id"))).as("post"))
          .select(col("bigram"), col("df"),
            expr("array_join(transform(post, x -> cast(x AS string)), ',')").as("postings"))
          .orderBy("bigram")
          .limit(100)
      },
      """WITH tok AS (
        |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |pres AS (
        |  SELECT DISTINCT doc_id,
        |         unnest(list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i+1])) AS bigram
        |  FROM tok),
        |n AS (SELECT COUNT(*) AS n FROM documents),
        |keep AS (
        |  SELECT bigram, COUNT(*) AS df FROM pres, n
        |  GROUP BY bigram, n HAVING COUNT(*) * 100 >= n * 4 AND COUNT(*) * 100 <= n * 8)
        |SELECT bigram, df,
        |       array_to_string(list_sort(list(doc_id)), ',') AS postings
        |FROM pres JOIN keep USING (bigram)
        |GROUP BY bigram, df ORDER BY bigram LIMIT 100""".stripMargin),

    // PMI collocation mining: pointwise mutual information of adjacent
    // word pairs vs their unigram frequencies — the classic collocation
    // statistic. All counts are integral partial aggregates (unigrams
    // reduce to |vocab|, bigrams to |vocab|²-bounded rows before any
    // exchange); the PMI double is computed in ONE fixed expression
    // order from integers, so both engines round identically. Min
    // support 5 occurrences; top-20 by (pmi DESC, pair ASC).
    "text_pmi_topk" -> QDef(
      (s, dir) => {
        val toks = docs(s, dir)
          .select(col("doc_id"), split(col("text"), " ").as("ts"))
        val uni = toks.select(explode(col("ts")).as("w"))
          .groupBy("w").agg(count(lit(1)).as("cw"))
        val tot = uni.agg(sum("cw").as("t"))
        val bi = toks.filter(size(col("ts")) >= 2).select(explode(expr(
          "transform(sequence(1, size(ts) - 1), i -> struct(ts[i-1] AS a, ts[i] AS b))"))
          .as("p"))
          .select(col("p.a"), col("p.b"))
          .groupBy("a", "b").agg(count(lit(1)).as("cab"))
        val btot = bi.agg(sum("cab").as("bt"))
        bi.filter(col("cab") >= 5)
          .join(uni.withColumnRenamed("w", "a").withColumnRenamed("cw", "ca"), "a")
          .join(uni.withColumnRenamed("w", "b").withColumnRenamed("cw", "cb"), "b")
          .crossJoin(broadcast(tot)).crossJoin(broadcast(btot))
          .select(
            concat(col("a"), lit(" "), col("b")).as("pair"), col("cab"),
            round(log(col("cab").cast("double") * col("t") * col("t") /
              (col("bt").cast("double") * col("ca") * col("cb"))), 4).as("pmi"))
          .orderBy(col("pmi").desc, col("pair").asc)
          .limit(20)
      },
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |uni AS (
        |  SELECT unnest(ts) AS w FROM toks),
        |ucnt AS (SELECT w, COUNT(*) AS cw FROM uni GROUP BY w),
        |tot AS (SELECT SUM(cw) AS t FROM ucnt),
        |bi AS (
        |  SELECT unnest(list_transform(range(1, len(ts)), i -> ts[i])) AS a,
        |         unnest(list_transform(range(1, len(ts)), i -> ts[i+1])) AS b
        |  FROM toks),
        |bcnt AS (SELECT a, b, COUNT(*) AS cab FROM bi GROUP BY a, b),
        |btot AS (SELECT SUM(cab) AS bt FROM bcnt)
        |SELECT a || ' ' || b AS pair, cab,
        |       ROUND(ln(CAST(cab AS DOUBLE) * t * t /
        |             (CAST(bt AS DOUBLE) * ca.cw * cb.cw)), 4) AS pmi
        |FROM bcnt
        |JOIN ucnt ca ON ca.w = a
        |JOIN ucnt cb ON cb.w = b
        |CROSS JOIN tot CROSS JOIN btot
        |WHERE cab >= 5
        |ORDER BY pmi DESC, pair LIMIT 20""".stripMargin),

    // Unigram language-model scoring (the CCNet-style perplexity-proxy
    // quality dimension): corpus term frequencies (integral, reduced to
    // |vocab| rows) broadcast back over the token stream, per-doc mean
    // log-probability. avg(ln p) stays in one fixed expression shape:
    // Σ ln(cw) − n·ln(T), all inputs integral, aggregated then rounded
    // at 4dp. Scored docs bounded to ids < 100 (filter pushed to scan);
    // frequencies still come from the FULL corpus.
    "text_unigram_logprob" -> QDef(
      (s, dir) => {
        val all = docs(s, dir)
        val tok = all.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        val cw = tok.groupBy("w").agg(count(lit(1)).as("cw"))
        val tot = cw.agg(sum("cw").as("t"))
        tok.filter(col("doc_id") < 100)
          .join(cw, "w")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_toks"), sum(log(col("cw"))).as("slc"))
          .crossJoin(broadcast(tot))
          .select(col("doc_id"), col("n_toks"),
            round((col("slc") - col("n_toks") * log(col("t"))) / col("n_toks"), 4)
              .as("avg_logprob"))
          .orderBy("doc_id")
      },
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |cw AS (SELECT w, COUNT(*) AS cw FROM tok GROUP BY w),
        |tot AS (SELECT SUM(cw) AS t FROM cw)
        |SELECT doc_id, COUNT(*) AS n_toks,
        |       ROUND((SUM(ln(cw.cw)) - COUNT(*) * ln(t)) / COUNT(*), 4) AS avg_logprob
        |FROM tok JOIN cw USING (w) CROSS JOIN tot
        |WHERE doc_id < 100
        |GROUP BY doc_id, t ORDER BY doc_id""".stripMargin),

    // Language-confusion matrix: declared corpus labels × the stopword-
    // heuristic detector (text_lang_id's expression) — the calibration
    // artifact that tells a curation pipeline WHERE its lang-id is
    // untrustworthy (e.g. zh has no latin stopwords, so its row shows
    // exactly how the heuristic misroutes it). Map-only scoring, counts
    // partial-aggregate to |langs|² cells.
    "text_lang_confusion" -> QDef(
      (s, dir) =>
        TextOps.defs("text_lang_id").run(s, dir)
          .join(docs(s, dir).select(col("doc_id"), col("lang")), "doc_id")
          .groupBy(col("lang").as("declared"), col("pred_lang").as("detected"))
          .agg(count(lit(1)).as("n"))
          .orderBy("declared", "detected"),
      """WITH pred AS (
        |  SELECT doc_id,
        |    CASE WHEN len(regexp_extract_all(text, '\b(the|a|of|to|and)\b')) >= len(regexp_extract_all(text, '\b(der|die|und|das|ist)\b'))
        |          AND len(regexp_extract_all(text, '\b(the|a|of|to|and)\b')) >= len(regexp_extract_all(text, '\b(le|la|et|les|des)\b'))
        |          AND len(regexp_extract_all(text, '\b(the|a|of|to|and)\b')) >= len(regexp_extract_all(text, '\b(el|la|de|que|los)\b')) THEN 'en'
        |         WHEN len(regexp_extract_all(text, '\b(der|die|und|das|ist)\b')) >= len(regexp_extract_all(text, '\b(le|la|et|les|des)\b'))
        |          AND len(regexp_extract_all(text, '\b(der|die|und|das|ist)\b')) >= len(regexp_extract_all(text, '\b(el|la|de|que|los)\b')) THEN 'de'
        |         WHEN len(regexp_extract_all(text, '\b(le|la|et|les|des)\b')) >= len(regexp_extract_all(text, '\b(el|la|de|que|los)\b')) THEN 'fr'
        |         ELSE 'es' END AS detected
        |  FROM documents)
        |SELECT d.lang AS declared, p.detected, COUNT(*) AS n
        |FROM documents d JOIN pred p USING (doc_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
  )
}
