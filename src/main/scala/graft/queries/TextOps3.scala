package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-7 text tranche: RAKE keyphrase extraction (Rose et al. 2010) —
  * the classic unsupervised keyword miner: candidate phrases are
  * maximal stopword-free token runs, word score = degree/frequency
  * over phrase co-membership, phrase score = Σ member word scores.
  */
object TextOps3 {

  private def docs(s: SparkSession, dir: String): DataFrame = Tables(s, dir, "documents")

  val defs: Map[String, QDef] = Map(

    // §2 25hi RAKE keyphrases. Scale shape: phrase runs come from
    // per-document windows (doc_id partitions, high cardinality); the
    // word-statistics table partial-aggregates to vocabulary scale and
    // broadcasts back; per-phrase member scores fold in member-position
    // order (bounded sorted lists), so the double sums — and the final
    // (score DESC, phrase ASC) order — are bit-identical on both
    // engines (degree/frequency is an integer ratio, identical by
    // IEEE). Top 20 phrases; ties break on the phrase string.
    "text_rake_keyphrases" -> QDef(
      (s, dir) => {
        val stop = Seq("the", "a", "of", "to", "and")
        val tok = docs(s, dir)
          .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
        val nonstop = tok.filter(!col("w").isInCollection(stop))
          .withColumn("isl",
            col("pos") - row_number().over(Window.partitionBy("doc_id").orderBy("pos")))
        val ph = nonstop.groupBy("doc_id", "isl")
          .agg(count(lit(1)).as("len"),
            array_join(transform(sort_array(collect_list(struct(col("pos"), col("w")))),
              x => x.getField("w")), " ").as("phrase"))
        val members = nonstop.join(ph, Seq("doc_id", "isl"))
        val ws = members.groupBy("w")
          .agg(count(lit(1)).as("freq"), sum("len").as("deg"))
        val scored = members.join(broadcast(ws), "w")
          .groupBy("doc_id", "isl")
          .agg(max("phrase").as("phrase"),
            sort_array(collect_list(struct(col("pos"),
              (col("deg").cast("double") / col("freq").cast("double")).as("sc"))))
              .as("xs"))
          .select(col("phrase"),
            aggregate(col("xs"), lit(0.0), (a, x) => a + x.getField("sc")).as("score"))
        scored.groupBy("phrase")
          .agg(count(lit(1)).as("n"), round(max("score"), 4).as("score"))
          .orderBy(col("score").desc, col("phrase").asc)
          .limit(20)
      },
      """WITH tok0 AS (
        |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |tokp AS (
        |  SELECT doc_id, ts, UNNEST(range(1, len(ts) + 1)) AS pos FROM tok0),
        |tok AS (SELECT doc_id, pos, ts[pos] AS w FROM tokp),
        |nonstop AS (
        |  SELECT doc_id, pos, w,
        |    pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS isl
        |  FROM tok WHERE w NOT IN ('the', 'a', 'of', 'to', 'and')),
        |ph AS (
        |  SELECT doc_id, isl, COUNT(*) AS len,
        |    array_to_string(list(w ORDER BY pos), ' ') AS phrase
        |  FROM nonstop GROUP BY 1, 2),
        |members AS (
        |  SELECT n.doc_id, n.isl, n.pos, n.w, ph.len, ph.phrase
        |  FROM nonstop n JOIN ph USING (doc_id, isl)),
        |ws AS (SELECT w, COUNT(*) AS freq, SUM(len) AS deg FROM members GROUP BY w),
        |scored AS (
        |  SELECT m.doc_id, m.isl, MAX(m.phrase) AS phrase,
        |    list(CAST(deg AS DOUBLE) / CAST(freq AS DOUBLE) ORDER BY m.pos) AS sc
        |  FROM members m JOIN ws USING (w)
        |  GROUP BY 1, 2),
        |psum AS (
        |  SELECT phrase,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), sc), (a, b) -> a + b) AS score
        |  FROM scored)
        |SELECT phrase, COUNT(*) AS n, ROUND(MAX(score), 4) AS score
        |FROM psum GROUP BY phrase
        |ORDER BY score DESC, phrase ASC LIMIT 20""".stripMargin)
  )
}
