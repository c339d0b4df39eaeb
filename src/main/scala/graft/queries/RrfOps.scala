package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Hybrid-retrieval fusion by Reciprocal Rank Fusion (Cormack et al.
  * 2009) — the standard way a RAG / retrieval pipeline combines a
  * LEXICAL ranker (BM25) with a SEMANTIC ranker (embedding cosine):
  * each ranker contributes 1/(κ + rank) for the documents in its top-R,
  * and the fused score needs no score calibration between the two
  * spaces because only RANKS cross the boundary — which is also what
  * makes it exactly reproducible cross-engine (integer ranks in, a
  * fixed-order two-term double sum out).
  *
  * Rankers here: BM25 over the fixed term set of `text_bm25` (same K1/B
  * recipe — integral aggregates, fixed-order score expression, 4-dp
  * rounding BEFORE ranking so rank ties cannot diverge between engines)
  * and cosine similarity against the vec_id=0 embedding (the
  * `ann_cosine_topk` kernel, 6-dp rounding before ranking), joined on
  * doc_id = vec_id.
  *
  * 100 TB posture: both rankers end in orderBy(score).limit(R) — Spark
  * plans that as TakeOrderedAndProject, the bounded distributed top-k
  * (each partition keeps R rows, the driver merges R×partitions), never
  * a global sort. The row_number windows run AFTER the limit, over
  * R=50-row frames — constant-size, not corpus-size. The fusion join is
  * 50×50.
  */
object RrfOps {

  /** RRF damping constant (κ=60, the value from the original paper). */
  private val Kappa = 60

  /** Per-ranker cutoff. */
  private val R = 50

  /** Top-R lexical ranks: (doc_id, rank_lex) — the top-R of
    * RetrievalOps.bm25Scored, so the term set and K1/B recipe are
    * defined exactly once (text_bm25 and this ranker cannot drift).
    */
  private def lexicalTopR(s: SparkSession, dir: String): DataFrame = {
    val topR = RetrievalOps.bm25Scored(s, dir)
      .select(col("doc_id"), col("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(R)
    topR.withColumn("rank_lex",
      row_number().over(Window.orderBy(col("bm25").desc, col("doc_id"))).cast("long"))
      .select("doc_id", "rank_lex")
  }

  /** Top-R semantic ranks: (doc_id, rank_sem), cosine vs vec_id 0. */
  private def semanticTopR(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "embeddings")
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
    val q = e.filter(col("vec_id") === 0).select(col("v").as("qv"))
    val topR = e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id").as("doc_id"),
        round(VectorOps.cosine(col("v"), col("qv")), 6).as("cos"))
      .orderBy(col("cos").desc, col("doc_id"))
      .limit(R)
    topR.withColumn("rank_sem",
      row_number().over(Window.orderBy(col("cos").desc, col("doc_id"))).cast("long"))
      .select("doc_id", "rank_sem")
  }

  def defs: Map[String, QDef] = Map(
    "text_rrf_fusion" -> QDef(
      (s, dir) => {
        val fused = lexicalTopR(s, dir)
          .join(semanticTopR(s, dir), Seq("doc_id"), "full_outer")
          .select(col("doc_id"), col("rank_lex"), col("rank_sem"),
            round(
              coalesce(lit(1.0) / (lit(Kappa) + col("rank_lex")), lit(0.0)) +
                coalesce(lit(1.0) / (lit(Kappa) + col("rank_sem")), lit(0.0)), 6).as("rrf"))
        fused.orderBy(col("rrf").desc, col("doc_id")).limit(20)
      },
      s"""WITH ${RetrievalOps.bm25SqlCtes},
        |lex0 AS (
        |  SELECT doc_id,
        |    ${RetrievalOps.bm25SqlScore} AS bm25
        |  FROM tf, stats
        |  WHERE ${RetrievalOps.bm25SqlMatch}
        |  ORDER BY bm25 DESC, doc_id LIMIT $R),
        |lex AS (
        |  SELECT doc_id,
        |    CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT) AS rank_lex
        |  FROM lex0),
        |qv AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |       FROM embeddings WHERE vec_id = 0),
        |sem0 AS (
        |  SELECT e.vec_id AS doc_id,
        |    ROUND(list_cosine_similarity(
        |      list_transform(e.embedding, x -> CAST(x AS DOUBLE)), qv.v), 6) AS cos
        |  FROM embeddings e, qv WHERE e.vec_id <> 0
        |  ORDER BY cos DESC, doc_id LIMIT $R),
        |sem AS (
        |  SELECT doc_id,
        |    CAST(ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id) AS BIGINT) AS rank_sem
        |  FROM sem0)
        |SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id, rank_lex, rank_sem,
        |  ROUND(COALESCE(1.0e0 / ($Kappa + rank_lex), 0.0e0)
        |      + COALESCE(1.0e0 / ($Kappa + rank_sem), 0.0e0), 6) AS rrf
        |FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
        |ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin)
  )
}
