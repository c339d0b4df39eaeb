package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Embedding-compression retrieval paths beyond PQ/IVF: 1-bit binary
  * quantization with Hamming prefilter + exact rerank (the
  * sign-bit compression modern vector stores ship as "binary
  * quantization": 32× smaller vectors, Hamming candidate search,
  * full-precision rescoring of a small shortlist), and
  * Matryoshka-style dimension truncation (Kusupati et al. 2022: an
  * MRL-trained embedding's prefix is itself an embedding — search the
  * cheap prefix, measure what the truncation costs against the
  * full-dimension ranking).
  *
  * Determinism: Hamming distances are pure integers (sign-bit
  * disagreement counts); cosine scores are 6-dp rounded before any
  * ordering, ties broken by vec_id — the ann_cosine_topk contract.
  * Hamming runs through the native codegen'd SignBitHamming kernel
  * (one branch-free loop inside whole-stage codegen) — the
  * zip_with+aggregate HOF formulation evaluates its lambda interpreted
  * per element, the wrong shape for the corpus-scale scoring pass.
  *
  * 100 TB posture: both paths are map-only over the corpus with the
  * query broadcast; shortlists are bounded (orderBy().limit() plans as
  * TakeOrderedAndProject — per-partition top-k, driver merges
  * k×partitions); the exact rerank touches only the 32-row shortlist.
  * At 10⁹ vectors the binary pass reads 1 bit/dim instead of 4
  * bytes/dim — the point of the operator.
  */
object EmbCompressOps {

  private def emb(s: SparkSession, dir: String): DataFrame = Tables(s, dir, "embeddings")

  /** Hamming shortlist size before exact rerank. */
  private val Shortlist = 32

  /** Truncated (Matryoshka prefix) dimensionality. */
  private val TruncDim = 16

  def defs: Map[String, QDef] = Map(

    // 1-bit binary quantization: sign bits vs the vec_id=0 query,
    // Hamming-ascending shortlist of 32, exact-cosine rerank → top 10.
    "emb_binary_quant" -> QDef(
      (s, dir) => {
        val e = emb(s, dir).select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
        val q = e.filter(col("vec_id") === 0).select(col("v").as("qv"))
        val ham = e.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(q))
          .select(col("vec_id"), col("v"), col("qv"),
            graft.functions.GraftFunctions.signHamming(col("v"), col("qv")).as("hamming"))
        val shortlist = ham.orderBy(col("hamming").asc, col("vec_id").asc).limit(Shortlist)
        shortlist
          .select(col("vec_id"), col("hamming"),
            round(VectorOps.cosine(col("v"), col("qv")), 6).as("cosine"))
          .orderBy(col("cosine").desc, col("vec_id")).limit(10)
          .withColumn("rank",
            row_number().over(Window.orderBy(col("cosine").desc, col("vec_id"))).cast("long"))
          // Explicit final sort: the oracle ends with ORDER BY cosine
          // DESC, vec_id, and relying on the rank window's internal sort
          // surviving as the last physical operator is planner-fragile.
          .orderBy(col("cosine").desc, col("vec_id"))
      },
      s"""WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
        |h AS (
        |  SELECT vec_id, v, qv,
        |    CAST(list_sum(list_transform(range(1, len(v) + 1),
        |      i -> CASE WHEN (v[i] > 0) <> (qv[i] > 0) THEN 1 ELSE 0 END)) AS BIGINT)
        |      AS hamming
        |  FROM e CROSS JOIN q WHERE vec_id <> 0),
        |sl AS (SELECT * FROM h ORDER BY hamming, vec_id LIMIT $Shortlist),
        |rr AS (
        |  SELECT vec_id, hamming, ROUND(list_cosine_similarity(v, qv), 6) AS cosine
        |  FROM sl ORDER BY cosine DESC, vec_id LIMIT 10)
        |SELECT vec_id, hamming, cosine,
        |  CAST(ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id) AS BIGINT) AS rank
        |FROM rr ORDER BY cosine DESC, vec_id""".stripMargin),

    // Matryoshka truncation: top-10 by 16-dim-prefix cosine, flagged
    // with membership in the full-dimension exact top-10 (the recall
    // readout that tells you what the truncation costs).
    "emb_mrl_recall" -> QDef(
      (s, dir) => {
        val e = emb(s, dir).select(col("vec_id"),
          VectorOps.asDouble(col("embedding")).as("v"),
          VectorOps.asDouble(slice(col("embedding"), 1, TruncDim)).as("vt"))
        val q = e.filter(col("vec_id") === 0)
          .select(col("v").as("qv"), col("vt").as("qvt"))
        val corpus = e.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
        val full10 = corpus
          .select(col("vec_id"), round(VectorOps.cosine(col("v"), col("qv")), 6).as("cf"))
          .orderBy(col("cf").desc, col("vec_id")).limit(10)
          .select(col("vec_id"), lit(true).as("in_full"))
        val trunc10 = corpus
          .select(col("vec_id"),
            round(VectorOps.cosine(col("vt"), col("qvt")), 6).as("cos_trunc"))
          .orderBy(col("cos_trunc").desc, col("vec_id")).limit(10)
          .withColumn("rank_trunc",
            row_number().over(Window.orderBy(col("cos_trunc").desc, col("vec_id")))
              .cast("long"))
        trunc10.join(broadcast(full10), Seq("vec_id"), "left")
          .select(col("vec_id"), col("rank_trunc"), col("cos_trunc"),
            coalesce(col("in_full"), lit(false)).as("in_full_topk"))
          .orderBy("rank_trunc")
      },
      s"""WITH e AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
        |    list_transform(embedding[1:$TruncDim], x -> CAST(x AS DOUBLE)) AS vt
        |  FROM embeddings),
        |q AS (SELECT v AS qv, vt AS qvt FROM e WHERE vec_id = 0),
        |c AS (SELECT * FROM e CROSS JOIN q WHERE vec_id <> 0),
        |full10 AS (
        |  SELECT vec_id, true AS in_full
        |  FROM (SELECT vec_id, ROUND(list_cosine_similarity(v, qv), 6) AS cf FROM c
        |        ORDER BY cf DESC, vec_id LIMIT 10)),
        |t0 AS (
        |  SELECT vec_id, ROUND(list_cosine_similarity(vt, qvt), 6) AS cos_trunc
        |  FROM c ORDER BY cos_trunc DESC, vec_id LIMIT 10),
        |t1 AS (
        |  SELECT vec_id, cos_trunc,
        |    CAST(ROW_NUMBER() OVER (ORDER BY cos_trunc DESC, vec_id) AS BIGINT)
        |      AS rank_trunc
        |  FROM t0)
        |SELECT t1.vec_id, rank_trunc, cos_trunc,
        |  COALESCE(in_full, false) AS in_full_topk
        |FROM t1 LEFT JOIN full10 ON t1.vec_id = full10.vec_id
        |ORDER BY rank_trunc""".stripMargin)
  )
}
