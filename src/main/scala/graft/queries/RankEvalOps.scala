package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Retrieval-quality evaluation metrics — the scorecard a RAG /
  * embedding pipeline runs after building an index: per-query MRR
  * (reciprocal rank of the first relevant hit), NDCG@10 (graded
  * position-discounted gain, Järvelin & Kekäläinen 2002), and
  * recall@10. Relevance is label agreement: the 50-vector holdout
  * (vec_id < 50) queries the corpus (vec_id ≥ 50), and a neighbor is
  * relevant iff it carries the query's class label — the same
  * holdout/corpus split as `ml_knn_label`, so the ANN family and its
  * eval metric share one protocol.
  *
  * Determinism discipline: ranks come from the bounded top-k kernel
  * with (cosine DESC, neighbor_id ASC) tie order — 6-dp-rounded scores
  * on both engines, so rank ties cannot diverge. The log2 discount
  * table 1/log2(i+1), i=1..10, and its prefix sums (the ideal DCG) are
  * computed ONCE in Scala to 8-dp decimals and spliced as literals into
  * BOTH the Spark plan and the oracle SQL — no cross-engine libm log
  * call at all; DCG is then an exact decimal sum of ≤10 table entries.
  *
  * 100 TB posture: scoring is the `ann_cosine_topk` shape — queries
  * broadcast, one map-only pass over the corpus, per-partition bounded
  * top-k then a merge of k×partitions rows; the metric aggregation
  * runs over 50×10 = 500 rows. Per-label relevant counts are one
  * label-scale partial aggregation. Nothing downstream of the scan is
  * corpus-sized.
  */
object RankEvalOps {

  private def emb(s: SparkSession, dir: String): DataFrame = Tables(s, dir, "embeddings")

  private val K = 10

  /** 1/log2(i+1) for i = 1..K, 8-dp — shared literal table. */
  private val Disc: Seq[BigDecimal] = (1 to K).map(i =>
    BigDecimal(1.0 / (math.log(i + 1.0) / math.log(2.0)))
      .setScale(8, BigDecimal.RoundingMode.HALF_UP))

  /** Ideal DCG at depth k = prefix sums of Disc (index k-1). */
  private val IdcgPrefix: Seq[BigDecimal] = Disc.scanLeft(BigDecimal(0))(_ + _).tail

  def defs: Map[String, QDef] = Map(
    "ml_ranking_metrics" -> QDef(
      (s, dir) => {
        val e = Eval.barrier(Eval.fanOut(
          emb(s, dir).select(col("vec_id"), col("label").cast("long").as("label"),
            VectorOps.asDouble(col("embedding")).as("v"))))
        val q = e.filter(col("vec_id") < 50)
          .select(col("vec_id").as("q_id"), col("label").as("qlabel"), col("v").as("qv"))
        val corpus = e.filter(col("vec_id") >= 50)
        val nrel = corpus.groupBy("label").agg(count(lit(1)).as("n_rel_all"))
        val scored = corpus.crossJoin(broadcast(q.select("q_id", "qv")))
          .select(col("q_id"), col("vec_id").as("neighbor_id"),
            round(VectorOps.cosine(col("qv"), col("v")), 6).as("cosine"))
        val top = VectorOps.topKPerQuery(scored, "cosine", K)
        val discArr = array(Disc.map(d => lit(d.underlying)): _*)
        val idcgArr = array(IdcgPrefix.map(d => lit(d.underlying)): _*)
        val rel = top
          .join(corpus.select(col("vec_id").as("neighbor_id"), col("label").as("nlabel")),
            "neighbor_id")
          .join(broadcast(q.select("q_id", "qlabel")), "q_id")
          .withColumn("rel", col("nlabel") === col("qlabel"))
        val per = rel.groupBy("q_id", "qlabel").agg(
          sum(when(col("rel"), lit(1L)).otherwise(lit(0L))).as("hits"),
          min(when(col("rel"), col("rank"))).as("first_rel"),
          sum(when(col("rel"), element_at(discArr, col("rank").cast("int")))
            .otherwise(lit(BigDecimal(0)).cast("decimal(9,8)"))).as("dcg"))
        per.join(broadcast(nrel), col("qlabel") === col("label"))
          .select(col("q_id"),
            col("n_rel_all").cast("long").as("n_rel"),
            col("hits").cast("long").as("hits"),
            coalesce(round(lit(1.0) / col("first_rel"), 6), lit(0.0)).as("mrr"),
            // Bound FIRST, cast second: least(K, n_rel_all) is ≤ K so the
            // int cast is always safe, whereas casting the unbounded
            // corpus-scale count first could wrap past Int.MaxValue.
            round(col("dcg").cast("double") /
              element_at(idcgArr, least(lit(K.toLong), col("n_rel_all")).cast("int"))
                .cast("double"), 6).as("ndcg"),
            round(col("hits").cast("double") / col("n_rel_all"), 6).as("recall"))
          .orderBy("q_id")
      },
      s"""WITH e AS (
        |  SELECT vec_id, CAST(label AS BIGINT) AS label,
        |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |q AS (SELECT vec_id AS q_id, label AS qlabel, v AS qv FROM e WHERE vec_id < 50),
        |c AS (SELECT * FROM e WHERE vec_id >= 50),
        |nrel AS (SELECT label, COUNT(*) AS n_rel_all FROM c GROUP BY label),
        |scored AS (
        |  SELECT q_id, c.vec_id AS nid, c.label AS nlabel,
        |    ROUND(list_cosine_similarity(qv, c.v), 6) AS cos
        |  FROM q CROSS JOIN c),
        |top AS (
        |  SELECT q_id, nid, nlabel, cos,
        |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, nid) AS rank
        |  FROM scored QUALIFY rank <= $K),
        |rel AS (
        |  SELECT t.q_id, q.qlabel, t.rank, (t.nlabel = q.qlabel) AS rel
        |  FROM top t JOIN q ON t.q_id = q.q_id),
        |per AS (
        |  SELECT q_id, qlabel,
        |    CAST(SUM(CASE WHEN rel THEN 1 ELSE 0 END) AS BIGINT) AS hits,
        |    MIN(CASE WHEN rel THEN rank END) AS first_rel,
        |    SUM(CASE WHEN rel THEN ([${Disc.mkString(", ")}])[rank]
        |        ELSE CAST(0 AS DECIMAL(9,8)) END) AS dcg
        |  FROM rel GROUP BY 1, 2)
        |SELECT per.q_id, CAST(n.n_rel_all AS BIGINT) AS n_rel, per.hits,
        |  COALESCE(ROUND(1.0 / first_rel, 6), 0.0) AS mrr,
        |  ROUND(CAST(dcg AS DOUBLE) /
        |    CAST(([${IdcgPrefix.mkString(", ")}])[LEAST($K, n.n_rel_all)] AS DOUBLE), 6) AS ndcg,
        |  ROUND(CAST(per.hits AS DOUBLE) / n.n_rel_all, 6) AS recall
        |FROM per JOIN nrel n ON per.qlabel = n.label
        |ORDER BY per.q_id""".stripMargin)
  )
}
