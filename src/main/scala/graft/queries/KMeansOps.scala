package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deterministic Lloyd's k-means over the embedding corpus, exposed as
  * a user API (the IVF family trains cells internally; this is the
  * standalone clustering operator a curation pipeline calls for topic
  * bucketing / stratification). k = 4 seeded from vec_id 0..3 (fixed,
  * not sampled), T = 2 full Lloyd iterations, squared-L2 assignment.
  *
  * Determinism discipline (the iterative-fit family contract):
  * distances are 6-dp rounded before the argmin and ties break on
  * centroid id, so assignments are bit-stable; centroid updates
  * quantize each coordinate to DECIMAL(14,6) before the mean, so the
  * component sums are order-independent at any partitioning; the new
  * centroid coordinate is one rounded division of exact inputs — both
  * engines walk bit-identical centroids into iteration 2.
  *
  * 100 TB posture: per iteration, one map-only distance pass with the
  * k-row centroid frame broadcast, one vec-keyed argmin partial
  * aggregation, and one (k×dim)-keyed partial aggregation for the
  * update — shuffles carry k·dim rows, never the corpus. T iterations
  * = T plan stages; no windows, no driver loop over data.
  */
object KMeansOps {

  private val KClusters = 4
  private val T = 2

  private def emb(s: SparkSession, dir: String): DataFrame = Tables(s, dir, "embeddings")

  /** Squared L2 as a fixed-order fold over the zipped arrays. */
  private def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)

  /** (vec_id, cid, d): 6-dp squared distance to the nearest centroid,
    * ties on centroid id.
    */
  private[graft] def assign(e: DataFrame, cent: DataFrame): DataFrame =
    e.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("cid"), round(l2sq(col("v"), col("cv")), 6).as("d"))
      .groupBy("vec_id")
      .agg(min(struct(col("d"), col("cid"))).as("m"))
      .select(col("vec_id"), col("m.cid").as("cid"), col("m.d").as("d"))

  /** New (cid, cv) centroids: per-coordinate exact-decimal mean. */
  private[graft] def update(e: DataFrame, asg: DataFrame): DataFrame =
    asg.select("vec_id", "cid").join(e, "vec_id")
      .select(col("cid"), posexplode(col("v")).as(Seq("i", "x")))
      .groupBy("cid", "i")
      .agg(sum(round(col("x"), 6).cast("decimal(14,6)")).as("sx"),
        count(lit(1)).as("cnt"))
      .select(col("cid"), col("i"),
        round(col("sx").cast("double") / col("cnt"), 6).as("cx"))
      .groupBy("cid")
      .agg(collect_list(struct(col("i"), col("cx"))).as("a"))
      .select(col("cid"),
        transform(array_sort(col("a")), s => s.getField("cx")).as("cv"))

  def defs: Map[String, QDef] = Map(
    "ml_kmeans_lloyd" -> QDef(
      (s, dir) => {
        val e = Eval.barrier(Eval.fanOut(
          emb(s, dir).select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))))
        val c0 = e.filter(col("vec_id") < KClusters)
          .select(col("vec_id").cast("int").as("cid"), col("v").as("cv"))
        val aT = (2 to T).foldLeft(assign(e, c0)) { (a, _) =>
          assign(e, update(e, a))
        }
        aT.groupBy("cid")
          .agg(count(lit(1)).as("n"), sum(col("d").cast("decimal(18,6)")).as("sd"))
          .select(col("cid").cast("long").as("cluster_id"),
            col("n").cast("long").as("n"),
            round(col("sd").cast("double") / col("n"), 6).as("mean_d"))
          .orderBy("cluster_id")
      },
      s"""WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |c0 AS (SELECT CAST(vec_id AS INT) AS cid, v AS cv FROM e WHERE vec_id < $KClusters),
        |d1 AS (
        |  SELECT vec_id, cid,
        |    ROUND(list_sum(list_transform(range(1, len(v) + 1),
        |      i -> (v[i] - cv[i]) * (v[i] - cv[i]))), 6) AS d
        |  FROM e CROSS JOIN c0),
        |a1 AS (
        |  SELECT vec_id, cid, d FROM (
        |    SELECT vec_id, cid, d,
        |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rk
        |    FROM d1) WHERE rk = 1),
        |x1 AS (
        |  SELECT a1.cid, unnest(range(1, len(v) + 1)) AS i, unnest(v) AS x
        |  FROM a1 JOIN e USING (vec_id)),
        |u1 AS (
        |  SELECT cid, i, SUM(CAST(ROUND(x, 6) AS DECIMAL(14,6))) AS sx, COUNT(*) AS cnt
        |  FROM x1 GROUP BY 1, 2),
        |c1 AS (
        |  SELECT cid, list(ROUND(CAST(sx AS DOUBLE) / cnt, 6) ORDER BY i) AS cv
        |  FROM u1 GROUP BY cid),
        |d2 AS (
        |  SELECT vec_id, cid,
        |    ROUND(list_sum(list_transform(range(1, len(v) + 1),
        |      i -> (v[i] - cv[i]) * (v[i] - cv[i]))), 6) AS d
        |  FROM e CROSS JOIN c1),
        |a2 AS (
        |  SELECT vec_id, cid, d FROM (
        |    SELECT vec_id, cid, d,
        |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rk
        |    FROM d2) WHERE rk = 1)
        |SELECT CAST(cid AS BIGINT) AS cluster_id, COUNT(*) AS n,
        |  ROUND(CAST(SUM(CAST(d AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS mean_d
        |FROM a2 GROUP BY cid ORDER BY cluster_id""".stripMargin)
  )
}
