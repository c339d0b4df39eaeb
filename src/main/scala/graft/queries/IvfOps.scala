package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions.cosineSim

/** IVF (inverted-file) approximate nearest neighbour: a coarse quantizer
  * partitions the corpus into cells; queries probe only their `nprobe`
  * nearest cells. This is the classic billion-scale ANN layout — cell
  * assignment is a broadcast-join argmin (map-only over the corpus), the
  * probe search shuffles only cell-local candidates.
  *
  * The quantizer here is deterministic k-means with one distributed Lloyd
  * iteration (seeded from an arithmetic progression of corpus vectors):
  * assignment via broadcast argmin, centroid update via posexplode →
  * per-(cell, dim) mean → regroup. At 100 TB the same plan holds — the
  * centroid table stays tiny and broadcastable.
  */
object IvfOps {

  import VectorOps.asDouble

  private def emb(s: SparkSession, dir: String): DataFrame = Tables(s, dir, "embeddings")

  /** Assign each vector its nearest centroid id. */
  private def assign(vectors: DataFrame, centroids: DataFrame): DataFrame = {
    val w = Window.partitionBy("vec_id").orderBy(col("sim").desc, col("cid"))
    vectors
      .crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("v"), col("cid"), cosineSim(col("v"), col("cv")).as("sim"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("v"), col("cid"))
  }

  /** One Lloyd iteration: per-(cell, dim) means → new centroid arrays. */
  private def recenter(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("cid", "pos")
      .agg(avg("x").as("m"))
      .groupBy("cid")
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("cid"), transform(col("pm"), e => e.getField("m")).as("cv"))

  def defs: Map[String, QDef] = Map(
    // §2.3#40b IVF ANN: 16 cells, nprobe=2, top-10 per query. Approximate
    // (no SQL oracle); spec asserts structure + recall floor.
    "ann_ivf_topk" -> QDef(
      (s, dir) => {
        val k = 16; val nprobe = 2
        // e feeds seeds, quantizer training, cell assignment AND the
        // probe search — cache it once.
        val e = Eval.barrier(Eval.fanOut(
          emb(s, dir).select(col("vec_id"), asDouble(col("embedding")).as("v")))).cache()
        // Deterministic seeds spread across the id range; the Lloyd step
        // trains on a 1-in-5 sample (standard IVF practice — the quantizer
        // needs cluster shape, not every vector).
        val seeds = e.filter(col("vec_id") % lit(29) === 0).limit(k)
          .select((row_number().over(Window.orderBy("vec_id")) - 1).as("cid"), col("v").as("cv"))
        val sample = e.filter(col("vec_id") % lit(5) === 0)
        val centroids = recenter(assign(sample, seeds).select(col("cid"), col("v")))
        val cells = assign(e, centroids).cache()

        val probes = {
          val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("cid"))
          e.filter(col("vec_id") < 10)
            .select(col("vec_id").as("q_id"), col("v").as("qv"))
            .crossJoin(broadcast(centroids))
            .select(col("q_id"), col("qv"), col("cid"), cosineSim(col("qv"), col("cv")).as("sim"))
            .withColumn("rk", row_number().over(w))
            .filter(col("rk") <= nprobe)
            .select(col("q_id"), col("qv"), col("cid"))
        }
        val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("neighbor_id"))
        cells.join(broadcast(probes), Seq("cid"))
          .filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id").as("neighbor_id"),
            round(cosineSim(col("qv"), col("v")), 6).as("cosine"))
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 10)
          .orderBy("q_id", "rank")
      },
      None)
  )
}
