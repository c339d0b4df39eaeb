package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Embedding compression codecs. Scalar (per-dimension int8)
  * quantization is the 4× storage cut every vector store applies before
  * anything fancier: per-dimension [min,max] ranges map each float to a
  * 0..255 code, reconstruction error is bounded by half a quantization
  * step.
  *
  * Scale shape: dimension statistics are a partial-aggregated reduction
  * to |dims| rows (one explode pass — map-side combine keeps the
  * exchange at partitions×dims entries); encode/verify is a second
  * map-only pass against the broadcast stats. Nothing driver-side,
  * nothing quadratic.
  */
object CodecOps {

  private def emb(s: SparkSession, dir: String): DataFrame = Tables(s, dir, "embeddings")

  val defs: Map[String, QDef] = Map(

    // Gate: exact vector/dimension counts (hashable) + booleans that
    // every dimension's max reconstruction error stays within half a
    // step (+ float slack) and codes use the full 0..255 range. The
    // oracle can't see Spark's per-dim ranges, so it anchors the exact
    // counts and emits the tolerance booleans as literals.
    "emb_scalar_quant" -> QDef(
      (s, dir) => {
        val dims = emb(s, dir)
          .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "v")))
          .select(col("vec_id"), col("dim"), col("v").cast("double").as("v"))
        val stats = dims.groupBy("dim").agg(min("v").as("mn"), max("v").as("mx"))
        val coded = dims.join(broadcast(stats), "dim")
          // A constant dimension would make step 0 (÷0 → NaN codes);
          // any positive step encodes it losslessly to code 0.
          .withColumn("step",
            when(col("mx") === col("mn"), lit(1.0))
              .otherwise((col("mx") - col("mn")) / 255.0))
          .withColumn("code",
            round((col("v") - col("mn")) / col("step")).cast("int"))
          .withColumn("dec", col("mn") + col("code") * col("step"))
          .withColumn("err", abs(col("v") - col("dec")))
        val perDim = coded.groupBy("dim").agg(
          max("err").as("max_err"), max("step").as("step"),
          min("code").as("min_code"), max("code").as("max_code"))
        val nd = emb(s, dir).agg(
          count(lit(1)).as("n_vecs"), max(size(col("embedding"))).as("n_dims"))
        perDim.agg(
          count(lit(1)).as("dims_profiled"),
          max(col("max_err") - col("step") * 0.5 - lit(1e-9)).as("worst_slack"),
          min("min_code").as("lo"), max("max_code").as("hi"))
          .crossJoin(broadcast(nd))
          .select(
            col("n_vecs"), col("n_dims").cast("long").as("n_dims"),
            col("dims_profiled"),
            (col("worst_slack") <= 0.0).as("err_ok"),
            (col("lo") === 0 && col("hi") === 255).as("range_ok"))
      },
      """SELECT COUNT(*) AS n_vecs,
        |  CAST(MAX(len(embedding)) AS BIGINT) AS n_dims,
        |  CAST(MAX(len(embedding)) AS BIGINT) AS dims_profiled,
        |  true AS err_ok, true AS range_ok
        |FROM embeddings""".stripMargin)
  )
}
