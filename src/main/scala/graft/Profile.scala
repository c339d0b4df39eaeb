// scratch main for phase profiling (not part of the driver contract)
package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Profile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", (4 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[profile] $name ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    // warmup whole key once
    t("warmup graphTopK full") {
      graft.queries.GraphAnnOps.graphTopK(spark, dir).write.format("noop").mode("overwrite").save()
    }
    spark.catalog.clearCache()
    import graft.queries.{GraphAnnOps, VectorOps}
    val eAll = t("corpus cache") {
      val e = graft.queries.Eval.barrier(graft.queries.Eval.fanOut(
        Tables(spark, dir, "embeddings").select(col("vec_id"),
          VectorOps.asDouble(col("embedding")).as("v")))).cache()
      e.count(); e
    }
    val idx = t("buildIndex (reps+both graphs materialized)") {
      val i = GraphAnnOps.buildIndex(eAll)
      i.graph.count(); i.graph1.count(); i
    }
    val qs = eAll.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val res = t("searchIndex") { GraphAnnOps.searchIndex(idx, qs) }
    t("final action") { res.write.format("noop").mode("overwrite").save() }
    t("brute baseline") {
      VectorOps.bruteTopK(spark, dir).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
