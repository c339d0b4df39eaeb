// scratch profiling main (not part of the driver contract)
package graft.queries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object AbSem {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", (4*1024*1024).toString)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      System.err.println(f"[ab] $name ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    
    for (i <- 0 until 3) {
      t(s"semdedup full run$i") {
        graft.SparkEntry.queries("curate_semdedup")(spark, dir).write.format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    // phases
    val grouped = graft.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
      .withColumn("__h", xxhash64(col("v")))
      .groupBy("__h", "v")
      .agg(min("vec_id").as("rep"), collect_list("vec_id").as("ids"))
      .cache()
    t("grouped count") { grouped.count() }
    val reps = grouped.select(col("rep").as("vec_id"), col("v"))
    val nd = grouped.agg(count(lit(1)).as("nv"))
    val e = SemDedupOps.bucketed(reps, nd)
    t("bucketed noop") { e.write.format("noop").mode("overwrite").save() }
    val ec = e.cache()
    t("bucketed cache count") { ec.count() }
    val a = ec.select(col("bucket"), col("vec_id").as("ida"), col("v").as("va"))
    val b = ec.select(col("bucket"), col("vec_id").as("idb"), col("v").as("vb"))
    val repPairs = a.join(b, Seq("bucket"))
      .filter(col("ida") < col("idb"))
      .select(col("ida"), col("idb"),
        round(graft.functions.GraftFunctions.cosineSim(col("va"), col("vb")), 6).as("c"))
      .filter(col("c") >= 0.45)
    t("repPairs noop") { repPairs.write.format("noop").mode("overwrite").save() }
    spark.stop()
  }
}
