package graft
import org.apache.spark.sql.SparkSession
object AbConf {
  def main(args: Array[String]): Unit = {
    val withConf = args.headOption.contains("on")
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", (4*1024*1024).toString)
      .config("spark.ui.enabled", "false")
    val spark = (if (withConf)
      b.config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
    else b).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      System.err.println(f"[ab] $name ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    for (q <- Seq("text_perplexity_filter", "text_dup_fraction", "text_bigram_lm")) {
      for (i <- 0 until 3) {
        t(s"$q run$i") {
          SparkEntry.queries(q)(spark, dir).write.format("noop").mode("overwrite").save()
        }
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        System.gc()
      }
    }
    spark.stop()
  }
}
