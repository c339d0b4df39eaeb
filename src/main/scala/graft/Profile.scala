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
    // phase breakdown of buildIndex
    val keyed = eAll.select(col("vec_id"), col("v"), xxhash64(col("v")).as("gid"))
    val reps = t("reps groupBy+cache+count") {
      val r = keyed.groupBy("gid")
        .agg(min("vec_id").as("vec_id"), min_by(col("v"), col("vec_id")).as("v"))
        .cache()
      r.count(); r
    }
    val nReps = reps.count()
    t("buildGraph(reps) materialize") {
      GraphAnnOps.buildGraph(reps.select("vec_id", "v"), nHint = nReps).count()
    }
    // inner phases of buildGraph(reps)
    locally {
      val e = reps.select("vec_id", "v")
      val planes = GraphAnnOps.planesFor(nReps)
      val withKeys = e.select(col("vec_id"), col("v"),
        graft.queries.VectorOps.lshKeys(col("v"), planes, GraphAnnOps.Bands).as("keys"))
      val keyed = withKeys.select(col("vec_id"), col("v"), col("keys"),
        explode(col("keys")).as("band")).cache()
      t("bg: keyed explode+cache") { keyed.count() }
      val joined = keyed.alias("l").join(keyed.alias("r"), Seq("band"))
        .filter(col("l.vec_id") =!= col("r.vec_id"))
      t("bg: join no-minband count") { joined.count() }
      val pairsNoCos = joined
        .filter(col("band") === array_min(array_intersect(col("l.keys"), col("r.keys"))))
      t("bg: +minband filter count") { pairsNoCos.count() }
      val pairs = pairsNoCos.select(col("l.vec_id").as("q_id"), col("r.vec_id").as("neighbor_id"),
        graft.functions.GraftFunctions.cosineSim(col("l.v"), col("r.v")).as("sim"))
      t("bg: +cosine noop") { pairs.write.format("noop").mode("overwrite").save() }
      val directed = pairs.groupBy("q_id")
        .agg(graft.functions.GraftFunctions
          .boundedTopK(col("sim"), col("neighbor_id"), GraphAnnOps.Degree).as("top"))
        .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "t")))
      t("bg: +topK noop") { directed.write.format("noop").mode("overwrite").save() }
      keyed.unpersist()
    }
    val l1nP = math.max(32, math.ceil(math.sqrt(nReps.toDouble)).toInt)
    val layer1 = t("layer1 sort+limit+cache") {
      val l = reps.select("vec_id", "v")
        .sort(md5(col("vec_id").cast("string")), col("vec_id")).limit(l1nP).cache()
      l.count(); l
    }
    t("buildGraph(layer1) materialize") {
      GraphAnnOps.buildGraph(layer1, nHint = l1nP).count()
    }
    spark.catalog.clearCache()
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
    // BPE phase breakdown
    locally {
      import graft.queries.BpeOps
      sys.props("graft.bpe.profile") = "1"
      t("bpe warmup encodeStats full") {
        BpeOps.encodeStats(Tables(spark, dir, "documents"))
          .write.format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      t("bpe timed encodeStats full") {
        BpeOps.encodeStats(Tables(spark, dir, "documents"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    // e2e_v2 with per-stage timing
    locally {
      sys.props("graft.dag.profile") = "1"
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      t("e2e_v2 warmup") {
        graft.queries.PipelineE2E2.runChain(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      t("e2e_v2 timed") {
        graft.queries.PipelineE2E2.runChain(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
