package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up generator for the SCALING bench (SURVEY §6j):
  * replicates the driver-generated sf0.1 tables `factor`× with
  * key-space offsets, preserving referential integrity (each replica's
  * orders reference that replica's customers/parts/suppliers; the
  * fixed-size region/nation dims are shared, as in TPC-H). Document
  * text is word-salted per replica (`r<i>_word`) so replicas introduce
  * NO cross-replica n-gram near-dups — the dedup workload's candidate
  * structure scales linearly like a real corpus instead of exploding
  * quadratically on self-copies. Embedding vectors are copied verbatim
  * (ANN cost is corpus size, not value distribution; probe queries stay
  * the original vec_id < 10).
  *
  * Usage: `sbt "runMain graft.ScaleGen /root/testdata/sf0.1 /tmp/sf1 10"`
  */
object ScaleGen {

  /** Key offset between replicas — far above any base-table key. */
  private val Off = 100000000L

  def main(args: Array[String]): Unit = {
    val (src, dst, factor) =
      (args(0), args(1), if (args.length > 2) args(2).toInt else 10)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def replicate(name: String, keyCols: Seq[String], saltText: Boolean = false): Unit = {
      val base = Tables(spark, src, name)
      val rep = base
        .withColumn("__r", explode(sequence(lit(0), lit(factor - 1))))
      val keyed = keyCols.foldLeft(rep) { (df, k) =>
        df.withColumn(k, col(k) + col("__r").cast("long") * Off)
      }
      val salted =
        if (saltText)
          keyed.withColumn("text",
            when(col("__r") === 0, col("text"))
              .otherwise(regexp_replace(col("text"), lit("(\\S+)"),
                concat(lit("r"), col("__r"), lit("_$1")))))
        else keyed
      salted.drop("__r")
        .write.mode("overwrite").parquet(s"$dst/$name.parquet")
      System.err.println(s"[scalegen] $name x$factor written")
    }

    // Fixed dims copy through unchanged.
    Seq("region", "nation").foreach { n =>
      Tables(spark, src, n).write.mode("overwrite").parquet(s"$dst/$n.parquet")
    }
    replicate("customer", Seq("c_custkey"))
    replicate("supplier", Seq("s_suppkey"))
    replicate("part", Seq("p_partkey"))
    replicate("orders", Seq("o_orderkey", "o_custkey"))
    replicate("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))
    replicate("events", Seq("event_id", "user_id"))
    replicate("documents", Seq("doc_id"), saltText = true)
    replicate("embeddings", Seq("vec_id"))
    spark.stop()
  }
}
