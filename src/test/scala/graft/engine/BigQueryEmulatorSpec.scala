package graft.engine

import org.apache.spark.sql.functions._
import org.scalatest.Checkpoints

import graft.SparkSpec

/** Opt-in live check of the BigQueryResolver surface against a local
  * BigQuery emulator (r15 verdict task 8). The sandbox has zero egress
  * and no connector jar, so the LIVE part runs only when the operator
  * points it somewhere: `-Dgraft.bq.emulator=<host:port>` (or env
  * `GRAFT_BQ_EMULATOR`) with the spark-bigquery connector on the
  * classpath — then resolve/query/persist round-trip through the
  * emulator via the public bigQueryHttpEndpoint /
  * bigQueryStorageGrpcEndpoint connector options. Without the
  * property the live test CANCELS (reported, not silently green).
  *
  * The option-contract half runs unconditionally: an endpoint-bearing
  * resolver must put both endpoint options into every reader/query/
  * writer option map, and an endpoint-free one must put neither
  * (so production paths are byte-identical to r15's).
  */
class BigQueryEmulatorSpec extends SparkSpec with Checkpoints {

  private def emulatorHost: Option[String] =
    sys.props.get("graft.bq.emulator").orElse(sys.env.get("GRAFT_BQ_EMULATOR"))
      .filter(_.nonEmpty)

  test("endpoint override rides every connector option map; absent by default") {
    val r = new BigQueryResolver(
      defaultProject = Some("p"), defaultDataset = Some("d"),
      materializationDataset = Some("mat"), endpoint = Some("localhost:9050"))
    val cp = new Checkpoint
    for (opts <- Seq(r.readerOptions("t"), r.queryOptions("SELECT 1"),
        r.writerOptions("t"))) {
      cp(assert(opts.get("bigQueryHttpEndpoint").contains("localhost:9050")))
      cp(assert(opts.get("bigQueryStorageGrpcEndpoint").contains("localhost:9050")))
    }
    val plain = new BigQueryResolver(defaultProject = Some("p"), defaultDataset = Some("d"))
    for (opts <- Seq(plain.readerOptions("t"), plain.queryOptions("SELECT 1"),
        plain.writerOptions("t"))) {
      cp(assert(!opts.contains("bigQueryHttpEndpoint")))
      cp(assert(!opts.contains("bigQueryStorageGrpcEndpoint")))
    }
    cp.reportAll()
  }

  test("live emulator round-trip: persist, resolve, query (opt-in)") {
    assume(emulatorHost.isDefined,
      "no BigQuery emulator configured — set -Dgraft.bq.emulator=<host:port> to run")
    val host = emulatorHost.get
    val r = new BigQueryResolver(
      defaultProject = Some(sys.props.getOrElse("graft.bq.project", "test-project")),
      defaultDataset = Some(sys.props.getOrElse("graft.bq.dataset", "graft_ds")),
      endpoint = Some(host))
    import spark.implicits._
    val df = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0))
      .toDF("id", "k", "v")
    r.persist(df, "emulator_roundtrip")
    val back = r.resolve(spark, "emulator_roundtrip")
    assert(back.count() == 3L)
    assert(back.agg(sum("v")).collect()(0).getDouble(0) == 60.0)
    val q = r.query(spark,
      "SELECT k, SUM(v) AS s FROM graft_ds.emulator_roundtrip GROUP BY k")
    assert(q.collect().map(row => row.getString(0) -> row.getDouble(1)).toMap ==
      Map("a" -> 40.0, "b" -> 20.0))
  }
}
