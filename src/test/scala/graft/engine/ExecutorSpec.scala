package graft.engine

import graft.SparkSpec
import graft.api.GraftError

/** The executor seam (reference src/executor/mod.rs ExecutorMode):
  * sessions resolve tables through a pluggable [[TableResolver]], and
  * the remote backend has a concrete, verifiable integration point even
  * though the connector jar cannot exist in this environment.
  */
class ExecutorSpec extends SparkSpec {

  test("backend flag parses like the reference CLI") {
    assert(ExecutorMode.parse("mock") == ExecutorMode.Local)
    assert(ExecutorMode.parse("bigquery") == ExecutorMode.BigQuery)
    val e = intercept[GraftError.InvalidParams](ExecutorMode.parse("duckdb"))
    assert(e.code == -32600)
  }

  test("local resolver resolves session views and types missing tables") {
    val mgr = new SessionManager(spark)
    val s = mgr.create()
    s.createTable("resolver_t", Seq("v" -> "INT64"))
    assert(s.resolver.mode == ExecutorMode.Local)
    assert(s.table("resolver_t").columns.toSeq == Seq("v"))
    val e = intercept[GraftError.UnknownTable](s.table("resolver_missing"))
    assert(e.code == -32000)
  }

  test("BigQuery resolver builds the connector read and fails typed without the jar") {
    val r = new BigQueryResolver(
      defaultProject = Some("proj"),
      defaultDataset = Some("ds"),
      materializationDataset = Some("scratch"))
    assert(r.mode == ExecutorMode.BigQuery)
    // BigQuery default-qualification rules.
    assert(r.qualifiedName("t") == "proj.ds.t")
    assert(r.qualifiedName("other_ds.t") == "proj.other_ds.t")
    assert(r.qualifiedName("p.d.t") == "p.d.t")
    assert(r.readerOptions("t") == Map(
      "table" -> "proj.ds.t", "parentProject" -> "proj", "materializationDataset" -> "scratch"))

    // Without the connector jar the failure is a typed QueryError, not a
    // bare ClassNotFound.
    val e = intercept[GraftError.QueryError](r.resolve(spark, "t"))
    assert(e.code == -32000)
    assert(e.getMessage.contains("spark-bigquery connector"))

    val unqualified = new BigQueryResolver()
    val e2 = intercept[GraftError.InvalidParams](unqualified.qualifiedName("t"))
    assert(e2.getMessage.contains("default dataset"))
  }

  test("sessions created through a BigQuery-mode manager carry the remote resolver") {
    val mgr = new SessionManager(spark)
    val s = mgr.create(new BigQueryResolver(defaultProject = Some("p"), defaultDataset = Some("d")))
    assert(s.resolver.mode == ExecutorMode.BigQuery)
    // Session views still win over the remote backend (temp tables are
    // session-local in BigQuery too).
    s.createTable("local_first", Seq("v" -> "INT64"))
    assert(s.table("local_first").columns.toSeq == Seq("v"))
    // An unregistered name routes to the connector path.
    val e = intercept[GraftError.QueryError](s.table("remote_only"))
    assert(e.getMessage.contains("p.d.remote_only"))
  }
}
