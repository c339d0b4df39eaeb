package graft

import graft.api.GraftRpc

/** Replays the reference's DAG and client test suites VERBATIM through the
  * RPC facade — same table schemas, same rows, same SQL text, same
  * expected results (reference: adaptors/clojure/test/bq_runner/
  * dag_test.clj and client_test.clj). Transport-only tests (process
  * connect/close) map to their session-lifecycle analogs; everything that
  * exercises engine semantics is reproduced one-for-one.
  */
class ReferenceDagClientParitySpec extends SparkSpec {

  private lazy val rpc = new GraftRpc(spark)

  private def newSession(): String =
    rpc.dispatch("bq.createSession").asInstanceOf[Map[String, Any]]("sessionId").toString

  private def call(method: String, s: String, params: (String, Any)*): Any =
    rpc.dispatch(method, (params :+ ("sessionId" -> (s: Any))).toMap)

  private def registerDag(s: String, tables: Seq[Map[String, Any]]): Seq[Map[String, Any]] = {
    val resp = call("bq.registerDag", s, "tables" -> tables).asInstanceOf[Map[String, Any]]
    assert(resp("success") == true)
    resp("tables").asInstanceOf[Seq[Map[String, Any]]]
  }

  private def src(name: String, schema: Seq[(String, String)], rows: Seq[Seq[Any]]): Map[String, Any] =
    Map("name" -> name,
      "schema" -> schema.map { case (n, t) => Map("name" -> n, "type" -> t) },
      "rows" -> rows)

  private def derived(name: String, sql: String): Map[String, Any] =
    Map("name" -> name, "sql" -> sql)

  /** bq.query → rows as (columnName → value) maps, like the Clojure client. */
  private def q(s: String, sql: String): Seq[Map[String, Any]] = {
    val resp = call("bq.query", s, "sql" -> sql).asInstanceOf[Map[String, Any]]
    val fields = resp("schema").asInstanceOf[Map[String, Any]]("fields")
      .asInstanceOf[Seq[Map[String, Any]]].map(_("name").toString)
    resp("rows").asInstanceOf[Seq[Map[String, Any]]].map { r =>
      fields.zip(r("f").asInstanceOf[Seq[Map[String, Any]]].map(_("v"))).toMap
    }
  }

  // ---- dag_test.clj ----

  test("dag_test.clj test-register-dag-source-table") {
    val s = newSession()
    val result = registerDag(s, Seq(
      src("users", Seq("id" -> "INT64", "name" -> "STRING"), Seq(Seq(1, "Alice"), Seq(2, "Bob")))))
    assert(result.size == 1)
    assert(result.head("name") == "users")
    assert(result.head("dependencies") == Nil)
  }

  test("dag_test.clj test-register-dag-derived-table") {
    val s = newSession()
    val result = registerDag(s, Seq(
      src("users", Seq("id" -> "INT64", "name" -> "STRING"), Seq(Seq(1, "Alice"))),
      derived("report", "SELECT * FROM users WHERE id > 0")))
    assert(result.size == 2)
    val report = result.find(_("name") == "report").get
    assert(report("dependencies") == Seq("users"))
  }

  test("dag_test.clj test-run-dag-simple") {
    val s = newSession()
    registerDag(s, Seq(
      src("source_data", Seq("id" -> "INT64", "value" -> "STRING"),
        Seq(Seq(1, "hello"), Seq(2, "world"))),
      derived("transformed", "SELECT id, UPPER(value) as upper_value FROM source_data")))
    val run = call("bq.runDag", s).asInstanceOf[Map[String, Any]]
    assert(run("success") == true)
    assert(run("succeededTables").asInstanceOf[Seq[String]].size == 2)
    assert(q(s, "SELECT * FROM transformed ORDER BY id") ==
      Seq(Map("id" -> 1L, "upper_value" -> "HELLO"), Map("id" -> 2L, "upper_value" -> "WORLD")))
  }

  test("dag_test.clj test-run-dag-with-target") {
    val s = newSession()
    registerDag(s, Seq(
      src("a", Seq("x" -> "INT64"), Seq(Seq(1))),
      src("b", Seq("x" -> "INT64"), Seq(Seq(2))),
      derived("from_a", "SELECT x * 10 as x FROM a"),
      derived("from_b", "SELECT x * 100 as x FROM b")))
    val run = call("bq.runDag", s, "tableNames" -> Seq("from_a")).asInstanceOf[Map[String, Any]]
    assert(run("success") == true)
    val ok = run("succeededTables").asInstanceOf[Seq[String]]
    assert(ok.contains("a") && ok.contains("from_a"))
    assert(!ok.contains("from_b"))
    assert(q(s, "SELECT * FROM from_a") == Seq(Map("x" -> 10L)))
  }

  test("dag_test.clj test-dag-chain") {
    val s = newSession()
    registerDag(s, Seq(
      src("raw", Seq("value" -> "INT64"), Seq(Seq(10), Seq(20), Seq(30))),
      derived("step1", "SELECT value * 2 as value FROM raw"),
      derived("step2", "SELECT value + 1 as value FROM step1"),
      derived("final", "SELECT SUM(value) as total FROM step2")))
    call("bq.runDag", s, "tableNames" -> Seq("final"))
    assert(q(s, "SELECT * FROM final") == Seq(Map("total" -> 123L)))
  }

  test("dag_test.clj test-dag-diamond") {
    val s = newSession()
    registerDag(s, Seq(
      src("source", Seq("n" -> "INT64"), Seq(Seq(1), Seq(2), Seq(3))),
      derived("double_it", "SELECT n * 2 as doubled FROM source"),
      derived("triple_it", "SELECT n * 3 as tripled FROM source"),
      derived("combined",
        "SELECT d.doubled, t.tripled FROM double_it d, triple_it t WHERE d.doubled = t.tripled - 1")))
    call("bq.runDag", s, "tableNames" -> Seq("combined"))
    assert(q(s, "SELECT * FROM combined") == Seq(Map("doubled" -> 2L, "tripled" -> 3L)))
  }

  test("dag_test.clj test-get-dag") {
    val s = newSession()
    registerDag(s, Seq(
      src("src", Seq("x" -> "INT64"), Seq(Seq(1))),
      derived("derived", "SELECT x FROM src")))
    val tables = call("bq.getDag", s).asInstanceOf[Map[String, Any]]("tables")
      .asInstanceOf[Seq[Map[String, Any]]]
    assert(tables.size == 2)
    val srcT = tables.find(_("name") == "src").get
    val derT = tables.find(_("name") == "derived").get
    assert(srcT("isSource") == true)
    assert(derT("isSource") == false)
    assert(derT("dependencies") == Seq("src"))
  }

  test("dag_test.clj test-clear-dag") {
    val s = newSession()
    registerDag(s, Seq(
      src("a", Seq("x" -> "INT64"), Seq(Seq(1))),
      derived("b", "SELECT * FROM a")))
    def dagTables() = call("bq.getDag", s).asInstanceOf[Map[String, Any]]("tables").asInstanceOf[Seq[_]]
    assert(dagTables().size == 2)
    call("bq.clearDag", s)
    assert(dagTables().isEmpty)
  }

  test("dag_test.clj test-dag-aggregation") {
    val s = newSession()
    registerDag(s, Seq(
      src("sales", Seq("region" -> "STRING", "amount" -> "FLOAT64"),
        Seq(Seq("East", 100.0), Seq("East", 150.0), Seq("West", 200.0), Seq("West", 250.0))),
      derived("region_totals", "SELECT region, SUM(amount) as total FROM sales GROUP BY region"),
      derived("summary", "SELECT COUNT(*) as num_regions, SUM(total) as grand_total FROM region_totals")))
    call("bq.runDag", s)
    assert(q(s, "SELECT * FROM summary") == Seq(Map("num_regions" -> 2L, "grand_total" -> 700.0)))
  }

  test("dag_test.clj test-dag-join") {
    val s = newSession()
    registerDag(s, Seq(
      src("customers", Seq("id" -> "INT64", "name" -> "STRING"), Seq(Seq(1, "Alice"), Seq(2, "Bob"))),
      src("orders", Seq("customer_id" -> "INT64", "amount" -> "FLOAT64"),
        Seq(Seq(1, 100.0), Seq(1, 200.0), Seq(2, 150.0))),
      derived("customer_orders",
        "SELECT c.name, SUM(o.amount) as total FROM customers c JOIN orders o ON c.id = o.customer_id GROUP BY c.name")))
    call("bq.runDag", s)
    assert(q(s, "SELECT * FROM customer_orders ORDER BY name") ==
      Seq(Map("name" -> "Alice", "total" -> 300.0), Map("name" -> "Bob", "total" -> 150.0)))
  }

  test("dag_test.clj test-dag-cte") {
    val s = newSession()
    registerDag(s, Seq(
      src("numbers", Seq("n" -> "INT64"), Seq(Seq(1), Seq(2), Seq(3), Seq(4), Seq(5))),
      derived("stats",
        """WITH evens AS (SELECT n FROM numbers WHERE n % 2 = 0)
          |SELECT COUNT(*) as even_count FROM evens""".stripMargin)))
    call("bq.runDag", s)
    assert(q(s, "SELECT * FROM stats") == Seq(Map("even_count" -> 2L)))
  }

  test("dag_test.clj test-dag-window-functions") {
    val s = newSession()
    registerDag(s, Seq(
      src("employees", Seq("dept" -> "STRING", "salary" -> "FLOAT64"),
        Seq(Seq("Sales", 50000.0), Seq("Sales", 60000.0), Seq("IT", 70000.0), Seq("IT", 80000.0))),
      derived("ranked",
        "SELECT dept, salary, ROW_NUMBER() OVER (PARTITION BY dept ORDER BY salary DESC) as rank FROM employees")))
    call("bq.runDag", s)
    assert(q(s, "SELECT * FROM ranked WHERE rank = 1 ORDER BY dept") ==
      Seq(Map("dept" -> "IT", "salary" -> 80000.0, "rank" -> 1),
        Map("dept" -> "Sales", "salary" -> 60000.0, "rank" -> 1)))
  }

  test("dag_test.clj test-dag-multiple-source-tables") {
    val s = newSession()
    registerDag(s, Seq(
      src("products", Seq("id" -> "INT64", "name" -> "STRING", "price" -> "FLOAT64"),
        Seq(Seq(1, "Widget", 10.0), Seq(2, "Gadget", 20.0))),
      src("inventory", Seq("product_id" -> "INT64", "quantity" -> "INT64"),
        Seq(Seq(1, 100), Seq(2, 50))),
      derived("product_value",
        "SELECT p.name, p.price * i.quantity as total_value FROM products p JOIN inventory i ON p.id = i.product_id")))
    call("bq.runDag", s)
    assert(q(s, "SELECT * FROM product_value ORDER BY name") ==
      Seq(Map("name" -> "Gadget", "total_value" -> 1000.0), Map("name" -> "Widget", "total_value" -> 1000.0)))
  }

  test("dag_test.clj test-dag-empty-source") {
    val s = newSession()
    registerDag(s, Seq(
      src("empty_source", Seq("id" -> "INT64"), Nil),
      derived("derived", "SELECT COUNT(*) as cnt FROM empty_source")))
    call("bq.runDag", s)
    assert(q(s, "SELECT * FROM derived") == Seq(Map("cnt" -> 0L)))
  }

  test("dag_test.clj test-dag-reregister") {
    val s = newSession()
    registerDag(s, Seq(src("data", Seq("x" -> "INT64"), Seq(Seq(1)))))
    call("bq.runDag", s)
    assert(q(s, "SELECT * FROM data") == Seq(Map("x" -> 1L)))

    // Reference semantics (pipeline.rs:556): re-registering a source
    // ACCUMULATES rows on the next run.
    registerDag(s, Seq(src("data", Seq("x" -> "INT64"), Seq(Seq(999)))))
    call("bq.runDag", s)
    assert(q(s, "SELECT * FROM data ORDER BY x") == Seq(Map("x" -> 1L), Map("x" -> 999L)))

    call("bq.clearDag", s)
    registerDag(s, Seq(src("data", Seq("x" -> "INT64"), Seq(Seq(42)))))
    call("bq.runDag", s)
    assert(q(s, "SELECT * FROM data") == Seq(Map("x" -> 42L)))
  }

  test("dag_test.clj test-dag-complex-pipeline") {
    val s = newSession()
    registerDag(s, Seq(
      src("events", Seq("event_type" -> "STRING", "user_id" -> "INT64", "value" -> "FLOAT64"),
        Seq(Seq("click", 1, 1.0), Seq("click", 1, 1.0), Seq("click", 2, 1.0),
          Seq("purchase", 1, 100.0), Seq("purchase", 2, 50.0))),
      derived("event_counts", "SELECT event_type, COUNT(*) as cnt FROM events GROUP BY event_type"),
      derived("user_stats", "SELECT user_id, SUM(value) as total_value FROM events GROUP BY user_id"),
      derived("top_user", "SELECT user_id, total_value FROM user_stats ORDER BY total_value DESC LIMIT 1")))
    call("bq.runDag", s)
    assert(q(s, "SELECT * FROM event_counts ORDER BY event_type") ==
      Seq(Map("event_type" -> "click", "cnt" -> 3L), Map("event_type" -> "purchase", "cnt" -> 2L)))
    assert(q(s, "SELECT * FROM top_user") == Seq(Map("user_id" -> 1L, "total_value" -> 102.0)))
  }

  // ---- directory loaders (no reference deftest exercises these; the
  // contract is the server source itself: manager.rs:282-312
  // load_sql_directory vs manager.rs:368-400 load_dag_from_directory,
  // result shapes rpc/types.rs:433/456/481). The two methods differ in
  // BOTH side effects and response shape — asserted separately here. ----

  private def catalogTree(): java.nio.file.Path = {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("loadercat")
    val ds = root.resolve("proj/mart")
    java.nio.file.Files.createDirectories(ds)
    Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "amount")
      .write.mode("overwrite").parquet(ds.resolve("facts.parquet").toString)
    java.nio.file.Files.writeString(ds.resolve("report.sql"),
      "SELECT COUNT(*) AS cnt, SUM(amount) AS total FROM facts")
    root
  }

  test("bq.loadSqlDirectory registers ONLY .sql files; LoadSqlDirectoryResult shape") {
    val s = newSession()
    val root = catalogTree()
    val resp = call("bq.loadSqlDirectory", s, "path" -> root.toString)
      .asInstanceOf[Map[String, Any]]
    assert(resp("success") == true)
    val loaded = resp("tablesLoaded").asInstanceOf[Seq[Map[String, Any]]]
    // Only the .sql file — the sibling parquet is NOT loaded (reference
    // load_sql_directory discovers sql files only).
    assert(loaded.map(_("table")) == Seq("report"))
    assert(loaded.head("project") == "proj" && loaded.head("dataset") == "mart")
    assert(loaded.head("path").toString.endsWith("report.sql"))
    assert(!loaded.head.contains("rowCount"))
    // Side effect check: no parquet view exists in the session.
    intercept[Exception] { q(s, "SELECT * FROM facts") }
    // The DAG holds the sql table as derived-only.
    val dagTables = call("bq.getDag", s).asInstanceOf[Map[String, Any]]("tables")
      .asInstanceOf[Seq[Map[String, Any]]]
    assert(dagTables.map(_("name")) == Seq("report"))
    assert(dagTables.head("isSource") == false)
    // Once the sources are loaded separately, the DAG runs.
    call("bq.loadParquetDirectory", s, "path" -> root.toString)
    val run = call("bq.runDag", s).asInstanceOf[Map[String, Any]]
    assert(run("success") == true)
    assert(q(s, "SELECT * FROM report") == Seq(Map("cnt" -> 3L, "total" -> 60.0)))
  }

  test("bq.loadDagFromDirectory loads parquet AND sql; LoadDagFromDirectoryResult shape") {
    val s = newSession()
    val root = catalogTree()
    val resp = call("bq.loadDagFromDirectory", s, "path" -> root.toString)
      .asInstanceOf[Map[String, Any]]
    assert(resp("success") == true)
    val sources = resp("sourceTables").asInstanceOf[Seq[Map[String, Any]]]
    assert(sources.map(_("table")) == Seq("facts"))
    assert(sources.head("rowCount") == 3L)
    val computed = resp("computedTables").asInstanceOf[Seq[Map[String, Any]]]
    assert(computed.map(_("table")) == Seq("report"))
    assert(!computed.head.contains("rowCount"))
    val dagInfo = resp("dagInfo").asInstanceOf[Seq[Map[String, Any]]]
    // dagInfo = the register_dag return for the COMPUTED tables only.
    assert(dagInfo == Seq(Map("name" -> "report", "dependencies" -> Seq("facts"))))
    val run = call("bq.runDag", s).asInstanceOf[Map[String, Any]]
    assert(run("success") == true)
    assert(q(s, "SELECT * FROM report") == Seq(Map("cnt" -> 3L, "total" -> 60.0)))
  }

  test("bq.loadParquetDirectory LoadParquetDirectoryResult shape") {
    val s = newSession()
    val root = catalogTree()
    val resp = call("bq.loadParquetDirectory", s, "path" -> root.toString)
      .asInstanceOf[Map[String, Any]]
    assert(resp("success") == true)
    val loaded = resp("tablesLoaded").asInstanceOf[Seq[Map[String, Any]]]
    assert(loaded.map(_("table")) == Seq("facts"))
    assert(loaded.head("rowCount") == 3L)
    assert(q(s, "SELECT COUNT(*) AS n FROM facts") == Seq(Map("n" -> 3L)))
  }

  test("directory loaders accept the reference wire key rootPath (rpc/types.rs serde rename)") {
    // The reference deserializes `rootPath` for all three directory
    // loaders (rpc/types.rs:428/451/476); `path` stays accepted for
    // earlier-round clients of this engine.
    val s = newSession()
    val root = catalogTree()
    val pq = call("bq.loadParquetDirectory", s, "rootPath" -> root.toString)
      .asInstanceOf[Map[String, Any]]
    assert(pq("success") == true)
    assert(pq("tablesLoaded").asInstanceOf[Seq[Map[String, Any]]].map(_("table")) == Seq("facts"))
    val sq = call("bq.loadSqlDirectory", s, "rootPath" -> root.toString)
      .asInstanceOf[Map[String, Any]]
    assert(sq("tablesLoaded").asInstanceOf[Seq[Map[String, Any]]].map(_("table")) == Seq("report"))
    val s2 = newSession()
    val dg = call("bq.loadDagFromDirectory", s2, "rootPath" -> root.toString)
      .asInstanceOf[Map[String, Any]]
    assert(dg("sourceTables").asInstanceOf[Seq[Map[String, Any]]].map(_("table")) == Seq("facts"))
    // Missing both keys is a loud InvalidParams naming the wire key.
    val err = intercept[graft.api.GraftError.InvalidParams] {
      call("bq.loadSqlDirectory", newSession())
    }
    assert(err.getMessage.contains("rootPath"))
  }

  // ---- client_test.clj ----

  test("client_test.clj test-ping") {
    assert(rpc.dispatch("bq.ping") == Map("message" -> "pong"))
  }

  test("client_test.clj test-session-lifecycle") {
    val id = newSession()
    assert(id.nonEmpty)
    assert(call("bq.destroySession", id) == Map("success" -> true))
  }

  test("client_test.clj test-simple-query") {
    val s = newSession()
    val result = q(s, "SELECT 1 AS num, 'hello' AS greeting")
    assert(result.size == 1)
    assert(result.head("num") == 1)
    assert(result.head("greeting") == "hello")
  }

  test("client_test.clj test-query-raw (BigQuery response shape)") {
    val s = newSession()
    val resp = call("bq.query", s, "sql" -> "SELECT 42 AS answer").asInstanceOf[Map[String, Any]]
    assert(resp("kind") == "bigquery#queryResponse")
    assert(resp.contains("schema") && resp.contains("rows"))
    assert(resp("totalRows") == "1")
    assert(resp("jobComplete") == true)
  }

  test("client_test.clj test-create-table-with-map-schema + vector-schema") {
    val s = newSession()
    call("bq.createTable", s, "tableName" -> "test_users",
      "schema" -> Seq(
        Map("name" -> "id", "type" -> "INT64"),
        Map("name" -> "name", "type" -> "STRING"),
        Map("name" -> "active", "type" -> "BOOL")))
    call("bq.createTable", s, "tableName" -> "products",
      "schema" -> Seq(
        Map("name" -> "id", "type" -> "INT64"),
        Map("name" -> "price", "type" -> "FLOAT64")))
    val names = call("bq.listTables", s).asInstanceOf[Seq[Map[String, Any]]].map(_("name"))
    assert(names.contains("test_users") && names.contains("products"))
  }

  test("client_test.clj test-insert-and-query") {
    val s = newSession()
    call("bq.createTable", s, "tableName" -> "employees",
      "schema" -> Seq(Map("name" -> "id", "type" -> "INT64"), Map("name" -> "name", "type" -> "STRING")))
    val ins = call("bq.insert", s, "tableName" -> "employees",
      "rows" -> Seq(Seq(1, "Alice"), Seq(2, "Bob"), Seq(3, "Charlie")))
    assert(ins == Map("insertedRows" -> 3L))
    val result = q(s, "SELECT * FROM employees ORDER BY id")
    assert(result.size == 3)
    assert(result.head("name") == "Alice")
    assert(result.last("name") == "Charlie")
  }

  test("client_test.clj test-aggregation-query") {
    val s = newSession()
    call("bq.createTable", s, "tableName" -> "sales",
      "schema" -> Seq(Map("name" -> "amount", "type" -> "FLOAT64")))
    call("bq.insert", s, "tableName" -> "sales", "rows" -> Seq(Seq(10.0), Seq(20.0), Seq(30.0)))
    val result = q(s, "SELECT SUM(amount) AS total, AVG(amount) AS avg FROM sales")
    assert(result.size == 1)
    assert(result.head("total") == 60.0)
  }

  test("client_test.clj test-error-handling") {
    val s = newSession()
    intercept[Exception] { q(s, "SELECT * FROM nonexistent_table") }
  }

  test("client_test.clj test-bigquery-syntax (UNNEST array literal)") {
    val s = newSession()
    assert(q(s, "SELECT * FROM UNNEST([1, 2, 3]) AS num").size == 3)
  }

  test("client_test.clj test-struct-query") {
    val s = newSession()
    val resp = call("bq.query", s, "sql" -> "SELECT STRUCT(1 AS x, 2 AS y) AS point")
      .asInstanceOf[Map[String, Any]]
    assert(resp("rows").asInstanceOf[Seq[_]].size == 1)
  }

  test("client_test.clj test-destroy-session-cleans-up-tables") {
    val s = newSession()
    call("bq.createTable", s, "tableName" -> "cleanup_test",
      "schema" -> Seq(Map("name" -> "id", "type" -> "INT64"), Map("name" -> "name", "type" -> "STRING")))
    call("bq.insert", s, "tableName" -> "cleanup_test", "rows" -> Seq(Seq(1, "test")))
    assert(q(s, "SELECT COUNT(*) as cnt FROM cleanup_test") == Seq(Map("cnt" -> 1L)))
    call("bq.destroySession", s)
    val s2 = newSession()
    intercept[Exception] { q(s2, "SELECT * FROM cleanup_test") }
  }

  // ---- client_test.clj connection-lifecycle tests: these exercise the
  // CLIENT library (reference client.clj/core.clj), so they run through
  // graft.api.GraftClient against a real spawned server process — the
  // same process boundary the Clojure tests cross. ----

  test("client_test.clj test-connection") {
    val conn = api.GraftClient.connect(TestServer.serverCommand("stdio"))
    try {
      assert(conn.connected)
      assert(conn.ping())
      conn.close()
      assert(!conn.connected)
    } finally conn.close()
  }

  test("client_test.clj test-with-session-macro + test-close-with-session-cleans-up") {
    val conn = api.GraftClient.connect(TestServer.serverCommand("stdio"))
    try {
      // with-session macro: session id non-empty, handle carries its
      // connection, session destroyed on exit (its tables are gone from
      // a later session) while the CONNECTION stays open.
      val sid = conn.withSession { s =>
        assert(s.sessionId.nonEmpty)
        assert(s.conn eq conn)
        s.createTable("macro_t", Seq("x" -> "INT64"))
        s.sessionId
      }
      assert(conn.connected, "with-session must not close the connection")
      conn.withSession { s2 =>
        assert(s2.sessionId != sid)
        intercept[api.GraftError.QueryError](s2.queryRaw("SELECT * FROM macro_t"))
      }

      // close-with-session: create/insert/query, then session.close()
      // destroys the session AND closes the whole connection.
      val session = conn.createSession()
      session.createTable("close_test", Seq("x" -> "INT64"))
      assert(session.insert("close_test", Seq(Seq(42))) == 1L)
      val rows = session.query("SELECT x FROM close_test")
      assert(rows.map(_("x").toString.toDouble.toLong) == Seq(42L))
      session.close()
      assert(!conn.connected)
    } finally conn.close()
  }
}
