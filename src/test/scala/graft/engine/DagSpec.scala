package graft.engine

import java.nio.file.Files

import graft.SparkSpec

/** Mirrors the reference's pipeline test suite semantics
  * (reference: src/session/pipeline.rs tests + adaptors dag_test.clj).
  */
class DagSpec extends SparkSpec {

  private def freshDag(): (GraftSession, Dag) = {
    val s = new SessionManager(spark).create()
    (s, new Dag(s, Some(Files.createTempDirectory("dagspec"))))
  }

  test("register extracts dependencies from SQL, not CTE names") {
    val (_, dag) = freshDag()
    dag.register(Seq(DagTable.source("users", Seq("id" -> "INT64"))))
    val infos = dag.register(Seq(DagTable.derived("active",
      "WITH tmp AS (SELECT id FROM users) SELECT * FROM tmp")))
    assert(infos == Seq("active" -> Seq("users")))
  }

  test("dependency detection is case-insensitive") {
    val (_, dag) = freshDag()
    dag.register(Seq(DagTable.source("MyTable", Seq("v" -> "INT64"))))
    val infos = dag.register(Seq(DagTable.derived("derived", "SELECT * FROM mytable")))
    assert(infos == Seq("derived" -> Seq("MyTable")))
  }

  test("later registration re-resolves earlier tables' dependencies") {
    val (_, dag) = freshDag()
    dag.register(Seq(DagTable.derived("d", "SELECT * FROM src")))
    assert(dag.getTables.find(_._1 == "d").get._4.isEmpty)
    dag.register(Seq(DagTable.source("src", Seq("v" -> "INT64"))))
    assert(dag.getTables.find(_._1 == "d").get._4 == Seq("src"))
  }

  test("chain executes in dependency order and computes correct values") {
    val (s, dag) = freshDag()
    dag.register(Seq(
      DagTable.source("raw", Seq("n" -> "INT64"), Seq(Seq(1), Seq(2), Seq(3))),
      DagTable.derived("doubled", "SELECT n * 2 AS n FROM raw"),
      DagTable.derived("plus_ten", "SELECT n + 10 AS n FROM doubled")))
    val res = dag.run()
    assert(res.allSucceeded)
    assert(res.succeeded.indexOf("raw") < res.succeeded.indexOf("doubled"))
    assert(res.succeeded.indexOf("doubled") < res.succeeded.indexOf("plus_ten"))
    val out = s.sql("SELECT n FROM plus_ten ORDER BY n").collect().map(_.getLong(0)).toSeq
    assert(out == Seq(12L, 14L, 16L))
  }

  test("diamond topology levels") {
    val (_, dag) = freshDag()
    dag.register(Seq(
      DagTable.source("root", Seq("x" -> "INT64"), Seq(Seq(10))),
      DagTable.derived("left", "SELECT x + 1 AS x FROM root"),
      DagTable.derived("right", "SELECT x - 1 AS x FROM root"),
      DagTable.derived("bottom", "SELECT l.x AS lx, r.x AS rx FROM left l, right r")))
    val levels = dag.topoLevels(Set("root", "left", "right", "bottom"))
    assert(levels == Seq(Seq("root"), Seq("left", "right"), Seq("bottom")))
    val res = dag.run()
    assert(res.allSucceeded)
  }

  test("run with targets executes only the dependency closure") {
    val (s, dag) = freshDag()
    dag.register(Seq(
      DagTable.source("a", Seq("v" -> "INT64"), Seq(Seq(1))),
      DagTable.source("b", Seq("v" -> "INT64"), Seq(Seq(2))),
      DagTable.derived("from_a", "SELECT v * 10 AS v FROM a"),
      DagTable.derived("from_b", "SELECT v * 10 AS v FROM b")))
    val res = dag.run(Some(Seq("from_a")))
    assert(res.succeeded.toSet == Set("a", "from_a"))
    assert(s.sql("SELECT v FROM from_a").collect()(0).getLong(0) == 10L)
    assertThrows[Exception](s.sql("SELECT v FROM from_b").collect())
  }

  test("failed table blocks dependents; retryFailed re-runs them") {
    val (s, dag) = freshDag()
    dag.register(Seq(
      DagTable.source("src", Seq("v" -> "INT64"), Seq(Seq(5))),
      DagTable.derived("bad", "SELECT no_such_column FROM src"),
      DagTable.derived("child", "SELECT * FROM bad")))
    val res = dag.run()
    assert(res.succeeded == Seq("src"))
    assert(res.failed.map(_.table) == Seq("bad"))
    assert(res.skipped == Seq("child"))

    // Fix the broken table, then retry only failed+skipped.
    dag.register(Seq(DagTable.derived("bad", "SELECT v AS fixed FROM src")))
    val retry = dag.retryFailed(res)
    assert(retry.allSucceeded)
    assert(retry.succeeded.toSet == Set("bad", "child"))
    assert(s.sql("SELECT fixed FROM child").collect()(0).getLong(0) == 5L)
  }

  test("re-running reflects upstream changes (materialized snapshot semantics)") {
    // Mirrors reference test_rerun_computed_table_reflects_source_changes:
    // the source lives in the session, the DAG holds only the derived table.
    val (s, dag) = freshDag()
    s.createTable("counter", Seq("n" -> "INT64"))
    s.insert("counter", Seq(Seq(1)))
    dag.register(Seq(DagTable.derived("doubled", "SELECT n * 2 AS n FROM counter")))
    assert(dag.run().allSucceeded)
    assert(s.sql("SELECT SUM(n) FROM doubled").collect()(0).getLong(0) == 2L)
    s.insert("counter", Seq(Seq(10)))
    assert(dag.run().allSucceeded)
    assert(s.sql("SELECT SUM(n) FROM doubled").collect()(0).getLong(0) == 22L)
  }

  test("cycles are rejected") {
    val (_, dag) = freshDag()
    dag.register(Seq(
      DagTable.derived("x", "SELECT * FROM y"),
      DagTable.derived("y", "SELECT * FROM x")))
    // Typed taxonomy: cycles surface as the reference's InvalidRequest
    // family (-32600) with a distinct kind.
    val e = intercept[graft.api.GraftError.CircularDependency](dag.run())
    assert(e.code == -32600)
  }

  test("level-parallel execution matches serial results") {
    val (s, dag) = freshDag()
    dag.register(
      DagTable.source("base", Seq("v" -> "INT64"), Seq(Seq(1))) +:
        (0 until 6).map(i => DagTable.derived(s"branch_$i", s"SELECT v + $i AS v FROM base")))
    val res = dag.run(maxConcurrency = 4)
    assert(res.allSucceeded)
    (0 until 6).foreach { i =>
      assert(s.sql(s"SELECT v FROM branch_$i").collect()(0).getLong(0) == 1L + i)
    }
  }

  test("slot scheduling: a fast branch's dependent finishes while the slow sibling still runs") {
    // Diamond-ish DAG: root → {slow, fast}, fast → fast_child. Under the
    // old level-barrier executor fast_child could not START until slow
    // finished; under ready-queue slots it must COMPLETE before slow does
    // (slow sleeps 10s — wide margin so a CPU-starved machine running
    // the suite under load can't make the trivial 1-row fast_child
    // materialization lose the race and flake the test).
    val (s, dag) = freshDag()
    s.spark.udf.register("dagspec_sleep_ident",
      (ms: Int, x: Long) => { Thread.sleep(ms); x })
    dag.register(Seq(
      DagTable.source("root", Seq("x" -> "INT64"), Seq(Seq(10))),
      DagTable.derived("slow", "SELECT dagspec_sleep_ident(10000, x) AS x FROM root"),
      DagTable.derived("fast", "SELECT x + 1 AS x FROM root"),
      DagTable.derived("fast_child", "SELECT x * 2 AS x FROM fast")))
    val res = dag.run(maxConcurrency = 4)
    assert(res.allSucceeded)
    // succeeded is appended in completion order.
    assert(res.succeeded.indexOf("fast_child") < res.succeeded.indexOf("slow"),
      s"fast_child waited for the slow sibling: ${res.succeeded}")
    assert(s.sql("SELECT x FROM fast_child").collect()(0).getLong(0) == 22L)
    assert(s.sql("SELECT x FROM slow").collect()(0).getLong(0) == 10L)
  }

  test("critical-path priority: the chain head starts before an alphabetically-earlier leaf") {
    // One slot, two ready roots: "a_leaf" (no dependents) and "z1", the
    // head of a 3-deep chain. Name-order scheduling would start a_leaf
    // first; critical-path priority must start z1 (height 3) so the
    // chain — the DAG's makespan — begins immediately. With one slot,
    // completion order equals start order.
    val (_, dag) = freshDag()
    dag.register(Seq(
      DagTable.source("a_leaf", Seq("v" -> "INT64"), Seq(Seq(1))),
      DagTable.source("z1", Seq("v" -> "INT64"), Seq(Seq(2))),
      DagTable.derived("z2", "SELECT v + 1 AS v FROM z1"),
      DagTable.derived("z3", "SELECT v + 1 AS v FROM z2")))
    val res = dag.run(maxConcurrency = 1)
    assert(res.allSucceeded)
    assert(res.succeeded.indexOf("z1") < res.succeeded.indexOf("a_leaf"),
      s"scheduler ignored the critical path: ${res.succeeded}")
  }

  test("cost priority: the expensive ready table preempts a cheap same-height one") {
    // One slot, two ready derived leaves of EQUAL height: "a_cheap"
    // (selects a 1-row table) and "b_pricey" (selects a 200k-row view).
    // Height alone ties and name order would start a_cheap; the
    // Catalyst-stats cost estimate must start b_pricey first so the
    // long pole overlaps everything else. With one slot, completion
    // order equals start order.
    val (s, dag) = freshDag()
    dag.register(Seq(
      DagTable.source("m_small", Seq("v" -> "INT64"), Seq(Seq(1))),
      DagTable.view("m_big", s.spark.range(200000).toDF("v")),
      DagTable.derived("a_cheap", "SELECT v FROM m_small"),
      DagTable.derived("b_pricey", "SELECT v FROM m_big")))
    val res = dag.run(maxConcurrency = 1)
    assert(res.allSucceeded)
    assert(res.succeeded.indexOf("b_pricey") < res.succeeded.indexOf("a_cheap"),
      s"scheduler ignored the cost estimate: ${res.succeeded}")
    // A profile-fed override outranks the built-in estimate: declare
    // a_cheap the expensive one and the order flips.
    val res2 = dag.run(maxConcurrency = 1,
      costOf = n => if (n == "a_cheap") Some(Long.MaxValue) else Some(0L))
    assert(res2.allSucceeded)
    assert(res2.succeeded.indexOf("a_cheap") < res2.succeeded.indexOf("b_pricey"),
      s"scheduler ignored the cost override: ${res2.succeeded}")
  }

  test("a skip chain deeper than one level fully resolves (no stranded tables)") {
    // a fails → b skipped → c skipped: the reference's single-pass skip
    // (pipeline.rs:327) would strand c with nothing in flight; the
    // fixpoint propagation must mark both in one run.
    val (_, dag) = freshDag()
    dag.register(Seq(
      DagTable.source("src2", Seq("v" -> "INT64"), Seq(Seq(1))),
      DagTable.derived("a", "SELECT no_such FROM src2"),
      DagTable.derived("b", "SELECT * FROM a"),
      DagTable.derived("c", "SELECT * FROM b")))
    val res = dag.run(maxConcurrency = 2)
    assert(res.succeeded == Seq("src2"))
    assert(res.failed.map(_.table) == Seq("a"))
    assert(res.skipped.sorted == Seq("b", "c"))
  }

  test("BQ_MAX_CONCURRENCY-style default keeps full-run results identical to serial") {
    val (s, dag) = freshDag()
    dag.register(
      DagTable.source("base2", Seq("v" -> "INT64"), Seq(Seq(3))) +:
        (0 until 5).map(i => DagTable.derived(s"t2_$i", s"SELECT v * ${i + 1} AS v FROM base2")))
    val par = dag.run() // default: env BQ_MAX_CONCURRENCY or 8 slots
    val ser = dag.run(maxConcurrency = 1)
    assert(par.allSucceeded && ser.allSucceeded)
    assert(par.succeeded.toSet == ser.succeeded.toSet)
    (0 until 5).foreach { i =>
      assert(s.sql(s"SELECT v FROM t2_$i").collect()(0).getLong(0) == 3L * (i + 1))
    }
  }

  test("clear drops views and registry") {
    val (s, dag) = freshDag()
    dag.register(Seq(DagTable.source("tmp", Seq("v" -> "INT64"), Seq(Seq(42)))))
    dag.run()
    assert(s.sql("SELECT v FROM tmp").collect()(0).getLong(0) == 42L)
    dag.clear()
    assert(dag.getTables.isEmpty)
    assertThrows[Exception](s.sql("SELECT v FROM tmp").collect())
  }
}
