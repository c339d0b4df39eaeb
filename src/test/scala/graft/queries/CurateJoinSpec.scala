package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CurateJoinSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("approx distinct counts stay within sketch error of exact") {
    val exact = graft.Tables(spark, sfDir, "events")
      .groupBy("event_type").agg(count_distinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val gate = CurateOps.defs("q_approx_distinct").run(spark, sfDir).collect()
    assert(gate.map(_.getString(0)).toSet == exact.keySet)
    gate.foreach { r =>
      assert(r.getAs[Long]("exact_users") == exact(r.getString(0)))
      assert(r.getAs[Boolean]("within_tol"), s"${r.getString(0)}: sketch out of tolerance")
    }
  }

  test("approx quantiles stay within relative tolerance of exact percentiles") {
    val gate = CurateOps.defs("q_approx_quantile").run(spark, sfDir).collect()
    val orders = graft.Tables(spark, sfDir, "orders")
    assert(gate.nonEmpty)
    gate.foreach { r =>
      val prio = r.getString(0)
      val n = orders.filter(col("o_orderpriority") === prio).count()
      assert(r.getAs[Long]("n") == n)
      Seq("p25_ok", "p50_ok", "p75_ok").foreach(cName =>
        assert(r.getAs[Boolean](cName), s"$prio $cName: sketch out of tolerance"))
    }
  }

  test("as-of join matches a driver-side reference computation") {
    import scala.collection.Searching._
    val e = graft.Tables(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), unix_timestamp(col("ts")).as("ts_s"),
        col("event_type"), col("value")).collect()
    val purchByUser = e.filter(_.getString(3) == "purchase")
      .groupBy(_.getLong(1)).map { case (u, rows) =>
        // max value per (user, sec), sorted by sec — mirrors the query's
        // deterministic pre-aggregation.
        u -> rows.groupBy(_.getLong(2)).map { case (t, rs) =>
          t -> BigDecimal(rs.map(_.getDouble(4)).max).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
        }.toArray.sortBy(_._1)
      }
    val out = JoinOps.defs("q_asof_join").run(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (u, ts) = (r.getLong(0), r.getLong(2))
      val expected = purchByUser.get(u).flatMap { arr =>
        arr.takeWhile(_._1 <= ts).lastOption
      }
      expected match {
        case None => assert(r.isNullAt(3), s"user $u ts $ts: expected no prior purchase")
        case Some((pt, pv)) =>
          assert(r.getLong(3) == pt && r.getDouble(4) == pv,
            s"user $u ts $ts: got (${r.get(3)}, ${r.get(4)}), want ($pt, $pv)")
      }
    }
  }

  test("banded range join counts equal a brute-force filter") {
    val e = graft.Tables(spark, sfDir, "events")
      .select(col("event_id"), unix_timestamp(col("ts")).as("ts_s"), col("event_type")).collect()
    val clicks = e.filter(_.getString(2) == "click").map(_.getLong(1)).sorted
    val out = JoinOps.defs("q_range_join").run(spark, sfDir).collect()
    out.foreach { r =>
      val ts = r.getLong(1)
      val expect = clicks.count(c => c >= ts - 60 && c <= ts)
      assert(r.getLong(2) == expect, s"event ${r.getLong(0)}: ${r.getLong(2)} != $expect")
    }
  }

  test("stratified sample is reproducible and capped per stratum") {
    val a = CurateOps.defs("q_sample_stratified").run(spark, sfDir).collect()
    val b = CurateOps.defs("q_sample_stratified").run(spark, sfDir).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    val perLang = a.groupBy(_.getString(1)).map { case (l, rs) => l -> rs.length }
    assert(perLang.values.forall(_ <= 50))
  }

  test("connected components label chains, triangles and bridges correctly") {
    import spark.implicits._
    // Components: {1,2,3,4} (chain), {10,11,12} (triangle), {20,21} (edge).
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L))
      .toDF("doc_a", "doc_b")
    val labels = ClusterOps.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(labels(_) == 1L), labels.toString)
    assert(Seq(10L, 11L, 12L).forall(labels(_) == 10L), labels.toString)
    assert(Seq(20L, 21L).forall(labels(_) == 20L), labels.toString)
    assert(labels.size == 9)
  }

  test("dag rejects path-escaping table names") {
    val gs = new graft.engine.SessionManager(spark).create()
    val dag = new graft.engine.Dag(gs)
    intercept[graft.api.GraftError.InvalidParams] {
      dag.register(Seq(graft.engine.DagTable.derived("../../etc/passwd", "SELECT 1")))
    }
    intercept[graft.api.GraftError.InvalidParams] {
      dag.register(Seq(graft.engine.DagTable.derived("a/b", "SELECT 1")))
    }
  }
}
