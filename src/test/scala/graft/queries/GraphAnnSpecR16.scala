package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** r16 beam-walk backend equality pins: the driver-local layer-1 walk
  * (localBeamSearch + localCosine) must be BIT-identical to the
  * distributed walk it dispatches away from — same pool (keys AND
  * doubles), same hop counts, same top frame.
  */
class GraphAnnSpecR16 extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def corpus = Eval.fanOut(
    graft.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))).cache()

  test("localCosine == native cosine kernel, bit-for-bit") {
    val e = corpus
    val rows = e.limit(60).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1))
    val pairs = rows.take(30).zip(rows.drop(30))
    import spark.implicits._
    val df = pairs.toSeq.map { case ((ia, va), (ib, vb)) => (ia, ib, va, vb) }
      .toDF("ia", "ib", "va", "vb")
      .select(col("ia"), col("ib"),
        graft.functions.GraftFunctions.cosineSim(col("va"), col("vb")).as("sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    pairs.foreach { case ((ia, va), (ib, vb)) =>
      val local = GraphAnnOps.localCosine(va, vb)
      assert(java.lang.Double.doubleToRawLongBits(local) ===
        java.lang.Double.doubleToRawLongBits(df((ia, ib))), s"pair ($ia,$ib)")
    }
  }

  test("local beam walk == distributed beam walk on the entry layer") {
    val e = corpus
    val idx = GraphAnnOps.buildIndex(e)
    val qs = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val hops1 = math.max(GraphAnnOps.Hops,
      math.ceil(math.log(idx.l1n.toDouble) / math.log(GraphAnnOps.Degree)).toInt)
    val dist = GraphAnnOps.fusedBeamSearch(idx.layer1, idx.graph1, qs,
      k = GraphAnnOps.Entries, hops = hops1, excludeSelf = false)
    val qRows = qs.select(col("q_id"), col("qv")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toSeq.sortBy(_._1)
    val vecs = idx.layer1.select(col("vec_id"), col("v")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val adj = idx.graph1.select(col("vec_id"), col("nbr")).collect()
      .groupBy(_.getLong(0)).map { case (v, rs) => v -> rs.map(_.getLong(1)).toSeq }
    val loc = GraphAnnOps.localBeamSearch(spark, vecs, adj, qRows,
      k = GraphAnnOps.Entries, hops = hops1, excludeSelf = false)
    assert(loc.hopCandidates === dist.hopCandidates)
    val dp = dist.pool.map { case (q, id, s) => (q, id) -> s }.toMap
    val lp = loc.pool.map { case (q, id, s) => (q, id) -> s }.toMap
    assert(lp.keySet === dp.keySet)
    lp.foreach { case (key, s) =>
      assert(java.lang.Double.doubleToRawLongBits(s) ===
        java.lang.Double.doubleToRawLongBits(dp(key)), s"pool $key")
    }
    assert(loc.top.collect().map(_.toSeq).toSeq === dist.top.collect().map(_.toSeq).toSeq)
  }

  test("local layer-0 walk (with seeds) == distributed walk, bit-for-bit") {
    // r17: searchIndex dispatches the rep-level walk driver-local under
    // the same bounded-collect budget as layer 1 — this pins the seeded
    // variant of the backend equality the dispatch relies on.
    val e = corpus
    val idx = GraphAnnOps.buildIndex(e)
    val qs2 = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val qRows = qs2.select(col("q_id"), col("qv")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toSeq.sortBy(_._1)
    // Seeds from the layer-1 walk, exactly as searchIndex hands them off.
    val hops1 = math.max(GraphAnnOps.Hops,
      math.ceil(math.log(idx.l1n.toDouble) / math.log(GraphAnnOps.Degree)).toInt)
    val l1 = GraphAnnOps.fusedBeamSearch(idx.layer1, idx.graph1, qs2,
      k = GraphAnnOps.Entries, hops = hops1, excludeSelf = false)
    val seeds: Map[Long, Seq[Long]] = l1.pool.groupBy(_._1).map { case (q, rows) =>
      q -> rows.sortBy { case (_, id, sim) => (-sim, id) }
        .take(GraphAnnOps.Entries).map(_._2)
    }
    val dist = GraphAnnOps.fusedBeamSearch(idx.reps.select("vec_id", "v"), idx.graph, qs2,
      k = 11, hops = GraphAnnOps.Hops, excludeSelf = false, seeds = Some(seeds))
    val vecs = idx.reps.select(col("vec_id"), col("v")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val adj = idx.graph.select(col("vec_id"), col("nbr")).collect()
      .groupBy(_.getLong(0)).map { case (v, rs) => v -> rs.map(_.getLong(1)).toSeq }
    val loc = GraphAnnOps.localBeamSearch(spark, vecs, adj, qRows,
      k = 11, hops = GraphAnnOps.Hops, excludeSelf = false, seeds = Some(seeds))
    assert(loc.hopCandidates === dist.hopCandidates)
    val dp = dist.pool.map { case (q, id, s) => (q, id) -> s }.toMap
    val lp = loc.pool.map { case (q, id, s) => (q, id) -> s }.toMap
    assert(lp.keySet === dp.keySet)
    lp.foreach { case (key, s) =>
      assert(java.lang.Double.doubleToRawLongBits(s) ===
        java.lang.Double.doubleToRawLongBits(dp(key)), s"pool $key")
    }
    assert(loc.top.collect().map(_.toSeq).toSeq === dist.top.collect().map(_.toSeq).toSeq)
  }
}
