package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Locks in the performance-critical plan properties and the determinism
  * contract the driver's hash-compare depends on.
  */
class PlanPropertiesSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("q1 pushes the shipdate filter and prunes columns at the scan") {
    val plan = SparkEntry.queries("q1_pricing_summary")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate"), plan.take(2000))
    assert(!plan.contains("l_orderkey"), "scan reads columns q1 never uses")
  }

  test("rfm plans ONE fused rank pipeline, not exploding chained ranks") {
    // The chained-rank formulation re-derived the whole upstream inside
    // every Buckets.assign min/max aggregate and planned 326 Exchange
    // mentions (101 KB plan string); the fused unpivoted pipeline plans
    // ~32 in ~26 KB. The 60/50 KB gates sit far above fused-form jitter
    // and far below either regression regime.
    val plan = SparkEntry.queries("q_rfm_segments")(spark, sfDir)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges < 60, s"rfm plan has $exchanges Exchange mentions — rank chaining is back")
    assert(plan.length < 50000, s"rfm plan string is ${plan.length} chars")
  }

  test("star join broadcasts the dimension tables") {
    val plan = SparkEntry.queries("q_star_join")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"))
  }

  test("exists-correlated compiles to a semi join, not a subquery loop") {
    val plan = SparkEntry.queries("q_exists_correlated")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("semi"), plan.take(2000))
  }

  test("tpch q6 pushes every predicate to the scan and prunes to 3 columns") {
    val plan = SparkEntry.queries("q_tpch_q6")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:"), plan.take(2000))
    assert(plan.contains("l_shipdate") && plan.contains("l_discount") && plan.contains("l_quantity"))
    assert(!plan.contains("l_orderkey"), "scan reads columns q6 never uses")
  }

  test("as-of join is one shuffle by key — no range join explosion") {
    val plan = SparkEntry.queries("q_asof_join")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"), plan.take(2000))
  }

  test("banded range join stays an equi-join on the time bin") {
    val plan = SparkEntry.queries("q_range_join")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"range join fell back to a nested loop: ${plan.take(2000)}")
  }

  test("prefix-filter similarity join joins on the shingle hash, not a blocking key") {
    val plan = SparkEntry.queries("dedup_ngram_jaccard")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"), plan.take(2000))
    assert(plan.contains("ph"), "prefix-hash join key missing from plan")
  }

  test("tpch q10 plans its top-20 as a TakeOrdered, not a global sort") {
    val plan = SparkEntry.queries("q_tpch_q10")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
    assert(plan.contains("BroadcastHashJoin"), "nation dim should broadcast")
  }

  test("tpch q19 keeps the OR-of-ANDs out of a nested loop and broadcasts part") {
    val plan = SparkEntry.queries("q_tpch_q19")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"), plan.take(2000))
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("semi/anti joins never materialize the probe payload") {
    for (q <- Seq("q_semi_join", "q_anti_join")) {
      val plan = SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.executedPlan.toString.toLowerCase
      assert(plan.contains("semi") || plan.contains("anti"), s"$q: ${plan.take(1000)}")
    }
  }

  test("distributed NTILE stays in Catalyst with no single-partition data window") {
    val plan = SparkEntry.queries("q_window_ntile")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // No RDD detour: the round-3 version dropped to zipWithIndex, which
    // deserializes every row out of Tungsten.
    assert(!plan.contains("ExistingRDD"), s"ntile left Catalyst: ${plan.take(1000)}")
    // The window over the orders data is partitioned by the range
    // partition id — parallel, not a global ORDER BY window.
    assert(plan.contains("windowspecdefinition(pid"), plan.take(2000))
    // Per-partition offsets arrive broadcast, not shuffled.
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("cte-chain ranks only the thresholded top-k candidates") {
    val plan = SparkEntry.queries("q_cte_chain")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("partitioned scan prunes event_type directories at planning time") {
    val plan = SparkEntry.queries("src_partitioned_scan")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("event_type"),
      s"partition filter missing from scan: ${plan.take(2000)}")
  }

  test("tpch q5/q7 broadcast every dimension and keep facts in hash joins") {
    for (q <- Seq("q_tpch_q5", "q_tpch_q7")) {
      val plan = SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), s"$q: ${plan.take(1000)}")
      assert(!plan.contains("CartesianProduct"), s"$q: ${plan.take(1000)}")
    }
  }

  test("tpch q2/q17 correlated subqueries become partitioned windows, not loops") {
    for (q <- Seq("q_tpch_q2", "q_tpch_q17")) {
      val plan = SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
        s"$q: ${plan.take(1000)}")
      // the per-part min/avg is a window over the part key, so the
      // window shuffle is partitioned — never a single-partition sort
      assert(plan.contains("windowspecdefinition(l_partkey"), s"$q: ${plan.take(2000)}")
      assert(plan.contains("BroadcastHashJoin"), s"$q: ${plan.take(1000)}")
    }
  }

  test("tpch q16/q20/q22 plan NOT-IN / nested-IN / NOT-EXISTS as broadcast semi or anti joins") {
    for (q <- Seq("q_tpch_q16", "q_tpch_q20", "q_tpch_q22")) {
      val plan = SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.executedPlan.toString.toLowerCase
      assert(!plan.contains("cartesianproduct"), s"$q: ${plan.take(1000)}")
      assert(plan.contains("semi") || plan.contains("anti"), s"$q: ${plan.take(1000)}")
    }
    // q22's scalar-average threshold may attach as a nested loop against
    // a ONE-ROW broadcast frame (how scalar subqueries join); the big
    // tables must not. q16/q20 have no scalar side at all.
    for (q <- Seq("q_tpch_q16", "q_tpch_q20")) {
      val plan = SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.executedPlan.toString.toLowerCase
      assert(!plan.contains("broadcastnestedloop"), s"$q: ${plan.take(1000)}")
    }
  }

  test("tpch q21 is one aggregation over orderkey — no lineitem self-join explosion") {
    val qe = SparkEntry.queries("q_tpch_q21")(spark, sfDir).queryExecution
    val plan = qe.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      plan.take(1000))
    // the EXISTS / NOT-EXISTS pair collapses to ONE scan of lineitem
    val lineitemScans = "lineitem".r.findAllIn(
      qe.sparkPlan.collect { case s if s.nodeName.contains("Scan") => s.toString }
        .mkString("\n")).size
    assert(lineitemScans <= 2, s"lineitem scanned $lineitemScans times")
  }

  test("the whole TPC-H tier keeps big tables out of cartesian/nested-loop joins") {
    // q11/q22 legitimately attach a ONE-ROW scalar frame (value fraction
    // threshold / average balance) as a broadcast nested loop; everywhere
    // else a BroadcastNestedLoop means a dimension lost its hash join.
    val scalarJoinOk = Set("q_tpch_q11", "q_tpch_q22")
    val tpch = graft.SparkEntry.queries.keys.filter(_.startsWith("q_tpch_q")).toSeq.sorted
    assert(tpch.size == 21, s"TPC-H tier shrank: $tpch") // q1 lives as q1_pricing_summary
    for (q <- tpch :+ "q1_pricing_summary") {
      val plan = SparkEntry.queries(q)(spark, sfDir).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$q: ${plan.take(1000)}")
      if (!scalarJoinOk(q))
        assert(!plan.contains("BroadcastNestedLoop"), s"$q: ${plan.take(1000)}")
    }
  }

  test("tpch q3/q18 plan their top-k as TakeOrdered, never a global sort") {
    for (q <- Seq("q_tpch_q3", "q_tpch_q18")) {
      val plan = SparkEntry.queries(q)(spark, sfDir).queryExecution.executedPlan.toString
      assert(plan.contains("TakeOrderedAndProject"), s"$q: ${plan.take(1000)}")
    }
    // q3's customer dim is hinted broadcast — the hint must survive.
    assert(SparkEntry.queries("q_tpch_q3")(spark, sfDir)
      .queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }

  test("tpch q8/q9/q14/q15 broadcast their dimension sides") {
    for (q <- Seq("q_tpch_q8", "q_tpch_q9", "q_tpch_q14", "q_tpch_q15")) {
      val plan = SparkEntry.queries(q)(spark, sfDir).queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), s"$q: ${plan.take(1000)}")
    }
  }

  test("breaking the broadcast config is caught (negative control)") {
    // q12's lineitem⋈orders join is deliberately UNhinted (orders is only
    // safely broadcast-able at small SF — at 100 TB both sides are big and
    // a shuffle join is correct), so it auto-broadcasts here…
    val plan = SparkEntry.queries("q_tpch_q12")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1000))
    // …and a config drift that disables auto-broadcast visibly changes
    // the plan — proving these fragment assertions actually bite. The
    // HINTED queries must keep their broadcasts even under the drifted
    // config (that is what the hints are for).
    val child = spark.newSession()
    child.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val degraded = SparkEntry.queries("q_tpch_q12")(child, sfDir)
      .queryExecution.executedPlan.toString
    assert(!degraded.contains("BroadcastHashJoin") && degraded.contains("SortMergeJoin"),
      s"negative control did not degrade: ${degraded.take(1000)}")
    val hintedStill = SparkEntry.queries("q_tpch_q3")(child, sfDir)
      .queryExecution.executedPlan.toString
    assert(hintedStill.contains("BroadcastHashJoin"),
      s"hinted broadcast lost under config drift: ${hintedStill.take(1000)}")
  }

  test("ANN ranks use the bounded top-k aggregate — zero windows anywhere in the tier") {
    // ann_ivf_topk joined this set in round 7 when its probe-selection
    // stage (the last window in the ANN tier) moved onto the same
    // bounded top-k as the final ranks. r17: the GATE queries now
    // checkpoint their ≤100-row top-k frames (VectorOps.gatePairs), so
    // the gates' own plans end at a LogicalRDD — assert on the OPERATOR
    // frames the gates checkpoint, which is where the rank runs.
    val operators: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      "ann_cosine_topk" -> SparkEntry.queries("ann_cosine_topk")(spark, sfDir),
      "lshTopK" -> VectorOps.lshTopK(spark, sfDir),
      "pqTopK" -> PqOps.pqTopK(spark, sfDir),
      "ivfTopK" -> IvfOps.ivfTopK(spark, sfDir),
      "ivfpqTopK" -> IvfPqOps.ivfpqTopK(spark, sfDir))
    for ((q, df) <- operators) {
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("bounded_topk"), s"$q lost the two-phase top-k: ${plan.take(1000)}")
      assert(!plan.contains("windowspecdefinition"),
        s"$q ranks through a window again — the corpus shuffles: ${plan.take(1000)}")
    }
  }

  test("weighted sample plans a bounded TakeOrdered, not a global sort") {
    val plan = SparkEntry.queries("curate_weighted_sample")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"weighted sample lost its per-partition top-k: ${plan.take(2000)}")
  }

  test("profiler branches scan exactly one column each") {
    val plan = SparkEntry.queries("profile_table")(spark, sfDir)
      .queryExecution.executedPlan.toString
    val reads = "ReadSchema: struct<([^>]*)>".r.findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(reads.nonEmpty, plan.take(2000))
    reads.foreach(r =>
      assert(!r.contains(","), s"profiler branch reads more than one column: $r"))
  }

  test("tfidf per-doc rank gets a map-side WindowGroupLimit before the exchange") {
    val plan = SparkEntry.queries("text_tfidf_topk")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit") && plan.contains("Partial"),
      s"tfidf rank lost its partial group-limit: ${plan.take(2000)}")
  }

  test("global index moves the corpus through one bucket exchange, offsets stay scalar") {
    val plan = SparkEntry.queries("curate_global_index")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // The offsets side may use tiny single-partition windows, but the
    // doc-bearing side must never hit a SinglePartition exchange: count
    // hash exchanges on the bucket column (exactly one carries docs).
    assert(!plan.contains("CartesianProduct"))
    val hashExchanges = "Exchange hashpartitioning\\(b#".r.findAllIn(plan).length
    assert(hashExchanges <= 2, s"global index shuffles the corpus more than expected: $hashExchanges")
  }

  test("pagerank iterations broadcast the rank vector — edges never re-shuffle per iteration") {
    val plan = SparkEntry.queries("q_pagerank")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"),
      s"pagerank contains a cartesian product: ${plan.take(2000)}")
  }

  test("native per-group top-k plans as an aggregate, not a window") {
    val plan = SparkEntry.queries("q_topk_per_group_native")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("bounded_topk"), plan.take(2000))
    assert(!plan.contains("Window ["), s"top-k fell back to a window: ${plan.take(2000)}")
  }

  test("join-cardinality profile never joins the fact rows themselves") {
    val plan = SparkEntry.queries("q_join_cardinality")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // Both join inputs must be aggregates (count tables), so the join
    // appears ABOVE two HashAggregates in the tree — assert the join's
    // children are not raw scans by checking the scan count equals 2
    // and each is below an aggregate.
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin"), plan.take(2000))
    val aggCount = "HashAggregate".r.findAllIn(plan).length
    assert(aggCount >= 4, s"expected partial+final aggs under the join, got $aggCount")
  }

  test("every query is deterministic across runs (driver hash contract)") {
    // Two independent plan executions must produce identical ordered rows.
    // Binary cells render as hex (Row.toString would print array identity).
    def canon(r: org.apache.spark.sql.Row): String =
      r.toSeq.map {
        case b: Array[Byte] => b.map("%02x".format(_)).mkString
        case v => String.valueOf(v)
      }.mkString("|")
    // 280 queries × 2 runs sequentially was ~8 min of the suite's 30-min
    // budget (r16 verdict task 2); Spark schedules concurrent driver
    // threads' jobs fine, and determinism-per-query is independent, so
    // sweep on a bounded pool. Failures aggregate to one assertion.
    val bad = graft.TestSweep.sweep(SparkEntry.queries.toSeq) { case (name, fn) =>
      val a = fn(spark, sfDir).collect().map(canon).toSeq
      val b = fn(spark, sfDir).collect().map(canon).toSeq
      if (a != b) Some(s"query $name is nondeterministic") else None
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }
}
