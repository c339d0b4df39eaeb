package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, SparkEntry}

/** Semantic sanity for the round-11 tranche: ranking metrics, PR-AUC,
  * binary quantization, Matryoshka recall, Gopher rules, Kruskal-Wallis
  * and Lloyd k-means. Exact cross-engine parity is the oracle gate's
  * job; these specs pin the METRIC PROPERTIES that hashes can't express
  * (bounds, monotone relations, invariants).
  */
class RankEvalSpec extends SparkSpec {

  private val dir = sf("any")

  test("ml_ranking_metrics: metrics bounded, hits consistent with recall") {
    val rows = SparkEntry.queries("ml_ranking_metrics")(spark, dir).collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      val (nRel, hits) = (r.getAs[Long]("n_rel"), r.getAs[Long]("hits"))
      val (mrr, ndcg, recall) =
        (r.getAs[Double]("mrr"), r.getAs[Double]("ndcg"), r.getAs[Double]("recall"))
      assert(mrr >= 0.0 && mrr <= 1.0)
      assert(ndcg >= 0.0 && ndcg <= 1.0 + 1e-9)
      assert(hits >= 0 && hits <= 10)
      assert(math.abs(recall - hits.toDouble / nRel) < 1e-4)
      // A query with any hit must have positive MRR and NDCG, and
      // vice versa — the three metrics agree on "found anything".
      assert((hits > 0) == (mrr > 0.0))
      assert((hits > 0) == (ndcg > 0.0))
    }
  }

  test("ml_pr_auc: AP within [0,1] and at least the positive base rate sanity band") {
    val r = SparkEntry.queries("ml_pr_auc")(spark, dir).collect().head
    val (np, nn, ap) =
      (r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"), r.getAs[Double]("ap"))
    assert(np > 0 && nn > 0)
    assert(ap > 0.0 && ap <= 1.0)
    // A classifier can't be grossly WORSE than random on its own
    // training data: AP should be at least half the base rate.
    val base = np.toDouble / (np + nn)
    assert(ap > base / 2, s"ap=$ap base=$base")
  }

  test("SignBitHamming: native kernel matches the HOF reference formulation") {
    val e = graft.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
    val q = e.filter(col("vec_id") === 0).select(col("v").as("qv"))
    val both = e.crossJoin(broadcast(q))
      .select(
        graft.functions.GraftFunctions.signHamming(col("v"), col("qv")).as("native"),
        aggregate(
          zip_with(col("v"), col("qv"),
            (x, y) => when((x > lit(0.0)) =!= (y > lit(0.0)), 1L).otherwise(0L)),
          lit(0L), (acc, x) => acc + x).as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getAs[Long]("native") == r.getAs[Long]("hof")))
  }

  test("emb_binary_quant: hamming bounded by dim, rerank ordered by exact cosine") {
    val rows = SparkEntry.queries("emb_binary_quant")(spark, dir).collect()
    assert(rows.length == 10)
    val cosines = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("cosine"))
    assert(cosines.sameElements(cosines.sortBy(-_)), "rerank must be cosine-descending")
    rows.foreach { r =>
      val h = r.getAs[Long]("hamming")
      assert(h >= 0 && h <= 64)
    }
  }

  test("emb_mrl_recall: ranks 1..10, overlap flag matches a recomputed full top-10") {
    val out = SparkEntry.queries("emb_mrl_recall")(spark, dir).collect()
    assert(out.map(_.getAs[Long]("rank_trunc")).sorted.sameElements(1L to 10L))
    // Recompute the exact full-dim top-10 independently and check flags.
    val e = graft.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
    val q = e.filter(col("vec_id") === 0).select(col("v").as("qv"))
    val full = e.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
      .select(col("vec_id"), round(VectorOps.cosine(col("v"), col("qv")), 6).as("c"))
      .orderBy(col("c").desc, col("vec_id")).limit(10)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    out.foreach { r =>
      assert(r.getAs[Boolean]("in_full_topk") == full.contains(r.getAs[Long]("vec_id")))
    }
  }

  test("text_gopher_rules: keep is exactly the conjunction of the four flags") {
    val rows = SparkEntry.queries("text_gopher_rules")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val conj = r.getAs[Boolean]("words_ok") && r.getAs[Boolean]("mwl_ok") &&
        r.getAs[Boolean]("stop_ok") && r.getAs[Boolean]("alpha_ok")
      assert(r.getAs[Boolean]("keep") == conj)
      assert(r.getAs[Boolean]("words_ok") == (r.getAs[Long]("n_words") >= 50 &&
        r.getAs[Long]("n_words") <= 100000))
    }
    // The battery must discriminate on this corpus (not all-pass/all-fail).
    val kept = rows.count(_.getAs[Boolean]("keep"))
    assert(kept > 0 && kept < rows.length)
  }

  test("q_kruskal_wallis: H nonnegative, tie-corrected H' >= H, k=5 groups") {
    val r = SparkEntry.queries("q_kruskal_wallis")(spark, dir).collect().head
    assert(r.getAs[Long]("k_groups") == 5)
    val (h, ht) = (r.getAs[Double]("h"), r.getAs[Double]("h_tie"))
    assert(h >= 0.0)
    // C = 1 - ties/(N^3-N) <= 1, so H' = H/C >= H.
    assert(ht >= h - 1e-9)
  }

  test("text_ccnet_buckets: exact terciles, bucket order matches score order") {
    val rows = SparkEntry.queries("text_ccnet_buckets")(spark, dir).collect()
    val n = rows.length
    val counts = rows.groupBy(_.getAs[String]("bucket")).view.mapValues(_.size).toMap
    // Rank terciles: bucket sizes differ by at most 1.
    assert(counts.keySet == Set("head", "middle", "tail"))
    assert(counts.values.max - counts.values.min <= 1)
    assert(counts.values.sum == n)
    // Every head doc scores >= every tail doc.
    val headMin = rows.filter(_.getAs[String]("bucket") == "head")
      .map(_.getAs[Double]("avg_logprob")).min
    val tailMax = rows.filter(_.getAs[String]("bucket") == "tail")
      .map(_.getAs[Double]("avg_logprob")).max
    assert(headMin >= tailMax)
    // Ranks are a permutation of 1..N.
    assert(rows.map(_.getAs[Long]("rank")).sorted.toSeq == (1L to n.toLong))
  }

  test("emb_pca_top2: all contract gates true at sf0.001") {
    val r = SparkEntry.queries("emb_pca_top2")(spark, dir).collect().head
    Seq("norm_ok", "ortho_ok", "rayleigh_monotone_ok", "order_ok", "share_ok")
      .foreach(c => assert(r.getAs[Boolean](c), s"$c must hold"))
    assert(r.getAs[Long]("dim") == 64)
  }

  test("emb_whiten_stats: one row per dimension, nonnegative std, plausible moments") {
    val rows = SparkEntry.queries("emb_whiten_stats")(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("dim")).sorted.toSeq == (1L to 64L))
    val nVec = graft.Tables(spark, dir, "embeddings").count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n") == nVec)
      assert(r.getAs[Double]("std") >= 0.0)
      assert(math.abs(r.getAs[Double]("mean")) < 10.0)
    }
    // Embeddings are not constant per dimension: std must be positive
    // somewhere (all-zero stds would mean the moment math collapsed).
    assert(rows.exists(_.getAs[Double]("std") > 0.0))
  }

  test("q_poisson_bootstrap: CI brackets the full mean, bounds ordered") {
    val r = SparkEntry.queries("q_poisson_bootstrap")(spark, dir).collect().head
    val (mean, lo, hi) = (r.getAs[Double]("mean"),
      r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"))
    assert(r.getAs[Long]("b_replicas") == 32)
    assert(lo <= hi)
    // With B=32 Poisson replicas the 2nd..31st band must bracket the
    // point estimate on this well-behaved mean.
    assert(lo <= mean && mean <= hi, s"CI [$lo, $hi] vs mean $mean")
  }

  test("ml_kappa_mcc: bounded in [-1,1], consistent with observed agreement") {
    val r = SparkEntry.queries("ml_kappa_mcc")(spark, dir).collect().head
    val (n, agree) = (r.getAs[Long]("n"), r.getAs[Long]("agree"))
    val (kappa, mcc) = (r.getAs[Double]("kappa"), r.getAs[Double]("mcc"))
    assert(agree >= 0 && agree <= n)
    assert(kappa >= -1.0 - 1e-9 && kappa <= 1.0 + 1e-9)
    assert(mcc >= -1.0 - 1e-9 && mcc <= 1.0 + 1e-9)
    // Perfect agreement iff kappa == 1; here the classifier is imperfect.
    assert((agree == n) == (kappa == 1.0))
  }

  test("ml_kmeans_lloyd: every vector assigned exactly once, all clusters non-empty") {
    val rows = SparkEntry.queries("ml_kmeans_lloyd")(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("cluster_id")).sorted.sameElements(0L to 3L))
    rows.foreach { r =>
      assert(r.getAs[Long]("n") > 0)
      assert(r.getAs[Double]("mean_d") >= 0.0)
    }
    val total = rows.map(_.getAs[Long]("n")).sum
    val corpus = graft.Tables(spark, dir, "embeddings").count()
    assert(total == corpus, s"assigned $total of $corpus vectors")
  }
}
