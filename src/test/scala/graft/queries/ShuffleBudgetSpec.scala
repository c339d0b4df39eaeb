package graft.queries

import org.apache.spark.graftbridge.ShuffleAccounting

import graft.{SparkEntry, SparkSpec}

/** Shuffle-byte budgets for headline queries (SURVEY §7b): wall-clock is
  * machine-noisy, but shuffle WRITE volume only moves when the plan
  * moves — a broken broadcast, a lost pushdown, or a rank that starts
  * leaking the corpus through an exchange trips these long before a
  * human reads a bench diff. Budgets are ~3× the measured sf0.001
  * volume: loose enough for row-count jitter, far below the
  * order-of-magnitude jump any real plan regression causes.
  */
class ShuffleBudgetSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  // name -> max shuffle-write bytes at sf0.001 (local[4], 4 shuffle parts)
  // measured r5: 1.3 / 3.9 / 83 / 225 / 250 / 539 KiB
  private val budgets: Seq[(String, Long)] = Seq(
    "q1_pricing_summary" -> 8 * 1024L,
    "q_tpch_q3" -> 16 * 1024L,
    "q_tpch_q21" -> 320 * 1024L,
    "dedup_minhash_lsh" -> 1024 * 1024L,
    "dedup_clusters" -> 1024 * 1024L,
    "ann_pq_topk" -> 2 * 1024 * 1024L,
    // composed IVF-PQ: training shuffles the capped sample's partial
    // aggregates; query-side exchanges carry only bounded top-k buffers
    // (measured r9: 622 KiB)
    "ann_ivfpq_topk" -> 2 * 1024 * 1024L,
    // vocabulary-sized shuffles by construction — a corpus-sized number
    // here means the partial aggregation stopped reducing map-side.
    // NO fanOut here, by rule: a one-pass query must not buy local scan
    // parallelism with a corpus rebalance that a 100 TB plan would pay
    // for real (fanOut is reserved for cached multi-pass frames — ANN
    // training, power iteration, shingle pipelines, BPE's 7 passes).
    // (measured r5: 1.6 / 36 / 9.2 KiB)
    "text_bpe_pairs" -> 32 * 1024L,
    // ONE up-front corpus fanOut rebalance (the small-SF scan is a
    // single split; without it all six training passes serialize onto
    // one core) + 6 rounds × pair-vocab partial aggregates + the tiny
    // final stats sort. The corpus-sized term is the one rebalance,
    // by design — never per-round.
    // (measured r9: 146 KiB at sf0.001)
    "text_bpe_encode" -> 512 * 1024L,
    "text_pmi_topk" -> 128 * 1024L,
    "curate_global_index" -> 64 * 1024L,
    // round-7 subquadratic claims, CI-pinned: containment shuffles
    // candidates (prefix-filtered + size-bounded), never all-pairs;
    // bigram LM shuffles vocabulary-scale counts
    // (measured r7: 260 / 311 KiB)
    "text_containment" -> 1024 * 1024L,
    "text_bigram_lm" -> 1024 * 1024L,
    // round-7 continuation: linkage joins a broadcast vocabulary-scale
    // dictionary (shuffle = dirty-name counts only); the stats tier is
    // partial-agg scalars; KS shuffles distinct-value counts once; the
    // bitmap index shuffles 8 bytes per (user, partition)
    "q_fuzzy_link" -> 64 * 1024L,
    "q_ks_test" -> 64 * 1024L,
    "q_ols_regression" -> 64 * 1024L,
    "q_bitmap_presence" -> 64 * 1024L,
    "q_chi_square" -> 64 * 1024L,
    // concentration ranks through bucket-offset composition — shuffle =
    // per-customer sums + tiny prefix tables, never a global sort
    "q_concentration" -> 64 * 1024L,
    // round-7 tranche (measured sf0.001: 195/26/338/0.3/1.4/43/594/97/36 KiB):
    // logreg is TWO scalar partial-agg passes — a corpus-sized number
    // means the Newton contributions stopped reducing map-side; the geo
    // join shuffles only the final per-customer minima; RFM stays at
    // per-customer sums + prefix tables across all three rank branches
    "q_assoc_rules" -> 640 * 1024L,
    "q_rfm_segments" -> 96 * 1024L,
    "ml_knn_label" -> 1024 * 1024L,
    "ml_logreg_newton" -> 16 * 1024L,
    "q_geo_cell_join" -> 16 * 1024L,
    "emb_label_drift" -> 128 * 1024L,
    "text_rake_keyphrases" -> 2 * 1024 * 1024L,
    "curate_winsorize" -> 320 * 1024L,
    "ev_cohort_ltv" -> 128 * 1024L,
    // round-10 tranche: exact-substring dedup shuffles the K-gram
    // anchor vocabulary + doc-partitioned island windows (a corpus-sized
    // number means the anchor partial-agg stopped reducing, or an island
    // window went global); BPE packing adds one doc_id-keyed join and a
    // language-partitioned pack window on top of text_bpe_encode's
    // vocabulary-sized training rounds
    // (measured r10: 577 / 217 KiB at sf0.001)
    "dedup_substring" -> 2 * 1024 * 1024L,
    "curate_pack_bpe" -> 1024 * 1024L,
    // apply adds only the span-array fold + one doc-keyed join on top
    // of the plan query (a corpus-token anti-join here would be the
    // scale-killer this pin exists to catch); DSIR is two bucket-scale
    // aggregates + a broadcast ratio join + per-doc sums
    "dedup_substring_apply" -> 3 * 1024 * 1024L,
    "curate_dsir_weights" -> 512 * 1024L,
    // the discriminative twin of DSIR: T=3 iterations over the CACHED
    // (doc, bucket) feature frame — each one doc-scale margin agg + one
    // bucket-scale gradient agg, weights broadcast; a corpus-sized
    // number means an iteration started re-shuffling raw tokens
    "ml_text_classifier" -> 1024 * 1024L,
    // round-11 tranche (measured sf0.001: 49 / 225 / 0 / 0 / 10 / 79 /
    // 224 KiB): PR-AUC shuffles distinct scores; ranking metrics the
    // bounded per-query top-k buffers; the binary-quant and Matryoshka
    // paths are MAP-ONLY (a nonzero number here means a ranker started
    // shuffling the corpus instead of TakeOrdered-ing it); Gopher rules
    // shuffle only the output ordering; Kruskal-Wallis the distinct-value
    // aggregates; k-means the k×dim update rows + argmin buffers
    "ml_pr_auc" -> 192 * 1024L,
    "ml_ranking_metrics" -> 768 * 1024L,
    "emb_binary_quant" -> 16 * 1024L,
    "emb_mrl_recall" -> 16 * 1024L,
    "text_gopher_rules" -> 48 * 1024L,
    "q_kruskal_wallis" -> 256 * 1024L,
    "ml_kmeans_lloyd" -> 768 * 1024L,
    // (measured sf0.001: 28 / 1.7 KiB): CCNet shuffles vocabulary counts
    // + doc-scale lp aggregates; the bootstrap's exchange carries B rows
    // per partition — a corpus-sized number means the replica explode
    // stopped partial-aggregating map-side
    "text_ccnet_buckets" -> 128 * 1024L,
    "q_poisson_bootstrap" -> 16 * 1024L,
    // 16 deflated+plain matvec iterations, each one d-key partial-agg
    // exchange (measured sf0.001: 282 KiB — d-scale rows, not corpus)
    "emb_pca_top2" -> 1024 * 1024L,
    // one d-key moment aggregation (measured sf0.001: 3.8 KiB)
    "emb_whiten_stats" -> 32 * 1024L,
    // the knn-prediction pipeline's bounded top-k buffers + label-scale
    // marginals (measured sf0.001: 217 KiB)
    "ml_kappa_mcc" -> 768 * 1024L)

  test("headline queries stay inside their shuffle-byte budgets") {
    val acc = new ShuffleAccounting
    spark.sparkContext.addSparkListener(acc)
    try {
      val measured = budgets.map { case (name, budget) =>
        val (bytes, _) = acc.measure(spark.sparkContext) {
          SparkEntry.queries(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
        }
        spark.catalog.clearCache()
        info(f"$name%-22s shuffle ${bytes / 1024.0}%.1f KiB (budget ${budget / 1024} KiB)")
        (name, bytes, budget)
      }
      val over = measured.filter { case (_, b, budget) => b > budget }
      assert(over.isEmpty, over.map { case (n, b, bud) =>
        s"$n wrote $b bytes (budget $bud)"
      }.mkString("; "))
    } finally spark.sparkContext.removeSparkListener(acc)
  }
}
