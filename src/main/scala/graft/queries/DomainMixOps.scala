package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** DoReMi-style domain reweighting (Xie et al. 2023, "DoReMi: Optimizing
  * Data Mixtures Speeds Up Language Model Pretraining"): the training
  * mixture upweights domains on which a generic (domain-agnostic) model
  * is furthest from domain-optimal — Group-DRO's exponentiated-gradient
  * update over per-domain EXCESS LOSS. The proxy/reference pair here is
  * the corpus-global unigram LM vs each domain's own unigram LM (the
  * same LM family as text_unigram_logprob / CCNet scoring), so excess
  * loss has a closed form from the count tables alone:
  *
  *   excess(d) = mean NLL under global LM − mean NLL under domain LM
  *             = [Σ_w c_d(w)·ln c_d(w) − T_d·ln T_d
  *                − Σ_w c_d(w)·ln c_g(w) + T_d·ln T_g] / T_d   (≥ 0)
  *
  * weight(d) = (1−c)·exp(η·excess_d)/Σ_e exp(η·excess_e) + c/k — one
  * exponentiated-gradient step with uniform smoothing c, exactly the
  * DoReMi α-update shape (their iteration re-trains the proxy between
  * steps; with a closed-form LM the step is the fixed point).
  *
  * Scale design: everything reduces to the (domain × vocab) count table
  * first — ONE corpus-scale exchange (the (lang, w) partial agg); the
  * global counts derive from it by a second vocabulary-scale agg, never
  * a second corpus pass. Excess/weights are |domains| rows. Float
  * determinism by the established recipes: integral count inputs, log
  * sums rounded at 4dp (text_unigram_logprob), exp outputs quantized to
  * DECIMAL(26,12) before the exact order-free softmax denominator sum
  * (ev_decay_attribution's libm-ulp absorber).
  *
  * Reference scope: the reference curates at fixed per-source quotas
  * (pipeline.rs mixture); this is the learned-mixture upgrade a
  * pretraining pipeline runs on top.
  */
object DomainMixOps {

  /** Exponentiated-gradient step size. */
  private val Eta = 1.0

  /** Uniform-smoothing mass. */
  private val Smooth = 0.2

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  /** The (lang, w) token-count table for a document frame — the ONE
    * corpus-scale exchange everything else derives from. Shared with
    * [[graft.streaming.DoremiStream]], whose snapshot state is exactly
    * this table maintained incrementally.
    */
  private[graft] def domainCounts(docFrame: DataFrame): DataFrame =
    docFrame
      .select(col("lang"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("lang", "w").agg(count(lit(1)).as("cd"))

  /** DoReMi weight table from a (lang, w, cd) count table — the exact
    * closed-form excess-loss + exponentiated-gradient step of
    * `curate_doremi`, factored so the streaming monitor's maintained
    * weights are BY CONSTRUCTION the same algebra as the batch op (the
    * spec still proves the maintained counts feeding it match a batch
    * recompute).
    */
  private[graft] def weightsFromCounts(cd: DataFrame): DataFrame = {
    val cg = cd.groupBy("w").agg(sum("cd").as("cg"))
    val dom = cd.join(cg, "w")
      .groupBy("lang")
      .agg(sum("cd").as("n_toks"),
        sum(col("cd").cast("double") * log(col("cg"))).as("sg"),
        sum(col("cd").cast("double") * log(col("cd"))).as("sd"))
    val tot = dom.agg(sum("n_toks").as("tg"))
    val ex = dom.crossJoin(broadcast(tot))
      .select(col("lang"), col("n_toks"),
        round((col("sd") - col("n_toks") * log(col("n_toks"))
          - col("sg") + col("n_toks") * log(col("tg"))) / col("n_toks"), 4)
          .as("excess_nats"))
      .withColumn("term",
        round(exp(lit(Eta) * col("excess_nats")), 12).cast("decimal(26,12)"))
    val den = ex.agg(sum("term").as("denom"), count(lit(1)).as("k"))
    ex.crossJoin(broadcast(den))
      .select(col("lang"), col("n_toks"), col("excess_nats"),
        round(lit(1.0 - Smooth)
          * (col("term").cast("double") / col("denom").cast("double"))
          + lit(Smooth) / col("k"), 6).as("weight"))
      .orderBy("lang")
  }

  def defs: Map[String, QDef] = Map(

    // §2 25jm DoReMi-style domain reweighting over lang domains.
    "curate_doremi" -> QDef(
      (s, dir) => weightsFromCounts(domainCounts(docs(s, dir))),
      s"""WITH tok AS (
         |  SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents),
         |cd AS MATERIALIZED (
         |  SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS cd
         |  FROM tok WHERE len(w) > 0 GROUP BY lang, w),
         |cg AS MATERIALIZED (
         |  SELECT w, CAST(SUM(cd) AS BIGINT) AS cg FROM cd GROUP BY w),
         |dom AS (
         |  SELECT lang, CAST(SUM(cd) AS BIGINT) AS n_toks,
         |         SUM(cd * ln(cg)) AS sg, SUM(cd * ln(cd)) AS sd
         |  FROM cd JOIN cg USING (w) GROUP BY lang),
         |tot AS (SELECT CAST(SUM(n_toks) AS BIGINT) AS tg FROM dom),
         |ex AS (
         |  SELECT lang, n_toks,
         |    ROUND((sd - n_toks * ln(n_toks) - sg + n_toks * ln(tg)) / n_toks, 4)
         |      AS excess_nats
         |  FROM dom CROSS JOIN tot),
         |term AS (
         |  SELECT lang, n_toks, excess_nats,
         |    CAST(ROUND(exp($Eta * excess_nats), 12) AS DECIMAL(26,12)) AS term
         |  FROM ex),
         |den AS (SELECT SUM(term) AS denom, CAST(COUNT(*) AS BIGINT) AS k FROM term)
         |SELECT lang, n_toks, excess_nats,
         |  ROUND(${1.0 - Smooth} * (CAST(term AS DOUBLE) / CAST(denom AS DOUBLE))
         |        + $Smooth / k, 6) AS weight
         |FROM term CROSS JOIN den ORDER BY lang""".stripMargin),

    // §2 25kc TEMPERATURE-SCALED domain sampling (the multilingual
    // mixing rule of mC4 / XLM-R / mT5: sample language l with
    // probability ∝ (n_l/N)^α, α<1 upweighting low-resource domains;
    // α = 0.5 here). The whole schedule is EXACT: per-domain doc counts
    // are integers; √n_l quantizes to DECIMAL(26,12) before the
    // order-free softmax-style denominator sum (the ev_decay_attribution
    // libm-ulp absorber — IEEE sqrt is correctly rounded, so the
    // quantized terms are engine-identical); integer quotas come from
    // LARGEST-REMAINDER apportionment (floor the 6dp-rounded raw quotas,
    // hand the remainder to the largest fractional parts, ties on lang)
    // so quotas sum to the budget exactly; membership is the
    // curate_mixture deterministic md5-hash-rank prefix per domain —
    // reproducible with no stored sample table. Output pins the actual
    // selected MEMBERSHIP via the exact per-domain sum of selected
    // doc_ids, not just counts. 100 TB posture: one count exchange; the
    // per-domain hash rank rides 16 md5-nibble sub-buckets + a ≤80-row
    // offset window (the curate_global_index composition) — no
    // corpus-scale single-partition window; everything after the counts
    // is |domains|-row arithmetic.
    "curate_temperature_sample" -> QDef(
      (s, dir) => {
        val alpha = 0.5
        val nl = docs(s, dir).groupBy("lang").agg(count(lit(1)).as("n_docs"))
        val tot = nl.agg(sum("n_docs").as("nn"))
        val sh = nl.crossJoin(broadcast(tot))
          .withColumn("term",
            round(pow(col("n_docs").cast("double"), alpha), 12)
              .cast("decimal(26,12)"))
        val z = sh.agg(sum("term").as("z"))
        val raw = sh.crossJoin(broadcast(z))
          .withColumn("t_budget", (floor(col("nn") / 5).cast("long") * 2))
          .withColumn("raw", round(
            col("t_budget") * (col("term").cast("double") / col("z").cast("double")),
            6))
          .withColumn("base", floor(col("raw")).cast("long"))
          .withColumn("frac", col("raw") - col("base"))
        val rem = raw.agg((max("t_budget") - sum("base")).as("rem"))
        val quota = raw.crossJoin(broadcast(rem))
          .withColumn("fr", row_number().over(
            Window.orderBy(col("frac").desc, col("lang"))))
          .withColumn("quota",
            col("base") + when(col("fr") <= col("rem"), 1L).otherwise(0L))
          .withColumn("taken", least(col("quota"), col("n_docs")))
          .select("lang", "n_docs", "quota", "taken")
        val keyed = docs(s, dir)
          .select(col("lang"), col("doc_id"),
            substring(md5(col("doc_id").cast("string")), 1, 12).as("h"))
          .withColumn("bk", substring(col("h"), 1, 1))
        val offs = keyed.groupBy("lang", "bk").agg(count(lit(1)).as("bc"))
          .withColumn("off", coalesce(sum("bc").over(
            Window.partitionBy("lang").orderBy("bk")
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select("lang", "bk", "off")
        val ranked = keyed.join(broadcast(offs), Seq("lang", "bk"))
          .withColumn("lrank", col("off") + row_number().over(
            Window.partitionBy("lang", "bk").orderBy(col("h"), col("doc_id")))
            .cast("long"))
        ranked.join(broadcast(quota), "lang")
          .groupBy("lang")
          .agg(max("n_docs").as("n_docs"), max("quota").as("quota"),
            max("taken").as("taken"),
            sum(when(col("lrank") <= col("taken"), col("doc_id"))
              .otherwise(0L)).as("sel_docid_sum"))
          .orderBy("lang")
      },
      """WITH nl AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
        |            FROM documents GROUP BY lang),
        |tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS nn FROM nl),
        |sh AS (
        |  SELECT lang, n_docs,
        |    CAST(ROUND(pow(CAST(n_docs AS DOUBLE), 0.5), 12) AS DECIMAL(26,12))
        |      AS term, nn
        |  FROM nl CROSS JOIN tot),
        |z AS (SELECT SUM(term) AS z FROM sh),
        |raw AS (
        |  SELECT lang, n_docs, nn // 5 * 2 AS t_budget,
        |    ROUND((nn // 5 * 2) * (CAST(term AS DOUBLE) / CAST(z AS DOUBLE)), 6)
        |      AS raw
        |  FROM sh CROSS JOIN z),
        |based AS (
        |  SELECT lang, n_docs, t_budget, CAST(FLOOR(raw) AS BIGINT) AS base,
        |    raw - FLOOR(raw) AS frac
        |  FROM raw),
        |rem AS (SELECT MAX(t_budget) - SUM(base) AS rem FROM based),
        |quota AS (
        |  SELECT lang, n_docs,
        |    base + CASE WHEN ROW_NUMBER() OVER (ORDER BY frac DESC, lang) <= rem
        |                THEN 1 ELSE 0 END AS quota
        |  FROM based CROSS JOIN rem),
        |q2 AS (SELECT lang, n_docs, quota,
        |       CASE WHEN quota < n_docs THEN quota ELSE n_docs END AS taken
        |       FROM quota),
        |ranked AS (
        |  SELECT lang, doc_id,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 12), doc_id)
        |      AS BIGINT) AS lrank
        |  FROM documents)
        |SELECT lang, MAX(n_docs) AS n_docs, MAX(quota) AS quota,
        |  MAX(taken) AS taken,
        |  CAST(SUM(CASE WHEN lrank <= taken THEN doc_id ELSE 0 END) AS BIGINT)
        |    AS sel_docid_sum
        |FROM ranked JOIN q2 USING (lang)
        |GROUP BY lang ORDER BY lang""".stripMargin),

    // §2 25ke RHO-LOSS data selection (Mindermann et al. 2022,
    // "Prioritized training on points that are learnable, worth
    // learning, and not yet learnt"): rank every example by REDUCIBLE
    // loss — loss under the training model minus loss under a holdout
    // reference model — and train on the top slice; high excess means
    // the example is predictable in principle (the reference nails it)
    // but the current model hasn't learnt it. The model pair here is
    // the closed-form twin of curate_doremi's: training model = the
    // corpus-GLOBAL unigram LM, reference = the doc's own DOMAIN (lang)
    // unigram LM, so per-doc excess = NLL_global − NLL_domain =
    // [Σ ln c_d(w) − n·ln T_d − Σ ln c_g(w) + n·ln T_g] / n — the
    // per-document decomposition of the DoReMi domain excess (the
    // domain mean of these IS 25jm's excess_nats). Top-50 slice by
    // (excess DESC, doc_id). 100 TB posture: ONE corpus-scale exchange
    // (the (lang, w) count table, shared helper with curate_doremi /
    // the streaming monitor); global counts derive from it at
    // vocabulary scale; the token joins are keyed by (lang, w)/(w);
    // per-doc sums partial-aggregate; the slice is a bounded ORDER BY
    // LIMIT top-k (partitions×k exchange), never a global window.
    // Float discipline: integral counts, ln sums absorbed by the 4dp
    // round (the ccnetRanked recipe), ties broken on doc_id over the
    // ROUNDED key on both engines.
    "curate_rho_loss" -> QDef(
      (s, dir) => {
        val tok = docs(s, dir)
          .select(col("doc_id"), col("lang"),
            explode(split(col("text"), " ")).as("w"))
          .filter(length(col("w")) > 0)
        val cd = domainCounts(docs(s, dir))
        val cg = cd.groupBy("w").agg(sum("cd").as("cg"))
        val td = cd.groupBy("lang").agg(sum("cd").as("td"))
        val tg = cd.agg(sum("cd").as("tg"))
        tok.join(cd, Seq("lang", "w"))
          .join(cg, Seq("w"))
          .groupBy("doc_id", "lang")
          .agg(count(lit(1)).as("n_toks"),
            sum(log(col("cd"))).as("sd"),
            sum(log(col("cg"))).as("sg"))
          .join(broadcast(td), Seq("lang"))
          .crossJoin(broadcast(tg))
          .select(col("doc_id"), col("lang"), col("n_toks"),
            round((col("sd") - col("n_toks") * log(col("td"))
              - col("sg") + col("n_toks") * log(col("tg"))) / col("n_toks"), 4)
              .as("excess_nats"))
          .orderBy(col("excess_nats").desc, col("doc_id"))
          .limit(50)
      },
      """WITH tok AS (
        |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |tok2 AS (SELECT * FROM tok WHERE len(w) > 0),
        |cd AS MATERIALIZED (
        |  SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS cd
        |  FROM tok2 GROUP BY lang, w),
        |cg AS MATERIALIZED (
        |  SELECT w, CAST(SUM(cd) AS BIGINT) AS cg FROM cd GROUP BY w),
        |td AS (SELECT lang, CAST(SUM(cd) AS BIGINT) AS td FROM cd GROUP BY lang),
        |tg AS (SELECT CAST(SUM(cd) AS BIGINT) AS tg FROM cd),
        |per AS (
        |  SELECT doc_id, t.lang, CAST(COUNT(*) AS BIGINT) AS n_toks,
        |    ROUND((SUM(ln(cd)) - COUNT(*) * ln(td)
        |           - SUM(ln(cg)) + COUNT(*) * ln(tg)) / COUNT(*), 4)
        |      AS excess_nats
        |  FROM tok2 t JOIN cd USING (lang, w) JOIN cg USING (w)
        |  JOIN td ON td.lang = t.lang CROSS JOIN tg
        |  GROUP BY doc_id, t.lang, td, tg)
        |SELECT doc_id, lang, n_toks, excess_nats
        |FROM per ORDER BY excess_nats DESC, doc_id LIMIT 50""".stripMargin)
  )
}
