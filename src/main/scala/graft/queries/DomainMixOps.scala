package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
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
         |FROM term CROSS JOIN den ORDER BY lang""".stripMargin)
  )
}
