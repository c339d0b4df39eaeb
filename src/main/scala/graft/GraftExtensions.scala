package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftbridge.{CosineSimilarity, JaccardSimilarity, JaccardSortedLong, SimHash64}

/** Spark-native installation point: `--conf
  * spark.sql.extensions=graft.GraftExtensions` injects the engine's
  * native codegen kernels into every session's FunctionRegistry at
  * session build time — the idiomatic way a Spark library ships custom
  * Catalyst expressions to a cluster (no per-session install() call, and
  * `newSession()` children inherit them).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two double arrays (null on dim mismatch / zero norm)"),
      { case Seq(a: Expression, b: Expression) => CosineSimilarity(a, b) }: Seq[Expression] => Expression))
    ext.injectFunction((
      FunctionIdentifier("jaccard_sim"),
      info("jaccard_sim", "jaccard_sim(a, b) - Jaccard similarity of two distinct string arrays"),
      { case Seq(a: Expression, b: Expression) => JaccardSimilarity(a, b) }: Seq[Expression] => Expression))
    ext.injectFunction((
      FunctionIdentifier("jaccard_sorted_long"),
      info("jaccard_sorted_long", "jaccard_sorted_long(a, b) - Jaccard over pre-sorted distinct long arrays (merge-count)"),
      { case Seq(a: Expression, b: Expression) => JaccardSortedLong(a, b) }: Seq[Expression] => Expression))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens) - 64-bit SimHash of a string array"),
      { case Seq(a: Expression) => SimHash64(a) }: Seq[Expression] => Expression))
  }
}
