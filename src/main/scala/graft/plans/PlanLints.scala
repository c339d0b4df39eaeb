package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec, SortMergeJoinExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Advisory cost lints over the physical plan: the scale killers that
  * are legal SQL and a green unit test, but melt at 100 TB — a
  * cartesian product, a non-equi join fallback, a shuffle join whose
  * small side should have broadcast, a window with no PARTITION BY
  * (single-partition global sort). The linter WARNS, never blocks: it
  * reads the compiled plan and reports, leaving the decision to the
  * pipeline author (reference exposes plan introspection through its
  * explain surface; this is the engine-side analysis of it).
  *
  * Lints run on `queryExecution.sparkPlan` — the pre-adaptive physical
  * plan, deterministic at compile time (AQE may later improve some of
  * these at runtime; the lint flags what the STATIC plan commits to).
  */
object PlanLints {

  final case class Finding(rule: String, node: String, detail: String)

  /** Threshold below which a shuffle-join side "should have broadcast"
    * (mirrors autoBroadcastJoinThreshold's job; the lint uses the
    * session's own value so config and lint never disagree).
    */
  private def broadcastThreshold(df: DataFrame): Long = {
    val v = df.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    parseBytes(v)
  }

  /** Spark's own byte-string grammar (handles every suffix Spark
    * accepts — t/tb/p/pb included); an advisory linter must never throw
    * on a threshold value the engine itself accepted, so unparseable
    * input falls back to the Spark default rather than raising.
    */
  private def parseBytes(v: String): Long =
    try org.apache.spark.network.util.JavaUtils.byteStringAsBytes(v.trim)
    catch { case scala.util.control.NonFatal(_) => 10L << 20 }

  private def statsBytes(p: SparkPlan): Option[BigInt] =
    p.logicalLink.map(_.stats.sizeInBytes)

  def findings(df: DataFrame): Seq[Finding] = {
    val out = Seq.newBuilder[Finding]
    val thresh = broadcastThreshold(df)
    df.queryExecution.sparkPlan.foreach {
      case c: CartesianProductExec =>
        out += Finding("CARTESIAN_PRODUCT", c.nodeName,
          "every left row pairs with every right row; output is |L|x|R| " +
            "- bound one side or add an equi-condition")
      case b: BroadcastNestedLoopJoinExec =>
        b.condition match {
          case None =>
            // A condition-less nested-loop IS a cartesian product that
            // happened to fit broadcast at planning time.
            out += Finding("CARTESIAN_PRODUCT", b.nodeName,
              "join has no condition; output is |L|x|R| - bound one side " +
                "or add an equi-condition")
          case Some(c) =>
            out += Finding("NON_EQUI_JOIN", b.nodeName,
              s"${b.joinType} with condition ${c.sql} falls back to " +
                "nested-loop against a broadcast side - rewrite as an " +
                "equi-join (banding/bucketing) if the inputs grow")
        }
      case j: SortMergeJoinExec =>
        val small = Seq("left" -> statsBytes(j.left), "right" -> statsBytes(j.right))
          .collect { case (side, Some(bytes)) if bytes > 0 && bytes <= thresh => side -> bytes }
        small.foreach { case (side, bytes) =>
          out += Finding("SMALL_SIDE_NOT_BROADCAST", j.nodeName,
            s"$side side estimated at $bytes bytes (<= broadcast threshold $thresh) " +
              "but the join shuffles both sides - check for a disabled or " +
              "missed broadcast")
        }
      case w: WindowExec if w.partitionSpec.isEmpty =>
        out += Finding("GLOBAL_WINDOW", w.nodeName,
          "window has no PARTITION BY: every row flows through ONE partition " +
            "- partition the window or bound its input first")
      case _ =>
    }
    out.result()
  }

  /** Render findings the way a driver log would show them. */
  def report(df: DataFrame): Seq[String] =
    findings(df).map(f => s"[plan-lint] ${f.rule} at ${f.node}: ${f.detail}")
}
