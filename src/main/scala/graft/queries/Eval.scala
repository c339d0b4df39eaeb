package graft.queries

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}

/** Evaluation-shape helpers for expression-heavy operators.
  *
  * Catalyst's CollapseProject merges adjacent projections and will inline
  * an aliased expression into a downstream higher-order-function lambda.
  * An expression inlined into a lambda BODY is re-evaluated once per outer
  * array element (and HOF lambdas run interpreted, outside codegen), which
  * turns a linear pipeline like toks → shingles → minhash → bands into a
  * multiplicative blow-up. [[barrier]] pins an evaluate-once boundary.
  */
object Eval {

  /** Identity mapPartitions: a serialization boundary that CollapseProject
    * cannot cross. Costs one row round-trip per record — no shuffle, keeps
    * partitioning — and guarantees every column of `df` is evaluated
    * exactly once before downstream expressions consume it.
    */
  def barrier(df: DataFrame): DataFrame =
    df.mapPartitions(it => it)(Encoders.row(df.schema))

  /** Fan a narrow (often single-file, single-partition) scan out to the
    * session's full parallelism before compute-heavy expressions.
    */
  def fanOut(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
}
