package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The ONE implementation of range bucketization for the bucket-offset
  * composition (curate_global_index pattern): a broadcast min/max row,
  * fixed-width buckets with the +0.001 span epsilon (keeps the max
  * value inside the last bucket and makes the degenerate hi == lo span
  * positive), and the least() clamp. Deployed by q_skyline, q_ks_test
  * and q_concentration — extracted so the epsilon/clamp semantics can
  * never drift between deployments. Bucket assignment is monotone in
  * the value, which is the property every caller's prefix-offset
  * argument rests on.
  */
object Buckets {

  /** Add a global ROW_NUMBER column `i` (1-based, ordered by `value`
    * then `tie`) with NO single-partition window: bucket assignment,
    * a broadcast nb-row prefix-count table, and a per-bucket
    * row_number. Equals ROW_NUMBER() OVER (ORDER BY value, tie) because
    * bucket assignment is monotone in the value. The tie column must
    * make the ordering total or the rank is nondeterministic. The
    * caller's frame must not already carry columns named `b` or
    * `off_n` — both are claimed (and consumed) by the composition.
    */
  def globalRowNumber(df: DataFrame, value: Column, tie: Column, nb: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bucketed = assign(df, value, nb)
    val offs = bucketed.groupBy("b")
      .agg(count(lit(1)).as("bn"))
      .withColumn("off_n", coalesce(sum("bn").over(
        Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("b", "off_n")
    bucketed.join(broadcast(offs), "b")
      .withColumn("i",
        col("off_n") + row_number().over(Window.partitionBy("b").orderBy(value, tie)))
      .drop("b", "off_n")
  }

  /** Add an int bucket column `b` (0..nb-1, monotone in `value`). */
  def assign(df: DataFrame, value: Column, nb: Int): DataFrame = {
    val mm = df.agg(min(value.cast("double")).as("__lo"), max(value.cast("double")).as("__hi"))
    df.crossJoin(broadcast(mm))
      .withColumn("b", least(lit(nb - 1),
        floor((value.cast("double") - col("__lo")) /
          ((col("__hi") - col("__lo") + 0.001) / nb)).cast("int")))
      .drop("__lo", "__hi")
  }
}
