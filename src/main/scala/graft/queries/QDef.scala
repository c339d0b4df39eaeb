package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query
  * over the same parquet tables. Column names and ordering are kept
  * identical on both sides — the driver sorts columns by name and hashes
  * values, so names/types/order must line up exactly.
  */
final case class QDef(
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QDef {
  def apply(run: (SparkSession, String) => DataFrame, oracle: String): QDef =
    QDef(run, Some(oracle))
}
