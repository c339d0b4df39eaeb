package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.api.GraftError

/** Pluggable table-resolution seam, mirroring the reference's executor
  * switch (reference: src/executor/mod.rs `ExecutorMode` { Mock,
  * BigQuery } and the per-session `Executor` enum; CLI flag `--backend`
  * in src/main.rs:80).
  *
  * Spark-first realization: the thing that actually differs between a
  * local ("mock") session and a remote-BigQuery session is WHERE a table
  * name resolves — the session's temp-view catalog, or a DataSource V2
  * read through the spark-bigquery connector. SQL execution itself stays
  * Spark either way, so the seam is a [[TableResolver]], not a whole
  * query engine.
  */
sealed trait ExecutorMode
object ExecutorMode {
  case object Local extends ExecutorMode
  case object BigQuery extends ExecutorMode
  case object Jdbc extends ExecutorMode

  def parse(s: String): ExecutorMode = s.trim.toLowerCase match {
    case "mock" | "local" => Local
    case "bigquery" => BigQuery
    case "jdbc" => Jdbc
    case other => throw GraftError.InvalidParams(s"Unknown backend: $other (use mock|bigquery|jdbc)")
  }
}

trait TableResolver {
  def mode: ExecutorMode

  /** Produce the DataFrame a table name denotes in this backend. */
  def resolve(spark: SparkSession, name: String): DataFrame

  /** Make `name` visible to subsequent SQL in the session (a temp view
    * over whatever [[resolve]] returns — for the remote backend this is
    * exactly how the "Spark SQL + BigQuery connector" deployment shape
    * exposes remote tables to Spark SQL).
    */
  def register(spark: SparkSession, name: String): Unit =
    resolve(spark, name).createOrReplaceTempView(name.split('.').last)
}

/** Default backend: names are session temp views (the reference's Mock /
  * YachtSQL executor, re-expressed as Spark's own catalog).
  */
object LocalResolver extends TableResolver {
  val mode: ExecutorMode = ExecutorMode.Local
  def resolve(spark: SparkSession, name: String): DataFrame =
    if (spark.catalog.tableExists(name)) spark.table(name)
    else throw GraftError.UnknownTable(name)
}

/** Remote backend integration point (reference: src/executor/bigquery.rs).
  *
  * Builds the exact DataSource V2 read the spark-bigquery connector
  * expects (`format("bigquery")` + table/project options, with
  * `viewsEnabled` and predicate/column pushdown left to the connector's
  * Spark integration). The connector jar is not shippable in this
  * zero-egress environment, so [[resolve]] raises a typed QueryError
  * explaining the missing backend; [[readerOptions]] is the seam a
  * deployment wires up and what the spec verifies.
  */
final class BigQueryResolver(
    defaultProject: Option[String] = None,
    defaultDataset: Option[String] = None,
    materializationDataset: Option[String] = None)
    extends TableResolver {

  val mode: ExecutorMode = ExecutorMode.BigQuery

  /** `project.dataset.table` resolution with BigQuery's default rules. */
  def qualifiedName(name: String): String = name.split('.') match {
    case Array(t) =>
      val ds = defaultDataset.getOrElse(
        throw GraftError.InvalidParams(s"Unqualified table '$t' needs a default dataset"))
      (defaultProject.toSeq :+ ds :+ t).mkString(".")
    case Array(ds, t) => (defaultProject.toSeq :+ ds :+ t).mkString(".")
    case _ => name
  }

  def readerOptions(name: String): Map[String, String] =
    Map("table" -> qualifiedName(name)) ++
      defaultProject.map("parentProject" -> _) ++
      materializationDataset.map("materializationDataset" -> _)

  def resolve(spark: SparkSession, name: String): DataFrame =
    try spark.read.format("bigquery").options(readerOptions(name)).load()
    catch {
      case e: ClassNotFoundException =>
        throw GraftError.QueryError(
          s"BigQuery backend selected but spark-bigquery connector is not on the classpath " +
            s"(resolving ${qualifiedName(name)}): ${e.getMessage}")
      case e: org.apache.spark.sql.AnalysisException =>
        throw GraftError.QueryError(
          s"BigQuery backend selected but spark-bigquery connector is not on the classpath " +
            s"(resolving ${qualifiedName(name)}): ${e.getMessage}")
    }
}

/** Concrete remote backend with REAL I/O through the seam: tables
  * resolve via Spark's own JDBC source against any JDBC endpoint — in
  * tests, an embedded Derby database (its jars ship with Spark), the
  * loopback stand-in for a warehouse behind a JDBC URL. Unlike
  * [[BigQueryResolver]] (whose connector jar cannot exist in this
  * zero-egress environment), every [[resolve]] here opens a real
  * connection, reads the remote schema, and pulls rows through the JDBC
  * scan — and Spark pushes filters and column pruning into the remote
  * SQL, so the seam keeps the pushdown discipline at scale.
  *
  * [[persist]] closes the loop in the other direction (a materialized
  * result written back through the same endpoint), which is what the
  * reference's materialize-derived-tables DAG step does against real
  * BigQuery (reference src/session/pipeline.rs: CREATE TABLE + INSERT
  * of each derived query's result).
  */
final class JdbcResolver(url: String, options: Map[String, String] = Map.empty)
    extends TableResolver {

  val mode: ExecutorMode = ExecutorMode.Jdbc

  private def reader(spark: SparkSession) =
    spark.read.format("jdbc").option("url", url).options(options)

  def resolve(spark: SparkSession, name: String): DataFrame =
    try reader(spark).option("dbtable", name).load()
    catch {
      case e: Exception if missingTable(e) =>
        throw GraftError.UnknownTable(name)
      case e: Exception =>
        throw GraftError.QueryError(s"JDBC backend failed resolving $name ($url): ${e.getMessage}")
    }

  /** Missing-TABLE detection by SQLState, not message substring —
    * engines say "does not exist" about schemas, columns, and functions
    * too, and those must surface as QueryError (a config fault), not
    * UnknownTable. 42X05 = Derby table/view not found; 42S02 = the
    * SQL-standard base-table-not-found class (H2, MySQL, SQLServer);
    * 42P01 = Postgres undefined_table.
    */
  private val MissingTableStates = Set("42X05", "42S02", "42P01")
  private def missingTable(t: Throwable): Boolean =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8).exists {
      case sql: java.sql.SQLException =>
        Option(sql.getSQLState).exists(MissingTableStates.contains)
      case _ => false
    }

  /** Write a result back through the endpoint (append-or-create). */
  def persist(df: DataFrame, name: String): Unit =
    try df.write.format("jdbc").option("url", url).options(options)
      .option("dbtable", name).mode("append").save()
    catch {
      case e: Exception =>
        throw GraftError.QueryError(s"JDBC backend failed writing $name ($url): ${e.getMessage}")
    }
}
