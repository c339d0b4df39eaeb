package graft.engine

import java.nio.file.{Files, Path}

import scala.collection.mutable
import scala.util.control.NonFatal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnresolvedWith}

/** One table in the pipeline: a source (schema + literal rows, or an
  * existing DataFrame) or a derived table (SQL over other tables).
  * Reference: src/session/pipeline.rs PipelineTable / rpc DagTableDef.
  */
final case class DagTable(
    name: String,
    sql: Option[String] = None,
    schema: Option[Seq[(String, String)]] = None,
    rows: Seq[Seq[Any]] = Nil,
    source: Option[DataFrame] = None) {
  def isSource: Boolean = sql.isEmpty
}

object DagTable {
  def source(name: String, schema: Seq[(String, String)], rows: Seq[Seq[Any]] = Nil): DagTable =
    DagTable(name, schema = Some(schema), rows = rows)
  def view(name: String, df: DataFrame): DagTable = DagTable(name, source = Some(df))
  def derived(name: String, sql: String): DagTable = DagTable(name, sql = Some(sql))
}

final case class TableError(table: String, error: String)

final case class DagResult(
    succeeded: Seq[String] = Nil,
    failed: Seq[TableError] = Nil,
    skipped: Seq[String] = Nil) {
  def allSucceeded: Boolean = failed.isEmpty && skipped.isEmpty
}

/** Dependency-ordered materializing pipeline over a [[GraftSession]]
  * (reference: src/session/pipeline.rs).
  *
  * Differences from the reference, by design:
  *   - dependencies come from Spark's own SQL parser (UnresolvedRelation
  *     set minus CTE names), not substring matching
  *     (reference: pipeline.rs:595 extract_dependencies);
  *   - derived tables materialize as parquet snapshots — columnar,
  *     splittable, re-readable — instead of row-literal INSERTs
  *     (reference: pipeline.rs:511 execute_table), so a 100 TB derived
  *     table is written once by executors, never serialized through a
  *     driver-side SQL string.
  *
  * Matching semantics: re-running a derived table recomputes it from
  * current upstream state; a failed table blocks (skips) its dependents;
  * `run(targets)` executes the transitive dependency closure;
  * `retryFailed` re-runs failed+skipped only; `register` upserts and
  * re-resolves dependencies; cycles are rejected.
  */
final class Dag(session: GraftSession, workDir: Option[Path] = None) {

  private val tables = mutable.LinkedHashMap[String, DagTable]()
  private val deps = mutable.LinkedHashMap[String, Seq[String]]()
  private lazy val dir: Path =
    workDir.getOrElse(Files.createTempDirectory("graft-dag"))

  /** Table names become temp-view names AND filesystem paths under the
    * work directory; restrict to safe identifiers so a name like
    * "../../etc" can never escape `dir` (overwrite mode deletes the
    * target before writing).
    */
  private val SafeName = "^[A-Za-z_][A-Za-z0-9_]*$".r

  def register(defs: Seq[DagTable]): Seq[(String, Seq[String])] = {
    defs.find(d => SafeName.findFirstIn(d.name).isEmpty).foreach { bad =>
      throw graft.api.GraftError.InvalidParams(
        s"Invalid table name '${bad.name}': must match ${SafeName.regex}")
    }
    defs.foreach(d => tables.put(d.name, d))
    // (Re-)resolve dependencies for every derived table: a later
    // registration can introduce a table an earlier SQL referenced.
    tables.values.foreach { t =>
      deps.put(t.name, t.sql.map(extractDependencies).getOrElse(Nil))
    }
    defs.map(d => d.name -> deps(d.name))
  }

  /** Table names referenced by `sql`, restricted to registered tables,
    * excluding CTE names, case-insensitive (reference semantics).
    */
  private[engine] def extractDependencies(sql: String): Seq[String] = {
    val root: LogicalPlan =
      try session.spark.sessionState.sqlParser.parsePlan(sql)
      catch { case NonFatal(_) => return Nil }
    // CTE definition bodies are held in UnresolvedWith.cteRelations, which
    // plan.collect does NOT traverse — walk them explicitly (recursively,
    // for WITH inside WITH).
    val cteNames = mutable.Set[String]()
    val referenced = mutable.Set[String]()
    val work = mutable.Stack[LogicalPlan](root)
    while (work.nonEmpty) {
      val p = work.pop()
      p.foreach {
        case w: UnresolvedWith =>
          w.cteRelations.foreach { cte => cteNames += cte._1.toLowerCase; work.push(cte._2) }
        case r: UnresolvedRelation =>
          referenced += r.multipartIdentifier.last.toLowerCase
        case _ =>
      }
    }
    val external = referenced.toSet -- cteNames
    tables.keys.filter(k => external.contains(k.toLowerCase)).toSeq.sorted
  }

  def getTables: Seq[(String, Option[String], Boolean, Seq[String])] =
    tables.values.map(t => (t.name, t.sql, t.isSource, deps.getOrElse(t.name, Nil))).toSeq

  def run(targets: Option[Seq[String]] = None, maxConcurrency: Int = 1): DagResult = {
    val subset = targets match {
      case Some(ts) => closure(ts)
      case None => tables.keySet.toSet
    }
    runSubset(subset, maxConcurrency)
  }

  def retryFailed(prev: DagResult, maxConcurrency: Int = 1): DagResult =
    runSubset(prev.failed.map(_.table).toSet ++ prev.skipped.toSet, maxConcurrency)

  def clear(): Unit = {
    tables.keys.foreach(n => session.spark.catalog.dropTempView(n))
    tables.clear(); deps.clear()
  }

  private def closure(targets: Seq[String]): Set[String] = {
    val needed = mutable.Set[String]()
    val stack = mutable.Stack[String](targets: _*)
    while (stack.nonEmpty) {
      val n = stack.pop()
      if (needed.add(n)) deps.getOrElse(n, Nil).foreach(stack.push)
    }
    needed.toSet
  }

  private def runSubset(subset: Set[String], maxConcurrency: Int): DagResult = {
    if (subset.isEmpty) return DagResult()
    val levels = topoLevels(subset)
    val blocked = mutable.Set[String]()
    val succeeded = mutable.ArrayBuffer[String]()
    val failed = mutable.ArrayBuffer[TableError]()
    val skipped = mutable.ArrayBuffer[String]()

    for (level <- levels) {
      val (toSkip, toRun) = level.partition(n => deps.getOrElse(n, Nil).exists(blocked.contains))
      toSkip.foreach { n => blocked += n; skipped += n }
      val results: Seq[(String, Option[Throwable])] =
        if (maxConcurrency <= 1 || toRun.size <= 1) toRun.map(n => n -> execute(n))
        else {
          // Level-parallel execution: independent tables become concurrent
          // Spark jobs (the scheduler interleaves their stages), bounded
          // like the reference's streaming mode (pipeline.rs:48).
          import java.util.concurrent.Executors
          import scala.concurrent._
          import scala.concurrent.duration.Duration
          val pool = Executors.newFixedThreadPool(math.min(maxConcurrency, toRun.size))
          implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
          try Await.result(Future.sequence(toRun.map(n => Future(n -> execute(n)))), Duration.Inf)
          finally pool.shutdown()
        }
      results.foreach {
        case (n, None) => succeeded += n
        case (n, Some(e)) => blocked += n; failed += TableError(n, e.getMessage)
      }
    }
    DagResult(succeeded.toSeq, failed.toSeq, skipped.toSeq)
  }

  /** Materialize one table and register it as a session view. */
  private def execute(name: String): Option[Throwable] =
    try {
      val t = tables(name)
      t match {
        case DagTable(_, None, _, _, Some(df)) =>
          df.createOrReplaceTempView(name)
        case DagTable(_, None, Some(schema), rows, _) =>
          // Reference semantics (pipeline.rs:556): CREATE IF NOT EXISTS +
          // append the registered literal rows on every run.
          if (!session.listTables().contains(name)) session.createTable(name, schema)
          if (rows.nonEmpty) session.insert(name, rows)
        case DagTable(_, Some(sql), _, _, _) =>
          val out = dir.resolve(name).toString
          session.sql(sql).write.mode("overwrite").parquet(out)
          session.spark.read.parquet(out).createOrReplaceTempView(name)
        case other =>
          throw new IllegalArgumentException(s"Source table ${other.name} needs a schema or view")
      }
      None
    } catch { case NonFatal(e) => Some(e) }

  private[engine] def topoLevels(subset: Set[String]): Seq[Seq[String]] = {
    val inDeg = mutable.Map[String, Int]()
    val dependents = mutable.Map[String, mutable.Buffer[String]]()
    subset.foreach { n =>
      val ds = deps.getOrElse(n, Nil).filter(subset.contains)
      inDeg(n) = ds.size
      ds.foreach(d => dependents.getOrElseUpdate(d, mutable.Buffer()) += n)
    }
    val levels = mutable.ArrayBuffer[Seq[String]]()
    var processed = 0
    while (inDeg.nonEmpty) {
      val level = inDeg.collect { case (n, 0) => n }.toSeq.sorted
      // Reference raises cycles as InvalidRequest (session/pipeline.rs:475).
      if (level.isEmpty)
        throw graft.api.GraftError.CircularDependency()
      level.foreach { n =>
        inDeg.remove(n)
        dependents.getOrElse(n, Nil).foreach(d => inDeg.updateWith(d)(_.map(_ - 1)))
      }
      processed += level.size
      levels += level
    }
    levels.toSeq
  }
}
