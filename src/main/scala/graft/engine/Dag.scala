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
    source: Option[DataFrame] = None,
    thunk: Option[() => DataFrame] = None) {
  def isSource: Boolean = sql.isEmpty
}

object DagTable {
  def source(name: String, schema: Seq[(String, String)], rows: Seq[Seq[Any]] = Nil): DagTable =
    DagTable(name, schema = Some(schema), rows = rows)
  def view(name: String, df: DataFrame): DagTable = DagTable(name, source = Some(df))
  /** A view whose BUILDER runs driver-side work (training collects,
    * checkpoints): deferring the call into the table's scheduler slot
    * lets it overlap other stages (r17 — eagerly-built views ran at
    * registration time, serializing e.g. BPE training BEFORE the DAG's
    * slot scheduler ever started).
    */
  def lazyView(name: String, mk: () => DataFrame): DagTable = DagTable(name, thunk = Some(mk))
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
object Dag {
  /** Reference default + env knob: BQ_MAX_CONCURRENCY, default 8
    * (reference src/session/pipeline.rs:48,278).
    */
  val DefaultMaxConcurrency: Int = 8
  def envMaxConcurrency: Int =
    sys.env.get("BQ_MAX_CONCURRENCY").flatMap(_.toIntOption).filter(_ > 0)
      .getOrElse(DefaultMaxConcurrency)
}

/** @param materialize when true (default — the reference's own
  *   semantics and the 100 TB posture: every derived stage is a
  *   write-once parquet checkpoint that survives its JVM and is
  *   re-readable by dependents without recomputation), derived tables
  *   materialize under `workDir`. When false — the FUSED in-memory
  *   mode (r13 verdict task 7) — each derived stage registers as a
  *   lazy temp view instead, so the whole chain collapses into one
  *   Catalyst plan evaluated at the final read: identical SQL,
  *   identical results (PipelineE2E2Spec pins fused == materialized), none of
  *   the per-stage job/commit overhead that dominates toy-scale
  *   benches. Use it for gate-scale measurement, never as the
  *   production checkpoint pattern.
  */
final class Dag(session: GraftSession, workDir: Option[Path] = None,
    materialize: Boolean = true) {

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

  def run(
      targets: Option[Seq[String]] = None,
      maxConcurrency: Int = Dag.envMaxConcurrency,
      costOf: String => Option[Long] = _ => None): DagResult = {
    val subset = targets match {
      case Some(ts) => closure(ts)
      case None => tables.keySet.toSet
    }
    runSubset(subset, maxConcurrency, costOf)
  }

  def retryFailed(prev: DagResult, maxConcurrency: Int = Dag.envMaxConcurrency): DagResult =
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

  /** Slot-based streaming execution (reference pipeline.rs:50-104
    * StreamState::ready_tables): a table starts the moment its last
    * dependency completes, bounded by `maxConcurrency` in-flight slots —
    * there is NO barrier between topological levels, so a fast branch's
    * dependents never wait for a slow sibling elsewhere in the DAG.
    * Concurrent tables become concurrent Spark jobs; the scheduler
    * interleaves their stages across the cluster.
    *
    * All scheduler state is owned by this (driver) thread; workers only
    * post completion events. One deliberate divergence from the
    * reference: its post-failure skip pass runs once per event
    * (pipeline.rs:327-341), which can strand a skip chain deeper than
    * one level with nothing in flight; here skips propagate to a
    * fixpoint so every downstream table resolves immediately.
    */
  private def runSubset(
      subset: Set[String], maxConcurrency: Int,
      costOf: String => Option[Long] = _ => None): DagResult = {
    if (subset.isEmpty) return DagResult()
    val levels = topoLevels(subset) // cycle detection: raises CircularDependency
    val slots = math.max(1, maxConcurrency)
    // Per-table unresolved deps (completed deps are removed; blocked
    // deps stay, which is what marks the table skippable).
    val pendingDeps = mutable.Map.empty[String, mutable.Set[String]]
    subset.foreach { n =>
      pendingDeps(n) = mutable.Set(deps.getOrElse(n, Nil).filter(subset.contains): _*)
    }
    val inFlight = mutable.Set[String]()
    val completed = mutable.Set[String]()
    val blocked = mutable.Set[String]()
    val succeeded = mutable.ArrayBuffer[String]()
    val failed = mutable.ArrayBuffer[TableError]()
    val skipped = mutable.ArrayBuffer[String]()
    var processed = 0
    val pool = java.util.concurrent.Executors.newFixedThreadPool(math.min(slots, subset.size))
    val events = new java.util.concurrent.LinkedBlockingQueue[(String, Option[Throwable])]()

    // Critical-path slot priority: when more tables are ready than slots
    // are free, start the one heading the longest dependency chain —
    // the classic makespan heuristic (delaying the critical path delays
    // the whole DAG; delaying a leaf delays only itself). Height is
    // pure graph arithmetic (longest chain of dependents within the
    // subset), memoized once per run; ties break by name so scheduling
    // stays deterministic.
    val dependents = subset.map(n => n -> mutable.Buffer.empty[String]).toMap
    subset.foreach(n =>
      deps.getOrElse(n, Nil).filter(subset.contains).foreach(d => dependents(d) += n))
    // Heights computed iteratively in reverse topological order — a
    // definition that recurses one frame per dependency level would
    // overflow the driver stack on a pathologically deep chain (tens of
    // thousands of tables) before any table runs.
    val height: collection.Map[String, Int] = {
      val h = mutable.Map.empty[String, Int]
      levels.reverse.foreach(_.foreach { n =>
        h(n) = 1 + dependents(n).map(h).maxOption.getOrElse(0)
      })
      h
    }
    // Cost tie-break within equal chain heights: under slot contention
    // the biggest ready table starts first, so the long pole overlaps
    // the most other work. Cost is the caller's profile-fed override
    // (e.g. a q_join_cardinality sweep) or Catalyst's own sizeInBytes
    // statistic over the table's inputs — evaluated lazily because the
    // inputs only carry statistics once the dependencies have
    // materialized, and only under contention so uncontended runs pay
    // no analysis overhead.
    val costMemo = mutable.Map.empty[String, Long]
    def cost(n: String): Long = costMemo.getOrElseUpdate(n,
      costOf(n).getOrElse(estimateCost(n)))

    def isPending(n: String) = !completed(n) && !blocked(n) && !inFlight(n)
    def spawnReady(): Unit = {
      val free = slots - inFlight.size
      if (free > 0) {
        val ready = pendingDeps.keys.toSeq
          .filter(n => isPending(n) && pendingDeps(n).isEmpty)
        val ordered =
          if (ready.size <= free) ready.sortBy(n => (-height(n), n))
          else ready.sortBy(n => (-height(n), -cost(n), n))
        ordered
          .take(free)
          .foreach { n =>
            inFlight += n
            // The completion event must post even on FATAL throwables
            // (OOM during a materialization, linkage errors): a missing
            // event would leave the driver blocked in events.take()
            // forever with the table stuck in-flight. execute() already
            // converts NonFatal failures; this is the last-resort net.
            pool.execute(() => {
              val outcome =
                try execute(n)
                catch { case t: Throwable => Some(t) }
              events.put(n -> outcome)
            })
          }
      }
    }

    try {
      spawnReady()
      while (processed < subset.size) {
        val (name, outcome) = events.take()
        processed += 1
        inFlight -= name
        outcome match {
          case None =>
            completed += name; succeeded += name
            pendingDeps.values.foreach(_ -= name)
          case Some(e) =>
            blocked += name; failed += TableError(name, e.getMessage)
        }
        var changed = true
        while (changed) {
          changed = false
          pendingDeps.keys.toSeq.sorted.foreach { n =>
            if (isPending(n) && pendingDeps(n).exists(blocked.contains)) {
              blocked += n; skipped += n; processed += 1; changed = true
            }
          }
        }
        spawnReady()
      }
    } finally pool.shutdown()
    DagResult(succeeded.toSeq, failed.toSeq, skipped.toSeq)
  }

  /** Catalyst sizeInBytes of the table's unexecuted plan — meaningful
    * once every dependency has materialized as a view (the only time
    * the scheduler asks). Sources cost their literal row count;
    * anything unresolvable costs 0 and schedules by height alone.
    */
  private def estimateCost(name: String): Long =
    tables.get(name) match {
      case Some(DagTable(_, Some(sql), _, _, _, _)) =>
        try {
          val b = session.sql(sql).queryExecution.optimizedPlan.stats.sizeInBytes
          // Plans over a stats-less leaf report the defaultSizeInBytes
          // sentinel (Long.MaxValue) — that is "unknown", not "huge";
          // treating it as huge would let every unknown table outrank
          // genuinely measured big ones.
          if (b >= BigInt(session.spark.sessionState.conf.defaultSizeInBytes)) 0L
          else if (b.isValidLong) b.toLong
          else Long.MaxValue
        } catch { case NonFatal(_) => 0L }
      case Some(t) => t.rows.size.toLong
      case None => 0L
    }

  /** Materialize one table and register it as a session view. */
  private def execute(name: String): Option[Throwable] =
    try {
      val t0 = System.nanoTime()
      val t = tables(name)
      t match {
        case DagTable(_, None, _, _, _, Some(mk)) =>
          mk().createOrReplaceTempView(name)
        case DagTable(_, None, _, _, Some(df), _) =>
          df.createOrReplaceTempView(name)
        case DagTable(_, None, Some(schema), rows, _, _) =>
          // Reference semantics (pipeline.rs:556): CREATE IF NOT EXISTS +
          // append the registered literal rows on every run.
          if (!session.listTables().contains(name)) session.createTable(name, schema)
          if (rows.nonEmpty) session.insert(name, rows)
        case DagTable(_, Some(sql), _, _, _, _) if materialize =>
          val out = dir.resolve(name).toString
          session.sql(sql).write.mode("overwrite").parquet(out)
          session.spark.read.parquet(out).createOrReplaceTempView(name)
        case DagTable(_, Some(sql), _, _, _, _) =>
          // EAGER localCheckpoint, not a bare view and not cache():
          // a bare view INLINES the stage plan at every downstream
          // reference (gopher sits inside ccnet's scorer AND its final
          // join — measured 9.4s vs the materializing path's 8.4s from
          // the recomputation), and a lazy cache defers every stage's
          // compute to the single final read, which serializes work the
          // slot scheduler overlaps in the materializing path (bpe
          // training beside the gopher→ccnet chain — measured 10.7s).
          // The eager checkpoint computes the stage NOW, inside its
          // scheduler slot, into in-memory blocks: materialization
          // semantics and concurrency without the parquet commit
          // round-trips.
          session.sql(sql).localCheckpoint().createOrReplaceTempView(name)
        case other =>
          throw new IllegalArgumentException(s"Source table ${other.name} needs a schema or view")
      }
      if (sys.props.get("graft.dag.profile").contains("1"))
        System.err.println(f"[dag] $name ${(System.nanoTime() - t0) / 1e9}%.2fs")
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
