package graft.sources

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import graft.engine.{Dag, DagTable, GraftSession}

/** Discovery of a `root/project/dataset/table.{parquet,sql}` tree and
  * registration into a session — the Spark realization of the reference's
  * bq.loadParquetDirectory / bq.loadSqlDirectory / bq.loadDagFromDirectory
  * (reference: src/session/loader.rs discover_files, src/rpc/methods.rs).
  *
  * Tables register as views named `<project>_<dataset>_<table>` (and the
  * bare `<table>` when unambiguous). Parquet stays a lazy columnar scan —
  * never row-materialized like the reference's INSERT-literal loader
  * (reference: src/executor/yachtsql.rs:43).
  */
object DirectoryCatalog {

  final case class Discovered(
      project: String, dataset: String, table: String, path: String, isSql: Boolean) {
    def fullName: String = s"${project}_${dataset}_$table"
  }

  def discover(root: String): Seq[Discovered] = {
    val rootPath = Paths.get(root)
    require(Files.isDirectory(rootPath), s"Root path is not a directory: $root")
    def dirs(p: Path) = Files.list(p).iterator().asScala
      .filter(d => Files.isDirectory(d) && !d.getFileName.toString.contains(".")).toSeq
    // A ".parquet" entry may be a single file OR a Spark-written directory
    // of part files — both are valid tables.
    def entries(p: Path) = Files.list(p).iterator().asScala.toSeq
    (for {
      project <- dirs(rootPath)
      dataset <- dirs(project)
      f <- entries(dataset)
      name = f.getFileName.toString
      if name.endsWith(".parquet") || (name.endsWith(".sql") && Files.isRegularFile(f))
    } yield Discovered(
      project.getFileName.toString,
      dataset.getFileName.toString,
      name.replaceAll("\\.(parquet|sql)$", ""),
      f.toString,
      name.endsWith(".sql"))).sortBy(d => (d.project, d.dataset, d.table))
  }

  /** Catalog navigation (reference: bq.getProjects / bq.getDatasets /
    * bq.getTablesInDataset in src/rpc/methods.rs).
    */
  def listProjects(root: String): Seq[String] =
    discover(root).map(_.project).distinct.sorted

  def listDatasets(root: String, project: String): Seq[String] =
    discover(root).filter(_.project == project).map(_.dataset).distinct.sorted

  def listTablesIn(root: String, project: String, dataset: String): Seq[String] =
    discover(root).filter(d => d.project == project && d.dataset == dataset)
      .map(_.table).distinct.sorted

  /** Sibling `<table>.schema.json` (a ColumnDef list, reference:
    * src/session/loader.rs load_schema / src/rpc/types.rs ColumnDef) —
    * when present, the declared BigQuery types are applied as casts over
    * the parquet scan, in declared column order. Unlike the reference we
    * don't REQUIRE the file: parquet is self-describing and Spark's
    * inferred schema is authoritative when no declaration exists.
    */
  private def declaredSchema(parquetPath: String): Option[Seq[(String, String)]] = {
    val p = Paths.get(parquetPath.replaceAll("\\.parquet$", ".schema.json"))
    if (!Files.isRegularFile(p)) return None
    val json = org.json4s.jackson.JsonMethods.parse(Files.readString(p))
    import org.json4s._
    Some(json.asInstanceOf[JArray].arr.map { c =>
      val obj = c.asInstanceOf[JObject].obj.toMap
      (obj("name").asInstanceOf[JString].s, obj("type").asInstanceOf[JString].s)
    })
  }

  private def readTable(session: GraftSession, d: Discovered) = {
    val df = session.spark.read.parquet(d.path)
    declaredSchema(d.path) match {
      case Some(cols) =>
        import org.apache.spark.sql.functions.col
        df.select(cols.map { case (n, t) => col(n).cast(GraftSession.bqType(t)).as(n) }: _*)
      case None => df
    }
  }

  /** Register every parquet table as a view in the session. */
  def loadParquetDirectory(session: GraftSession, root: String): Seq[String] =
    loadParquetDirectoryInfo(session, root).map(_._1.fullName)

  /** Same registration, but returns the discovered entry plus its row
    * count — the payload the RPC layer needs for the reference's
    * ParquetTableInfo result rows (reference: rpc/types.rs:463; its
    * loader also reports the loaded row count per table). The count is a
    * parquet-footer-metadata job, not a full scan.
    */
  def loadParquetDirectoryInfo(session: GraftSession, root: String): Seq[(Discovered, Long)] = {
    val pq = discover(root).filterNot(_.isSql)
    val counted = pq.map { d =>
      val df = readTable(session, d)
      df.createOrReplaceTempView(d.fullName)
      (d, df.count())
    }
    // Bare-name aliases for unambiguous tables.
    pq.groupBy(_.table).collect { case (t, Seq(only)) =>
      readTable(session, only).createOrReplaceTempView(t)
    }
    counted
  }

  /** SQL-ONLY DAG registration (reference: manager.rs:282-312
    * load_sql_directory): the discovered .sql files become derived DAG
    * tables; parquet files are NOT loaded and no source views are
    * created. Sources are expected to exist in the session already (e.g.
    * a prior loadParquetDirectory call) — exactly the reference's
    * side-effect contract, which differs from [[loadDagFrom]].
    */
  def loadSqlDag(session: GraftSession, root: String, workDir: Option[Path] = None): (Dag, Seq[Discovered]) = {
    val sql = discover(root).filter(_.isSql)
    val dag = new Dag(session, workDir)
    dag.register(sql.map(d => DagTable.derived(d.table, Files.readString(Paths.get(d.path)))))
    (dag, sql)
  }

  /** Build a Dag: parquet files as source views, .sql files as derived
    * tables (dependency-ordered, materialized on run()).
    */
  def loadDag(session: GraftSession, root: String, workDir: Option[Path] = None): Dag =
    loadDagFrom(session, root, workDir)._1

  /** [[loadDag]] plus the per-file info the RPC layer serializes into the
    * reference's LoadDagFromDirectoryResult (rpc/types.rs:481): parquet
    * sources with row counts, and the .sql computed tables.
    */
  def loadDagFrom(session: GraftSession, root: String, workDir: Option[Path] = None)
      : (Dag, Seq[(Discovered, Long)], Seq[Discovered]) = {
    val discovered = discover(root)
    val dag = new Dag(session, workDir)
    val srcInfo = discovered.filterNot(_.isSql).map { d =>
      (d, readTable(session, d).count())
    }
    val sources = srcInfo.map { case (d, _) =>
      DagTable.view(d.table, readTable(session, d))
    }
    val sql = discovered.filter(_.isSql)
    val derived = sql.map { d =>
      DagTable.derived(d.table, Files.readString(Paths.get(d.path)))
    }
    dag.register(sources ++ derived)
    (dag, srcInfo, sql)
  }
}
