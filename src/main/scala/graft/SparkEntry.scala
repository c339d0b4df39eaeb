package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.QDef

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** All verifiable operators, keyed by SURVEY §2 query name. */
  def all: Map[String, QDef] =
    graft.queries.Relational.defs ++
      graft.queries.Relational2.defs ++
      graft.queries.Relational3.defs ++
      graft.queries.Relational4.defs ++
      graft.queries.SimHashOps.defs ++
      graft.queries.Analytics3.defs ++
      graft.sources.SourceOps.defs ++
      graft.queries.TextOps.defs ++
      graft.queries.VectorOps.defs ++
      graft.queries.IvfOps.defs ++
      graft.queries.PqOps.defs ++
      graft.queries.IvfPqOps.defs ++
      graft.queries.EventOps.defs ++
      graft.queries.Multimodal.defs ++
      graft.queries.EngineQueries.defs ++
      graft.queries.PipelineE2E.defs ++
      graft.queries.SkewOps.defs ++
      graft.queries.JoinOps.defs ++
      graft.queries.CurateOps.defs ++
      graft.queries.ClusterOps.defs ++
      graft.queries.TpchOps.defs ++
      graft.queries.TpchOps2.defs ++
      graft.queries.LayoutOps.defs ++
      graft.queries.StatsOps.defs ++
      graft.queries.ProfileOps.defs ++
      graft.queries.RetrievalOps.defs ++
      graft.sources.SkipIndex.defs ++
      graft.queries.QualityOps.defs ++
      graft.queries.IndexOps.defs ++
      graft.queries.GraphOps.defs ++
      graft.queries.IncrementalOps.defs ++
      graft.queries.CodecOps.defs ++
      graft.queries.EventOps2.defs ++
      graft.queries.Relational5.defs ++
      graft.queries.TextOps2.defs ++
      graft.queries.SpectralOps.defs ++
      graft.queries.Analytics4.defs ++
      graft.queries.LinkOps.defs ++
      graft.queries.StatsOps2.defs ++
      graft.queries.CurateOps2.defs ++
      graft.queries.SketchOps2.defs ++
      graft.queries.Analytics5.defs ++
      graft.queries.SeriesOps.defs ++
      graft.queries.BasketOps.defs ++
      graft.queries.RegressOps.defs ++
      graft.queries.GeoOps.defs ++
      graft.queries.MlOps.defs ++
      graft.queries.Analytics6.defs ++
      graft.queries.TextOps3.defs ++
      graft.queries.Analytics7.defs ++
      graft.sources.SourceOps2.defs ++
      graft.queries.EventOps3.defs ++
      graft.queries.SemDedupOps.defs ++
      graft.queries.SurvivalOps.defs ++
      graft.queries.BpeOps.defs ++
      graft.queries.SubstringDedupOps.defs ++
      graft.queries.ImportanceOps.defs ++
      graft.queries.ClassifierOps.defs ++
      graft.queries.PrivacyOps.defs ++
      graft.queries.RrfOps.defs ++
      graft.queries.RankEvalOps.defs ++
      graft.queries.EmbCompressOps.defs ++
      graft.queries.GopherOps.defs ++
      graft.queries.RankStatsOps.defs ++
      graft.queries.KMeansOps.defs ++
      graft.queries.CCNetOps.defs ++
      graft.queries.BootstrapOps.defs ++
      graft.queries.GraphAnnOps.defs ++
      graft.queries.PipelineE2E2.defs ++
      graft.queries.UnigramLmOps.defs ++
      graft.queries.LineDedupOps.defs ++
      graft.queries.DomainMixOps.defs ++
      graft.queries.KnModifiedOps.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    all("q1_pricing_summary").run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, d) => k -> d.run }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    all.collect { case (k, d) if d.oracle.isDefined => k -> d.oracle.get }
}
