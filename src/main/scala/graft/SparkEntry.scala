package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each module under graft.* contributes a map of named queries plus the
  * DuckDB oracle SQL the driver hash-matches against at sf0.01. Every
  * query orders by its full key set and rounds doubles (4 dp) in BOTH the
  * Spark result and the oracle so float last-ulp noise can't break the
  * hash compare (SURVEY.md §7.4).
  *
  * Module maps merge through [[merged]], which REFUSES duplicate keys:
  * `Map ++` silently keeps the later entry, so a key registered by two
  * modules would shadow one implementation without any signal (this
  * exact class of bug shipped a round-14 op over an older one's key
  * until the merge guard caught it).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    gold.TypicalDay.query(spark, "/root/testdata/sf0.001")

  private def merged[V](maps: Seq[Map[String, V]]): Map[String, V] = {
    val dups = maps.flatMap(_.keys).groupBy(identity)
      .collect { case (k, ks) if ks.size > 1 => k }
    require(dups.isEmpty,
      s"duplicate registry keys across modules: ${dups.toSeq.sorted.mkString(", ")}")
    maps.reduce(_ ++ _)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    merged(Seq(
      Map[String, (SparkSession, String) => DataFrame](
        "typical_day" -> (gold.TypicalDay.query _),
        "q_peak_hour" -> (gold.TypicalDay.peakHour _),
        "q_bq1_report" -> (gold.Report.bq1Report _)
      ),
      ops.HtmlOps.queries,
      ops.EvalOps.queries,
      ops.ChatOps.queries,
      ops.RelationalOps.queries,
      ops.SketchOps.queries,
      ops.StatsOps.queries,
      ops.CurationOps.queries,
      ops.RetrievalOps.queries,
      ops.AnalyticsOps.queries,
      ops.GraphOps.queries,
      ops.PipelineOps.queries,
      ops.GravityOps.queries,
      ops.TextOps.queries,
      ops.DedupOps.queries,
      ops.SimilarityOps.queries,
      ops.MultimodalOps.queries,
      ops.CatalogOps.queries,
      etl.Medallion.queries,
      etl.Layout.queries,
      etl.Bucketing.queries,
      etl.SilverMobility.queries,
      sources.CsvSources.queries,
      sources.SchemaEvolution.queries,
      sources.JsonSource.queries,
      sources.BinaryFiles.queries,
      sources.OrcSource.queries,
      sources.Shapefile.queries))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    *
    * The driver contract is parameterless, so the one sfDir-dependent
    * oracle family (CSV fixture paths) falls back to the driver's verify
    * scale via the `graft.verify.sfdir` property; anything that knows
    * its sfDir (graft.Verify does) should call [[oracleSqlFor]] instead.
    */
  def oracleSql: Map[String, String] =
    oracleSqlFor(sys.props.getOrElse("graft.verify.sfdir", "/root/testdata/sf0.01"))

  /** [[oracleSql]] with the scale-factor directory threaded explicitly. */
  def oracleSqlFor(sfDir: String): Map[String, String] =
    merged(Seq(
      Map(
        "typical_day" -> gold.TypicalDay.oracle,
        "q_peak_hour" -> gold.TypicalDay.peakHourOracle,
        "q_bq1_report" -> gold.Report.bq1ReportOracle
      ),
      ops.HtmlOps.oracles,
      ops.EvalOps.oracles,
      ops.ChatOps.oracles,
      ops.RelationalOps.oracles,
      ops.SketchOps.oracles,
      ops.StatsOps.oracles,
      ops.CurationOps.oracles,
      ops.RetrievalOps.oracles,
      ops.AnalyticsOps.oracles,
      ops.GraphOps.oracles,
      ops.PipelineOps.oracles,
      ops.GravityOps.oracles,
      ops.TextOps.oracles,
      ops.DedupOps.oracles,
      ops.SimilarityOps.oracles,
      ops.MultimodalOps.oracles,
      ops.CatalogOps.oracles,
      etl.Medallion.oracles,
      etl.Layout.oracles(sfDir),
      etl.Bucketing.oracles,
      etl.SilverMobility.oracles,
      sources.CsvSources.oracles(sfDir),
      sources.SchemaEvolution.oracles(sfDir),
      sources.JsonSource.oracles(sfDir),
      sources.BinaryFiles.oracles,
      sources.OrcSource.oracles,
      sources.Shapefile.oracles))
}
