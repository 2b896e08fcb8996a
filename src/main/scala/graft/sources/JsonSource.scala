package graft.sources

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** JSONL (newline-delimited JSON) ingestion — the interchange format a
  * training-data pipeline meets as often as CSV: crawler output, API
  * exports, annotation dumps. The scan is `spark.read.json` with schema
  * inference over a HETEROGENEOUS fixture (an `extra` field present on
  * only every 7th line — inference must union the schemas and fill the
  * gaps with NULL, exactly like parquet mergeSchema but per line), and
  * the DuckDB oracle reads the SAME file with `read_json_auto`, so the
  * parse itself is what's verified.
  *
  * Scale notes: JSONL is line-splittable (unlike the gzipped CSV
  * fixture), so a 100 TB drop parallelizes by byte range out of the
  * box; schema inference costs one extra pass — at scale, pin the
  * schema explicitly (the inferred one printed once) and inference
  * becomes a dev-time tool, not a per-run cost.
  */
object JsonSource {

  private val FixtureVersion = 1

  private def fixtureDir(sfDir: String): File =
    new File(s"${graft.etl.Medallion.warehouseBase}/${new File(sfDir).getName}/fixtures")

  /** Documents metadata as JSONL: doc_id/lang/source/n_chars on every
    * line, `extra` (a deterministic int) on every 7th. Field values are
    * alphanumeric tokens — no JSON string escaping needed, so the
    * fixture stays byte-deterministic.
    */
  private[graft] def docsJsonl(spark: SparkSession, sfDir: String): String = {
    val f = new File(fixtureDir(sfDir), s"docs_v$FixtureVersion.jsonl")
    if (!f.exists()) {
      val rows = Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .orderBy(col("doc_id"))
        .collect()
      f.getParentFile.mkdirs()
      val tmp = new File(f.getParentFile, f.getName + ".tmp")
      val w = new java.io.PrintWriter(tmp, "UTF-8")
      try rows.iterator.zipWithIndex.foreach { case (r, i) =>
        val base = s"""{"doc_id": ${r.getLong(0)}, "lang": "${r.getString(1)}", """ +
          s""""source": "${r.getString(2)}", "n_chars": ${r.getLong(3)}"""
        w.println(if (i % 7 == 0) s"""$base, "extra": ${i / 7}}""" else s"$base}")
      } finally w.close()
      if (!tmp.renameTo(f)) sys.error(s"fixture rename failed: $f")
    }
    f.getAbsolutePath
  }

  /** Inferred-schema JSONL scan + per-language rollup; `extra` exists
    * on 1-in-7 lines, so its non-null count and sum pin the NULL-fill
    * behavior of schema-unioning inference.
    */
  def jsonlScan(spark: SparkSession, sfDir: String): DataFrame = {
    val path = docsJsonl(spark, sfDir)
    spark.read.json(path)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("chars_total"),
        count(col("extra")).as("n_extra"),
        sum(col("extra")).cast("long").as("extra_sum"))
      .orderBy(col("lang"))
  }

  private def jsonlScanOracle(sfDir: String): String = {
    // oracle reads the SAME fixture file the Spark scan reads
    val path = s"${graft.etl.Medallion.warehouseBase}/${new File(sfDir).getName}" +
      s"/fixtures/docs_v$FixtureVersion.jsonl"
    s"""SELECT lang, COUNT(*) AS n_docs,
       |       CAST(SUM(n_chars) AS BIGINT) AS chars_total,
       |       COUNT(extra) AS n_extra,
       |       CAST(SUM(extra) AS BIGINT) AS extra_sum
       |FROM read_json_auto('$path')
       |GROUP BY lang ORDER BY lang""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_jsonl_scan" -> (jsonlScan _)
  )

  def oracles(sfDir: String): Map[String, String] = Map(
    "q_jsonl_scan" -> jsonlScanOracle(sfDir)
  )
}
