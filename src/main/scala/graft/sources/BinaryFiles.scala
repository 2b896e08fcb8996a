package graft.sources

import java.io.File
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** `binaryFile` ingestion — Spark's opaque-bytes source and the front
  * door of every multimodal pipeline: images, audio, PDFs arrive as
  * files, and the first Spark stage reads (path, length, content)
  * rows whose `content` column then feeds the decode/feature stages
  * (graft.ops.MultimodalOps). The fixture stands a directory of files
  * derived from the documents table (one file per doc, the text's
  * bytes), so the DuckDB oracle can recompute every output column —
  * byte length and md5 — from the source TABLE while Spark computes
  * them from the FILES: the scan itself is what's verified,
  * including the path→id recovery (regexp on the file name, the
  * standard metadata-from-layout idiom).
  *
  * Scale notes: binaryFile parallelizes by file; `pathGlobFilter`
  * prunes at listing time (pinned here — the scan never opens the
  * decoy file); whole-file contents ride in one row each, so the
  * source caps sanely via `spark.sql.files.maxPartitionBytes` and
  * files-per-task packing. At 100 TB of media you shard directories
  * by date/source prefix and list in parallel — same code, deeper
  * tree.
  */
object BinaryFiles {

  private val FixtureVersion = 1
  private val NFiles = 40

  private def fixtureDir(sfDir: String): File =
    new File(s"${graft.etl.Medallion.warehouseBase}/${new File(sfDir).getName}" +
      s"/fixtures/bin_v$FixtureVersion")

  /** One `.bin` file per doc_id < [[NFiles]] (the text's UTF-8 bytes)
    * plus a `.skip` decoy that the glob filter must exclude. */
  private[graft] def docsBinDir(spark: SparkSession, sfDir: String): String = {
    val dir = fixtureDir(sfDir)
    val done = new File(dir, "_FIXTURE_OK")
    if (!done.exists()) {
      dir.mkdirs()
      val rows = Tables.documents(spark, sfDir)
        .filter(col("doc_id") < NFiles)
        .select(col("doc_id"), col("text")).orderBy(col("doc_id")).collect()
      rows.foreach { r =>
        Files.write(Paths.get(dir.getPath, f"doc_${r.getLong(0)}%05d.bin"),
          r.getString(1).getBytes("UTF-8"))
      }
      Files.write(Paths.get(dir.getPath, "decoy.skip"),
        "never read".getBytes("UTF-8"))
      Files.write(done.toPath, Array.emptyByteArray)
    }
    dir.getAbsolutePath
  }

  /** binaryFile scan: recover doc_id from the file name, emit byte
    * length and content md5 — matched against the source table by the
    * oracle (ASCII fixture text, so octet length == char length). */
  def binaryScan(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = docsBinDir(spark, sfDir)
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.bin")
      .load(dir)
      .select(
        regexp_extract(col("path"), "doc_(\\d+)\\.bin$", 1)
          .cast("long").as("doc_id"),
        col("length").as("n_bytes"),
        md5(col("content")).as("content_md5"))
      .orderBy(col("doc_id"))
  }

  private val binaryScanOracle =
    s"""SELECT doc_id, CAST(length(text) AS BIGINT) AS n_bytes,
       |       md5(text) AS content_md5
       |FROM documents WHERE doc_id < $NFiles
       |ORDER BY doc_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_binaryfile_scan" -> (binaryScan _)
  )

  def oracles: Map[String, String] = Map(
    "q_binaryfile_scan" -> binaryScanOracle
  )
}
