package graft.sources

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Parquet schema evolution: a table whose files were written under
  * different schema versions (a column added mid-history) read back as
  * ONE relation via `mergeSchema` — the lakehouse reality the
  * reference's bronze CTAS-with-inference sidesteps by re-creating
  * tables. Spark resolves the union-of-schemas at footer level;
  * missing columns surface as NULL, exactly DuckDB's
  * `union_by_name=true`, which the oracle runs over the same files.
  *
  * Scale note: schema merging reads every file footer at planning time
  * — on a 100 TB table that is why production pins the merged schema in
  * a catalog instead of re-inferring (documented; the read itself is
  * unchanged).
  */
object SchemaEvolution {

  private val FixtureVersion = 1

  private[graft] def fixtureDir(sfDir: String): File =
    new File(s"${graft.etl.Medallion.warehouseBase}/${new File(sfDir).getName}" +
      s"/fixtures/evo_v$FixtureVersion")

  /** Write the two-generation fixture once per SF: generation v1 holds
    * nations 0..12 WITHOUT n_regionkey (the pre-evolution schema),
    * v2 holds 13+ with it. */
  private[graft] def fixture(spark: SparkSession, sfDir: String): File = {
    val dir = fixtureDir(sfDir)
    val done = new File(dir, "_DONE")
    if (!done.exists()) {
      val nation = Tables.nation(spark, sfDir)
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      nation.filter(col("n_nationkey") < 13)
        .drop("n_regionkey")
        .coalesce(1).write.mode("overwrite")
        .parquet(new File(dir, "v1").getAbsolutePath)
      nation.filter(col("n_nationkey") >= 13)
        .coalesce(1).write.mode("overwrite")
        .parquet(new File(dir, "v2").getAbsolutePath)
      done.createNewFile()
    }
    dir
  }

  /** Scan both generations as one relation; pre-evolution rows carry
    * NULL in the added column. */
  def schemaMergeScan(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = fixture(spark, sfDir)
    spark.read.option("mergeSchema", "true")
      .parquet(new File(dir, "v1").getAbsolutePath,
        new File(dir, "v2").getAbsolutePath)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .orderBy(col("n_nationkey"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_schema_merge" -> (schemaMergeScan _)
  )

  def oracles(sfDir: String): Map[String, String] = {
    val dir = fixtureDir(sfDir).getAbsolutePath
    Map(
      "q_schema_merge" ->
        s"""SELECT n_nationkey, n_name, n_regionkey
           |FROM read_parquet(['$dir/v1/*.parquet', '$dir/v2/*.parquet'],
           |                  union_by_name=true)
           |ORDER BY n_nationkey""".stripMargin)
  }
}
