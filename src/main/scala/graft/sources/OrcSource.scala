package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Parity

/** ORC sink + scan roundtrip — the second columnar format a lakehouse
  * meets (Hive-era warehouses hand over ORC as often as parquet; Spark
  * ships the reader/writer natively). The fixture is lineitem written
  * ONCE to a returnflag-PARTITIONED, ZLIB-compressed ORC table (the
  * pay-once build-side of every fixture source in this package); the
  * query reads it back with a partition-pruning filter plus a
  * pushdown-eligible predicate and aggregates, and the DuckDB oracle
  * computes the same aggregate from the ORIGINAL parquet — so what is
  * verified end-to-end is that the ORC write+read preserved every
  * value, partition column included.
  *
  * Scale notes: ORC stripes carry min/max indexes exactly like parquet
  * row groups, so `l_quantity < 25` reaches the scan as a pushed
  * filter and `l_returnflag = 'A'` prunes whole partition directories
  * before any I/O (SourcesSpec pins both in the physical plan). The
  * roundtrip is the format capability a user switching storage layers
  * needs — the engine's operator surface is format-agnostic above the
  * scan.
  */
object OrcSource {

  private def orcPath(sfDir: String): String =
    s"${graft.etl.Medallion.warehouseBase}/${new java.io.File(sfDir).getName}" +
      "/fixtures/lineitem_orc_v1"

  /** Pay-once ORC table build (returnflag-partitioned, ZLIB). */
  private[graft] def lineitemOrc(spark: SparkSession, sfDir: String): DataFrame = {
    val path = orcPath(sfDir)
    val done = new java.io.File(path, "_SUCCESS")
    if (!done.exists()) {
      Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_returnflag"), col("l_linestatus"),
          col("l_quantity"), col("l_extendedprice"))
        .write.mode("overwrite")
        .option("compression", "zlib")
        .partitionBy("l_returnflag")
        .orc(path)
    }
    spark.read.orc(path)
  }

  /** Partition-pruned, predicate-pushed ORC scan + rollup. */
  def orcScan(spark: SparkSession, sfDir: String): DataFrame =
    lineitemOrc(spark, sfDir)
      .filter(col("l_returnflag") === "A" && col("l_quantity") < 25)
      .groupBy(col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_quantity")), 4).as("sum_qty"),
        round(sum(col("l_extendedprice")), 4).as("sum_price"),
        Parity.stableAvg(col("l_extendedprice")).as("avg_price"))
      .orderBy(col("l_linestatus"))

  private val orcScanOracle =
    s"""SELECT l_linestatus, COUNT(*) AS n,
       |       ROUND(SUM(l_quantity), 4) AS sum_qty,
       |       ROUND(SUM(l_extendedprice), 4) AS sum_price,
       |       ${Parity.stableAvgSql("l_extendedprice")} AS avg_price
       |FROM lineitem
       |WHERE l_returnflag = 'A' AND l_quantity < 25
       |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_orc_roundtrip" -> (orcScan _)
  )

  def oracles: Map[String, String] = Map(
    "q_orc_roundtrip" -> orcScanOracle
  )
}
