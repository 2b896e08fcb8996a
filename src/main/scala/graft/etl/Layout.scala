package graft.etl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Scan-pruning data layout — the write-side half of "push down and
  * prune". Parquet readers (Spark's included) skip whole row groups
  * whose column min/max stats exclude the predicate, but stats only
  * prune if the WRITE clustered the data: a hash-scattered table has
  * every file spanning the whole key range, so a narrow key probe
  * still reads every file. `repartitionByRange` + `sortWithinPartitions`
  * produces files with disjoint key spans (a 1-D z-order), turning a
  * key-range scan from O(table) into O(matching files) — at 100 TB the
  * difference between a full-corpus scan and touching a handful of
  * files. The layout is pay-once-at-write, like `Bucketing`.
  *
  * The query result is layout-invariant (the oracle recomputes it from
  * the raw table); the pruning claim itself — sorted files have
  * narrow, disjoint spans; scattered files all straddle the probe
  * range — is asserted from the parquet FOOTER STATS in LayoutSpec,
  * i.e. against the exact metadata engines prune with.
  */
object Layout {

  private val ProbeLo = 1000L
  private val ProbeHi = 1999L

  private[graft] def scatteredPath(sfDir: String): String =
    s"${Medallion.warehouse(sfDir)}/lineitem_scattered"
  private[graft] def clusteredPath(sfDir: String): String =
    s"${Medallion.warehouse(sfDir)}/lineitem_clustered"

  private def rmTree(spark: SparkSession, dir: String): Unit = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** Write both layouts, then run the narrow key-range probe against
    * the clustered one. */
  def layoutProbe(spark: SparkSession, sfDir: String): DataFrame = {
    rmTree(spark, scatteredPath(sfDir)); rmTree(spark, clusteredPath(sfDir))
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"),
        col("l_extendedprice"))
    // round-robin scatter: the anti-layout — every file spans ~the
    // whole keyspace, min/max stats prune nothing
    li.repartition(8).write.mode("overwrite")
      .parquet(scatteredPath(sfDir))
    // range-cluster: global range partitioning assigns each key
    // interval to one task, the in-partition sort packs row groups
    // into monotone runs — file AND row-group stats become selective
    li.repartitionByRange(8, col("l_orderkey"))
      .sortWithinPartitions(col("l_orderkey"))
      .write.mode("overwrite").parquet(clusteredPath(sfDir))

    spark.read.parquet(clusteredPath(sfDir))
      .filter(col("l_orderkey").between(ProbeLo, ProbeHi))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        round(sum(col("l_quantity")), 4).as("sum_qty"),
        round(sum(col("l_extendedprice")), 4).as("sum_price"))
      .orderBy(col("l_returnflag"))
  }

  private val layoutProbeOracle =
    s"""SELECT l_returnflag, COUNT(*) AS n_rows,
       |       ROUND(SUM(l_quantity), 4) AS sum_qty,
       |       ROUND(SUM(l_extendedprice), 4) AS sum_price
       |FROM lineitem WHERE l_orderkey BETWEEN $ProbeLo AND $ProbeHi
       |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Per-file (min, max) of `l_orderkey` read from the parquet footers —
    * the same statistics a pruning reader consults. */
  private[graft] def fileKeyRanges(
      spark: SparkSession, dir: String): Seq[(Long, Long)] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    fs.listStatus(p).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).toSeq
      .map { f =>
        val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
        try {
          val stats = reader.getFooter.getBlocks.asScala.flatMap { b =>
            b.getColumns.asScala
              .filter(_.getPath.toDotString == "l_orderkey")
              .map(_.getStatistics)
          }
          (stats.map(_.genericGetMin.asInstanceOf[Long]).min,
            stats.map(_.genericGetMax.asInstanceOf[Long]).max)
        } finally reader.close()
      }
  }

  private[graft] def probeOverlaps(ranges: Seq[(Long, Long)]): Int =
    ranges.count { case (lo, hi) => lo <= ProbeHi && hi >= ProbeLo }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_layout_probe" -> (layoutProbe _)
  )

  def oracles: Map[String, String] = Map(
    "q_layout_probe" -> layoutProbeOracle
  )
}
