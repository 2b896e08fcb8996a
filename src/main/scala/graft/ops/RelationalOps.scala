package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** SURVEY.md §2.2–§2.7 relational operator battery, one named query per
  * operator family, each mirrored by DuckDB oracle SQL. All built-ins —
  * whole-stage codegen end to end, filters/projections pushed into the
  * parquet scan by Catalyst.
  */
object RelationalOps {

  /** A1+A2: multi-key hash aggregate with sum/avg/stddev_samp/countDistinct
    * (the reference's core stats pass, `dags/mitma/new_gold.py:33-44`).
    * Partial aggregation (map-side combine) is automatic; the single
    * countDistinct plans as a two-stage aggregate without expand blowup.
    */
  def aggMultikey(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 4).as("sum_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(coalesce(stddev_samp(col("l_discount")), lit(0.0)), 4).as("std_disc"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val aggMultikeyOracle: String =
    """SELECT l_returnflag, l_linestatus,
      |       ROUND(SUM(l_quantity), 4) AS sum_qty,
      |       ROUND(AVG(l_extendedprice), 4) AS avg_price,
      |       ROUND(COALESCE(STDDEV_SAMP(l_discount), 0), 4) AS std_disc,
      |       COUNT(DISTINCT l_orderkey) AS n_orders,
      |       COUNT(*) AS n_rows
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_agg_multikey" -> (aggMultikey _)
  )

  def oracles: Map[String, String] = Map(
    "q_agg_multikey" -> aggMultikeyOracle
  )
}
