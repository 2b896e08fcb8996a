package graft.gold

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.etl.SilverMobility

/** The reference's flagship "typical day" gold aggregation
  * (`dags/mitma/new_gold.py:31-79`): per (day_type, hour_period,
  * origin_zone, destination_zone) compute avg/stddev of trips, reject
  * rows outside the 3σ band (keeping groups where σ is NULL or 0), then
  * re-aggregate total/avg/std/num_days_observed.
  *
  * Spark-first rendering: the reference's stats-CTE + self-join-back is
  * re-expressed as a window over the 4 group keys. That turns two scans
  * of silver + a join (two shuffle subtrees in a naive port) into a
  * SINGLE exchange: Exchange(4 keys) → Sort → Window(avg, stddev) →
  * Filter → HashAggregate, and the final groupBy reuses the same hash
  * partitioning so no second shuffle of the fact table is needed. At
  * 100 TB this is the difference between shuffling the fact table once
  * versus twice. Semantics are identical to the join-back (the window
  * frame is the whole partition = the group).
  */
object TypicalDay {

  private val keys = Seq("day_type", "hour_period", "origin_zone", "destination_zone")

  /** Gold typical-day patterns from a silver-shaped frame. */
  def fromSilver(silver: DataFrame): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
    val withStats = silver
      .withColumn("avg_t", avg(col("trips")).over(w))
      .withColumn("std_t", stddev_samp(col("trips")).over(w))
    // Filter mirrors new_gold.py:60-66: keep when σ NULL/0 or inside 3σ.
    val filtered = withStats.filter(
      col("std_t").isNull || col("std_t") === 0 ||
        col("trips").between(
          col("avg_t") - lit(3) * col("std_t"),
          col("avg_t") + lit(3) * col("std_t")))
    filtered
      .groupBy(keys.map(col): _*)
      .agg(
        round(sum(col("trips")), 4).as("total_trips"),
        // stabilized avg: see graft.ops.Parity scaladoc (float parity)
        graft.ops.Parity.stableAvg(col("trips")).as("avg_trips"),
        round(coalesce(stddev_samp(col("trips")), lit(0.0)), 4).as("std_trips"),
        countDistinct(col("date")).as("num_days_observed"))
      .orderBy(keys.map(col): _*)
  }

  def query(spark: SparkSession, sfDir: String): DataFrame =
    fromSilver(SilverMobility.fromEvents(spark, sfDir))

  /** The materialized gold patterns table. The reference writes
    * `gold_typical_day_patterns` once (`dags/mitma/new_gold.py:31-79`)
    * and every report-layer consumer READS the table
    * (`dags/bussiness_layer/generate_report.py:105-145`) instead of
    * re-running the 3σ aggregation. Mirrored here exactly like
    * `GravityOps.goldRanking`: first caller per session+SF computes and
    * writes parquet; later consumers pay a table read. Parquet
    * round-trips every double bit-exactly, so downstream oracles are
    * unchanged. At 100 TB this is one fact-table shuffle per day, not
    * one per report query.
    */
  def goldTable(spark: SparkSession, sfDir: String): DataFrame =
    graft.etl.Medallion.materializeOnce(spark,
      s"${graft.etl.Medallion.warehouse(sfDir)}/gold_typical_day_patterns") {
      query(spark, sfDir)
    }

  /** Peak hour per day_type from the gold patterns — the report's
    * pandas-side `idxmax` (`dags/mitma/generate_report.py:123`) brought
    * into the engine as a ranking window (SURVEY.md §2.5): re-aggregate
    * gold to (day_type, hour), then row_number over total DESC picks the
    * peak with a deterministic hour tie-break. Reads the materialized
    * gold table, as the reference report does.
    */
  def peakHour(spark: SparkSession, sfDir: String): DataFrame = {
    val gold = goldTable(spark, sfDir)
    val byHour = gold.groupBy(col("day_type"), col("hour_period"))
      .agg(round(sum(col("total_trips")), 4).as("hour_trips"))
    val w = Window.partitionBy(col("day_type"))
      .orderBy(col("hour_trips").desc, col("hour_period").asc)
    byHour.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("day_type"), col("hour_period").as("peak_hour"),
        col("hour_trips").as("peak_trips"))
      .orderBy(col("day_type"))
  }

  /** Nested-WITH embedding of the full typical-day oracle as the gold
    * CTE (DuckDB accepts a WITH inside a CTE body). */
  lazy val peakHourOracle: String =
    s"""WITH gold AS ($oracle),
       |by_hour AS (
       |  SELECT day_type, hour_period,
       |         ROUND(SUM(total_trips), 4) AS hour_trips
       |  FROM gold GROUP BY 1, 2)
       |SELECT day_type, hour_period AS peak_hour, hour_trips AS peak_trips
       |FROM (SELECT day_type, hour_period, hour_trips,
       |             ROW_NUMBER() OVER (PARTITION BY day_type
       |                                ORDER BY hour_trips DESC, hour_period ASC) AS rk
       |      FROM by_hour)
       |WHERE rk = 1 ORDER BY day_type""".stripMargin

  /** DuckDB oracle: the reference's literal CTE shape (stats → join-back →
    * re-agg), proving the window formulation is semantically identical.
    */
  val oracle: String =
    s"""WITH silver AS (${SilverMobility.fromEventsSql}),
       |stats AS (
       |  SELECT day_type, hour_period, origin_zone, destination_zone,
       |         AVG(trips) AS avg_trips, STDDEV_SAMP(trips) AS std_trips
       |  FROM silver
       |  GROUP BY day_type, hour_period, origin_zone, destination_zone),
       |outlier_filtered AS (
       |  SELECT s.*
       |  FROM silver s
       |  JOIN stats st
       |    ON s.day_type = st.day_type AND s.hour_period = st.hour_period
       |   AND s.origin_zone = st.origin_zone
       |   AND s.destination_zone = st.destination_zone
       |  WHERE st.std_trips IS NULL OR st.std_trips = 0
       |     OR s.trips BETWEEN st.avg_trips - 3 * st.std_trips
       |                    AND st.avg_trips + 3 * st.std_trips)
       |SELECT day_type, hour_period, origin_zone, destination_zone,
       |       ROUND(SUM(trips), 4) AS total_trips,
       |       CAST((2*CAST(ROUND(ROUND(SUM(trips),4)*10000) AS BIGINT) + COUNT(trips)) // (2*COUNT(trips)) AS DOUBLE)/10000.0 AS avg_trips,
       |       ROUND(COALESCE(STDDEV_SAMP(trips), 0), 4) AS std_trips,
       |       COUNT(DISTINCT date) AS num_days_observed
       |FROM outlier_filtered
       |GROUP BY day_type, hour_period, origin_zone, destination_zone
       |ORDER BY day_type, hour_period, origin_zone, destination_zone""".stripMargin
}
