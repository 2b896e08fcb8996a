package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The silver_mobility_trips data model of the reference
  * (`dags/mitma/silver_mitma.py:84-94`: date DATE, hour_period INT,
  * origin_zone VARCHAR, destination_zone VARCHAR, trips DOUBLE,
  * day_type INT), synthesized from the harness `events` table
  * (FIXTURES.md §6 mapping).
  *
  * The day-type classifier mirrors `dags/mitma/silver_mitma.py:54-83`:
  * holiday→8, Sun→0, Mon→1, Tue–Thu→2, Fri→5, Sat→6. The reference
  * computes it driver-side per daily file and injects a constant; here it
  * is a codegen'd CASE over the timestamp — fully distributed, no
  * driver round-trip, same mapping table.
  */
object SilverMobility {

  /** Sun→0, Mon→1, Tue–Thu→2, Fri→5, Sat→6 (holiday handling is exercised
    * separately with the ref_holidays broadcast join — see Holidays).
    * `weekday` is Mon=0..Sun=6, which maps 1:1 to DuckDB `isodow`-1 so the
    * oracle SQL can express the identical classifier.
    */
  def dayType(ts: Column): Column = {
    val wd = weekday(ts)
    when(wd === 6, 0)
      .when(wd === 0, 1)
      .when(wd.between(1, 3), 2)
      .when(wd === 4, 5)
      .otherwise(6)
  }

  /** DuckDB rendering of [[dayType]] over a timestamp expression. */
  def dayTypeSql(ts: String): String =
    s"CASE WHEN isodow($ts)=7 THEN 0 WHEN isodow($ts)=1 THEN 1 " +
      s"WHEN isodow($ts) BETWEEN 2 AND 4 THEN 2 " +
      s"WHEN isodow($ts)=5 THEN 5 ELSE 6 END"

  /** events → silver_mobility_trips-shaped DataFrame.
    * origin_zone buckets user_id into 50 synthetic zones; destination_zone
    * is the event_type; trips is the event value. All expressions are
    * whole-stage-codegen built-ins; the projection prunes the parquet scan
    * to (ts, user_id, event_type, value).
    */
  def fromEvents(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    ev.select(
      to_date(col("ts")).as("date"),
      hour(col("ts")).cast("int").as("hour_period"),
      concat(lit("Z"), lpad(pmod(col("user_id"), lit(50)).cast("string"), 3, "0"))
        .as("origin_zone"),
      col("event_type").as("destination_zone"),
      col("value").as("trips"),
      dayType(col("ts")).as("day_type"))
  }

  /** DuckDB CTE body equivalent to [[fromEvents]] (used inside oracle SQL). */
  val fromEventsSql: String =
    s"""SELECT CAST(ts AS DATE) AS date,
       |       CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hour_period,
       |       'Z' || lpad(CAST(user_id % 50 AS VARCHAR), 3, '0') AS origin_zone,
       |       event_type AS destination_zone,
       |       value AS trips,
       |       ${dayTypeSql("ts")} AS day_type
       |FROM events""".stripMargin
}
