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
  * The day-type classifier mirrors `dags/mitma/silver_mitma.py:54-83`
  * COMPLETELY: holiday→8 (via a broadcast join against [[Holidays]]'
  * ref_holidays — `silver_mitma.py:62-67`), else Sun→0, Mon→1,
  * Tue–Thu→2, Fri→5, Sat→6. The reference computes this driver-side per
  * daily file and injects a constant; here it is a broadcast hash join +
  * codegen'd CASE over the timestamp — fully distributed, no driver
  * round-trip, same mapping table. At 100 TB the holiday table is ~10
  * rows/year: a broadcast join adds zero shuffle.
  */
object SilverMobility {

  /** Weekday part of the classifier: Sun→0, Mon→1, Tue–Thu→2, Fri→5,
    * Sat→6. `weekday` is Mon=0..Sun=6, which maps 1:1 to DuckDB
    * `isodow`-1 so the oracle SQL can express the identical classifier.
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
    * is the event_type; trips is the event value. The holiday lookup is a
    * broadcast left join on the date; everything else is whole-stage-
    * codegen built-ins, and the projection prunes the parquet scan to
    * (ts, user_id, event_type, value).
    */
  def fromEvents(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val hol = Holidays.refHolidays(spark).select(col("date").as("hdate"))
    ev.select(
      to_date(col("ts")).as("date"),
      hour(col("ts")).cast("int").as("hour_period"),
      concat(lit("Z"), lpad(pmod(col("user_id"), lit(50)).cast("string"), 3, "0"))
        .as("origin_zone"),
      col("event_type").as("destination_zone"),
      col("value").as("trips"),
      dayType(col("ts")).as("wd_type"))
      .join(broadcast(hol), col("date") === col("hdate"), "left")
      .withColumn("day_type",
        when(col("hdate").isNotNull, 8).otherwise(col("wd_type")))
      .drop("hdate", "wd_type")
  }

  /** DuckDB CTE body equivalent to [[fromEvents]] (used inside oracle
    * SQL; VALUES-joined against the identical holiday list). */
  val fromEventsSql: String =
    s"""SELECT CAST(ts AS DATE) AS date,
       |       CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hour_period,
       |       'Z' || lpad(CAST(user_id % 50 AS VARCHAR), 3, '0') AS origin_zone,
       |       event_type AS destination_zone,
       |       value AS trips,
       |       CASE WHEN h.hdate IS NOT NULL THEN 8
       |            ELSE ${dayTypeSql("ts")} END AS day_type
       |FROM events
       |LEFT JOIN ${Holidays.holidaysValuesSql} AS h(hdate)
       |       ON CAST(ts AS DATE) = h.hdate""".stripMargin

  // ------------------------------------------------------------------
  /** F9: the bronze ingest projection with its `CURRENT_TIMESTAMP` audit
    * column — the all-VARCHAR bronze shape plus `ingestion_date`
    * (`dags/mitma/bronze_mitma.py:24,67`; same stamp on the gold write,
    * `dags/gravity/calculate_gold.py:43`). `current_timestamp()` is
    * nondeterministic, so this projection is EXCLUDED from the
    * oracle-hashed query surface by design (SURVEY §2.9b — two engines
    * can never hash-match a wall clock); it is pinned by
    * BronzeAuditSpec instead: schema, type, non-null, single stamp per
    * query (Spark evaluates current_timestamp once per query, mirroring
    * DuckDB's transaction-time semantics), and bounded clock skew.
    */
  def bronzeIngest(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(
        date_format(col("ts"), "yyyyMMdd").as("fecha"),
        concat(lit("Z"), lpad(pmod(col("user_id"), lit(50)).cast("string"), 3, "0"))
          .as("origen"),
        col("event_type").as("destino"),
        col("value").cast("string").as("viajes"))
      .withColumn("ingestion_date", current_timestamp())

  // ------------------------------------------------------------------
  /** F13 complete: distribution of the full holiday-aware day-type over
    * the silver table — day_type 8 is populated by 2024-01-01 and
    * 2024-01-06 in the harness window, proving the holiday branch fires.
    */
  def dayTypeHoliday(spark: SparkSession, sfDir: String): DataFrame =
    fromEvents(spark, sfDir)
      .groupBy(col("day_type"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("date")).as("n_days"),
        round(sum(col("trips")), 4).as("sum_trips"))
      .orderBy(col("day_type"))

  private val dayTypeHolidayOracle =
    s"""WITH silver AS ($fromEventsSql)
       |SELECT day_type, COUNT(*) AS n_rows,
       |       COUNT(DISTINCT date) AS n_days,
       |       ROUND(SUM(trips), 4) AS sum_trips
       |FROM silver GROUP BY day_type ORDER BY day_type""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_day_type_holiday" -> (dayTypeHoliday _)
  )

  def oracles: Map[String, String] = Map(
    "q_day_type_holiday" -> dayTypeHolidayOracle
  )
}
