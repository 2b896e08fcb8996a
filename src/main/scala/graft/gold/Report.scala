package graft.gold

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.SilverMobility

/** BQ1 — the report path (`dags/bussiness_layer/generate_report.py:
  * 105-145`) composed end-to-end: discover the target districts with a
  * driver-side DISTINCT (the reference's :137-145 hop), restrict the
  * gold typical-day patterns to them through the disjunctive OR-join
  * J5 (`origin_zone = census_section_id OR origin_zone = district_id`
  * — mobility zones mix census and district granularity), and
  * re-aggregate per (day_type, hour_period) (A3).
  *
  * Scale shape: the OR-join is executed as a UNION of two equi-joins —
  * a BroadcastNestedLoopJoin otherwise; the branches are provably
  * disjoint here (a zone is section-keyed or district-keyed, never
  * both), and the ORACLE runs the literal OR join, so the rewrite's
  * equivalence is hash-checked, not assumed. The geometry side is
  * zone-grained (dimension data) → broadcast in both branches.
  */
object Report {

  /** Zone-grained geometry dimension synthesized from silver's zone
    * universe: odd-residue zones are census-section-keyed, even-residue
    * zones are district-keyed (so BOTH OR branches do real work). */
  private def zoneGeometry(silver: DataFrame): DataFrame = {
    val z = silver.select(col("origin_zone")).distinct()
      .withColumn("zn", substring(col("origin_zone"), 2, 3).cast("int"))
    z.select(
      when(pmod(col("zn"), lit(2)) === 1, col("origin_zone"))
        .otherwise(concat(lit("S"), col("origin_zone"))).as("census_section_id"),
      when(pmod(col("zn"), lit(2)) === 1,
        concat(lit("D"), lpad(pmod(col("zn"), lit(10)).cast("string"), 2, "0")))
        .otherwise(col("origin_zone")).as("district_id"))
  }

  private val zoneGeometrySql =
    """SELECT CASE WHEN zn % 2 = 1 THEN origin_zone
      |            ELSE 'S' || origin_zone END AS census_section_id,
      |       CASE WHEN zn % 2 = 1
      |            THEN 'D' || lpad(CAST(zn % 10 AS VARCHAR), 2, '0')
      |            ELSE origin_zone END AS district_id
      |FROM (SELECT DISTINCT origin_zone,
      |             CAST(substring(origin_zone, 2, 3) AS INTEGER) AS zn
      |      FROM silver)""".stripMargin

  def bq1Report(spark: SparkSession, sfDir: String): DataFrame = {
    // gold is the MATERIALIZED typical-day table (the reference report
    // reads gold_typical_day_patterns, it never re-runs the 3σ
    // aggregation) — a parquet read per branch, no cache needed. geo
    // feeds the driver collect plus both branches — cached, or each
    // reference re-runs the silver zone-universe scan.
    val silver = SilverMobility.fromEvents(spark, sfDir)
    val gold = TypicalDay.goldTable(spark, sfDir)
    val geo = zoneGeometry(silver).cache()

    // the reference's driver-side district discovery (:137-145)
    val districts = geo.select(col("district_id")).distinct()
      .orderBy(col("district_id")).limit(8)
      .collect().map(_.getString(0)).toSeq

    val geoT = geo.filter(col("district_id").isin(districts: _*))
    // J5 as union-of-equi-joins (disjoint branches by construction)
    val viaSection = gold.join(broadcast(geoT),
      gold("origin_zone") === geoT("census_section_id"))
    val viaDistrict = gold.join(broadcast(geoT),
      gold("origin_zone") === geoT("district_id"))
    viaSection.unionByName(viaDistrict)
      .groupBy(col("day_type"), col("hour_period"))
      .agg(
        round(sum(col("total_trips")), 4).as("sum_trips"),
        // stabilized: dividing a 4dp-lattice sum by the count lands on
        // exact rounding half-boundaries — see Parity scaladoc
        graft.ops.Parity.stableAvg(col("total_trips")).as("avg_trips"),
        round(coalesce(stddev_samp(col("total_trips")), lit(0.0)), 4)
          .as("std_trips"),
        graft.ops.Parity.stableAvg(col("num_days_observed")).as("avg_days"))
      .orderBy(col("day_type"), col("hour_period"))
  }

  /** Oracle: the literal OR-join over the same synthetic geometry, with
    * the district list as the equivalent IN-subquery. */
  lazy val bq1ReportOracle: String =
    s"""WITH gold AS (${TypicalDay.oracle}),
       |silver AS (${SilverMobility.fromEventsSql}),
       |geo AS ($zoneGeometrySql),
       |target AS (SELECT DISTINCT district_id FROM geo
       |           ORDER BY district_id LIMIT 8),
       |joined AS (
       |  SELECT g.*
       |  FROM gold g JOIN geo ge
       |    ON (g.origin_zone = ge.census_section_id
       |        OR g.origin_zone = ge.district_id)
       |  WHERE ge.district_id IN (SELECT district_id FROM target))
       |SELECT day_type, hour_period,
       |       ROUND(SUM(total_trips), 4) AS sum_trips,
       |       ${graft.ops.Parity.stableAvgSql("total_trips")} AS avg_trips,
       |       ROUND(COALESCE(STDDEV_SAMP(total_trips), 0), 4) AS std_trips,
       |       ${graft.ops.Parity.stableAvgSql("num_days_observed")} AS avg_days
       |FROM joined GROUP BY 1, 2
       |ORDER BY day_type, hour_period""".stripMargin
}
