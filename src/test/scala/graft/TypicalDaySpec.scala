package graft

import org.apache.spark.sql.functions._

import graft.etl.SilverMobility
import graft.gold.TypicalDay

class TypicalDaySpec extends SparkSpec {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("day_type mapping matches the reference table (silver_mitma.py:66-81)") {
    import spark.implicits._
    // 2023-04-02 Sun, 03 Mon, 04 Tue, 05 Wed, 06 Thu, 07 Fri, 08 Sat
    val df = Seq("2023-04-02", "2023-04-03", "2023-04-04", "2023-04-05",
      "2023-04-06", "2023-04-07", "2023-04-08")
      .toDF("d")
      .select(SilverMobility.dayType(to_timestamp(col("d"))).as("dt"))
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(0, 1, 2, 2, 2, 5, 6))
  }

  test("window formulation == reference's stats-CTE + join-back formulation") {
    val silver = SilverMobility.fromEvents(spark, sfTiny).cache()
    val keys = Seq("day_type", "hour_period", "origin_zone", "destination_zone")

    // Literal port of new_gold.py:31-79 (two scans + join) as the in-Spark oracle.
    val stats = silver.groupBy(keys.map(col): _*)
      .agg(avg(col("trips")).as("avg_t"), stddev_samp(col("trips")).as("std_t"))
    val filtered = silver.join(stats, keys)
      .filter(col("std_t").isNull || col("std_t") === 0 ||
        col("trips").between(col("avg_t") - lit(3) * col("std_t"),
                             col("avg_t") + lit(3) * col("std_t")))
    val joinBack = filtered.groupBy(keys.map(col): _*)
      .agg(
        round(sum(col("trips")), 4).as("total_trips"),
        graft.ops.Parity.stableAvg(col("trips")).as("avg_trips"),
        round(coalesce(stddev_samp(col("trips")), lit(0.0)), 4).as("std_trips"),
        countDistinct(col("date")).as("num_days_observed"))
      .orderBy(keys.map(col): _*)

    assertSameResult(TypicalDay.fromSilver(silver), joinBack)
    silver.unpersist()
  }

  test("3σ filter keeps singleton groups (std NULL) and zero-variance groups") {
    import spark.implicits._
    val silver = (Seq(
      // singleton group: std NULL → kept
      ("2023-04-03", 8, "A", "X", 100.0, 1),
      // zero-variance group → kept
      ("2023-04-03", 9, "A", "X", 5.0, 1),
      ("2023-04-04", 9, "A", "X", 5.0, 1),
      // group with an outlier: 15 values near 10 and one at 1000.
      // (With n points the max z-score is (n-1)/sqrt(n), so n must be ≥13
      // for a 3σ rejection to even be possible — n=16 gives z≈3.75.)
      ("2023-04-18", 10, "A", "X", 1000.0, 1)) ++
      (1 to 15).map(i => (f"2023-04-$i%02d", 10, "A", "X", 10.0 + (i % 3) * 0.1, 1)))
      .toDF("d", "hour_period", "origin_zone", "destination_zone", "trips", "day_type")
      .withColumn("date", to_date(col("d"))).drop("d")
    val gold = TypicalDay.fromSilver(silver).collect()
      .map(r => (r.getInt(1), r.getLong(7))).toMap // hour -> num_days_observed
    assert(gold(8) == 1L)   // singleton kept
    assert(gold(9) == 2L)   // zero-variance kept
    assert(gold(10) == 15L) // outlier 1000.0 rejected, 15 of 16 days kept
  }
}
