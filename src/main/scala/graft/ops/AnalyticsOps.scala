package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** OLAP analytics surface beyond the reference's flat GROUP BYs:
  * hierarchical aggregation (ROLLUP/CUBE with grouping markers), pivot
  * (long→wide crosstab), and frame-bounded window aggregates (rolling
  * sums). All are single-shuffle plans: rollup/cube expand grouping
  * sets BEFORE the exchange (Spark's Expand operator — each input row
  * fans out map-side, partial aggregation still applies), pivot is one
  * groupBy with conditional aggregates, and the rolling window sorts
  * within the same user partition the sessionizer already uses.
  */
object AnalyticsOps {

  // ------------------------------------------------------------ rollup
  /** ROLLUP over (returnflag, linestatus): per-pair, per-flag subtotal,
    * and grand-total rows with GROUPING() markers — the hierarchy report
    * a BI layer derives from one pass. Cast markers to int (Spark emits
    * tinyint) and keep sums on the decimal lattice (round 4).
    */
  def rollupAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping(col("l_returnflag")).cast("int").as("g1"),
        grouping(col("l_linestatus")).cast("int").as("g2"),
        count(lit(1)).as("n"),
        round(sum(col("l_quantity")), 4).as("qty_sum"))
      .orderBy(col("g1"), col("g2"), col("l_returnflag"), col("l_linestatus"))

  private val rollupAggOracle =
    """SELECT l_returnflag, l_linestatus,
      |       CAST(GROUPING(l_returnflag) AS INTEGER) AS g1,
      |       CAST(GROUPING(l_linestatus) AS INTEGER) AS g2,
      |       COUNT(*) AS n, ROUND(SUM(l_quantity), 4) AS qty_sum
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY g1, g2, l_returnflag, l_linestatus""".stripMargin

  // ------------------------------------------------------------ cube
  /** CUBE over (returnflag, linestatus): every grouping-set combination
    * including the linestatus-only marginals ROLLUP omits. */
  def cubeAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping(col("l_returnflag")).cast("int").as("g1"),
        grouping(col("l_linestatus")).cast("int").as("g2"),
        count(lit(1)).as("n"),
        round(sum(col("l_extendedprice")), 4).as("price_sum"))
      .orderBy(col("g1"), col("g2"), col("l_returnflag"), col("l_linestatus"))

  private val cubeAggOracle =
    """SELECT l_returnflag, l_linestatus,
      |       CAST(GROUPING(l_returnflag) AS INTEGER) AS g1,
      |       CAST(GROUPING(l_linestatus) AS INTEGER) AS g2,
      |       COUNT(*) AS n, ROUND(SUM(l_extendedprice), 4) AS price_sum
      |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY g1, g2, l_returnflag, l_linestatus""".stripMargin

  // ------------------------------------------------------------ pivot
  /** Long→wide pivot: documents per (source, lang) as one column per
    * language. The value list is EXPLICIT (the 5 corpus languages) —
    * the scalable form: an inferred value list costs an extra distinct
    * pass and nondeterministic column order. The oracle is the
    * conditional-aggregation rendering, which is also exactly how
    * Spark executes pivot (PivotFirst → one groupBy). */
  private val PivotLangs = Seq("de", "en", "es", "fr", "zh")

  def pivotLang(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .groupBy(col("source"))
      .pivot("lang", PivotLangs)
      .agg(count(lit(1)))
      .na.fill(0, PivotLangs)
      .select(col("source") +:
        PivotLangs.map(l => col(l).cast("long").as(s"n_$l")): _*)
      .orderBy(col("source"))

  private val pivotLangOracle = {
    val cols = PivotLangs.map(l =>
      s"CAST(SUM(CASE WHEN lang = '$l' THEN 1 ELSE 0 END) AS BIGINT) AS n_$l")
      .mkString(",\n      |       ")
    s"""SELECT source,
       |       $cols
       |FROM documents GROUP BY source ORDER BY source""".stripMargin
  }

  // ------------------------------------------------------------ rolling window
  /** Frame-bounded rolling aggregate: per user, the 4-event rolling
    * value sum (ROWS 3 PRECEDING..CURRENT) — the smoothing pass of an
    * event-monitoring pipeline — then a per-user checksum rollup so the
    * output stays compact. Window sums stay on the 2 dp value lattice
    * (exact at 4 dp); ms-epoch ordering is engine-identical and
    * tie-free ((user_id, ts) unique).
    */
  def rollingSum(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ms"))
      .rowsBetween(-3, Window.currentRow)
    Tables.events(spark, sfDir)
      .select(col("user_id"), unix_millis(col("ts")).as("ms"), col("value"))
      .withColumn("roll4", sum(col("value")).over(w))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("roll4")), 4).as("roll4_total"),
        round(max(col("roll4")), 4).as("roll4_max"))
      .orderBy(col("user_id"))
  }

  private val rollingSumOracle =
    """SELECT user_id, COUNT(*) AS n_events,
      |       ROUND(SUM(roll4), 4) AS roll4_total,
      |       ROUND(MAX(roll4), 4) AS roll4_max
      |FROM (
      |  SELECT user_id,
      |         SUM(value) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts)
      |                          ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS roll4
      |  FROM events)
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_rollup" -> (rollupAgg _),
    "q_cube" -> (cubeAgg _),
    "q_pivot" -> (pivotLang _),
    "q_rolling_sum" -> (rollingSum _)
  )

  def oracles: Map[String, String] = Map(
    "q_rollup" -> rollupAggOracle,
    "q_cube" -> cubeAggOracle,
    "q_pivot" -> pivotLangOracle,
    "q_rolling_sum" -> rollingSumOracle
  )
}
