package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Bucketed co-located join — the pre-shuffle storage layout the brief's
  * scale checklist calls for. Both fact tables are written ONCE,
  * bucketed (and sort-ordered) on the join key via `bucketBy`; the join
  * then reads bucket files pairwise and performs a sort-merge join with
  * NO Exchange on either side. At 100 TB this turns the recurring
  * orders⋈lineitem shuffle — the single largest network cost in the
  * star schema — into a purely local merge, paid once at write time.
  *
  * The reference has no analogue (DuckDB is single-node; its "layout
  * tuning" is insertion-order relaxation, `dags/ducklake_utils.py:68`);
  * this is the Spark-native equivalent of that concern at cluster scale.
  */
object Bucketing {

  /** Write both sides bucketed on the join key if not already in this
    * session's catalog (saveAsTable into the session warehouse; bucket
    * metadata lives in the session catalog). The in-memory catalog dies
    * with the session while the warehouse directory survives, so a
    * not-in-catalog table's stale location is deleted before the
    * CREATE — also what keeps runs at different scale factors from
    * reading each other's buckets. */
  /** Scale-factor-qualified table name: a session may serve queries at
    * several scale factors (specs do), and a name keyed only on the
    * table would silently join the FIRST factor's data on later calls. */
  private def tbl(name: String, sfDir: String): String =
    s"${name}_${new java.io.File(sfDir).getName.replace('.', '_')}"

  private def ensure(spark: SparkSession)(
      table: String, write: String => Unit): Unit =
    if (!spark.catalog.tableExists(table)) {
      val wh = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), table)
      val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(wh)) fs.delete(wh, true)
      write(table)
    }

  private[graft] def ensureBucketed(spark: SparkSession, sfDir: String): Unit = {
    ensure(spark)(tbl("orders_bucketed", sfDir), t =>
      Tables.orders(spark, sfDir)
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable(t))
    ensure(spark)(tbl("lineitem_bucketed", sfDir), t =>
      Tables.lineitem(spark, sfDir)
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable(t))
  }

  /** The purchase-graph edge table (distinct customer–supplier pairs),
    * written ONCE per session+SF in BOTH hop orientations — bucketed on
    * `c` and on `s` — so every PageRank iteration joins against a
    * pre-partitioned copy and the edge table itself never shuffles
    * (see [[graft.ops.GraphOps.pagerank]]). This is the pay-once layout
    * the 100 TB story needs: the distinct-pair build (the one real
    * shuffle) happens at write time, and each of the k iterations reads
    * bucket files co-located on its hop key. Returns (byC, byS). */
  private[graft] def ensurePagerankEdges(
      spark: SparkSession, sfDir: String): (DataFrame, DataFrame) = {
    def edges = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("s"))
      .distinct()
    ensure(spark)(tbl("edges_by_c", sfDir), t =>
      edges.write.bucketBy(8, "c").sortBy("c")
        .mode("overwrite").saveAsTable(t))
    ensure(spark)(tbl("edges_by_s", sfDir), t =>
      edges.write.bucketBy(8, "s").sortBy("s")
        .mode("overwrite").saveAsTable(t))
    (spark.table(tbl("edges_by_c", sfDir)),
      spark.table(tbl("edges_by_s", sfDir)))
  }

  /** The co-located join itself: orders⋈lineitem on the bucket key,
    * rolled up per order priority. [[BucketingSpec]] asserts the plan
    * contains no shuffle on either join input. */
  def bucketedJoin(spark: SparkSession, sfDir: String): DataFrame = {
    ensureBucketed(spark, sfDir)
    val o = spark.table(tbl("orders_bucketed", sfDir))
    val l = spark.table(tbl("lineitem_bucketed", sfDir))
    o.join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy(col("o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("n_lines"),
        round(sum(col("l_quantity")), 4).as("sum_qty"),
        round(sum(col("o_totalprice") * col("l_discount")), 4).as("weighted"))
      .orderBy(col("priority"))
  }

  private val bucketedJoinOracle =
    """SELECT o_orderpriority AS priority, COUNT(*) AS n_lines,
      |       ROUND(SUM(l_quantity), 4) AS sum_qty,
      |       ROUND(SUM(o_totalprice * l_discount), 4) AS weighted
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY 1 ORDER BY priority""".stripMargin

  // ------------------------------------------------------ bucket pruning
  /** Bucket PRUNING — the read-side payoff of [[ensureBucketed]] beyond
    * the exchange-free join: an equality predicate on the bucket column
    * tells the scan which single bucket file can hold the key, so 7 of
    * 8 bucket files are never opened (`SelectedBucketsCount: 1 out of
    * 8` in the scan node — pinned in BucketingSpec). The point-lookup
    * analogue of partition pruning, one storage layer down: at 100 TB
    * with thousands of buckets, a keyed read touches one file per
    * partition instead of all of them.
    *
    * The probe keys are a small IN-list (three orderkeys spread across
    * distinct buckets), so the scan proves multi-bucket selection too;
    * the oracle recomputes the same rows from raw parquet.
    */
  def bucketPruning(spark: SparkSession, sfDir: String): DataFrame = {
    ensureBucketed(spark, sfDir)
    spark.table(tbl("lineitem_bucketed", sfDir))
      .filter(col("l_orderkey").isin(1L, 7L, 32L))
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_lines"),
        round(sum(col("l_extendedprice")), 4).as("sum_price"))
      .orderBy(col("l_orderkey"))
  }

  private val bucketPruningOracle =
    """SELECT l_orderkey, COUNT(*) AS n_lines,
      |       ROUND(SUM(l_extendedprice), 4) AS sum_price
      |FROM lineitem WHERE l_orderkey IN (1, 7, 32)
      |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bucketed_join" -> (bucketedJoin _),
    "q_bucket_pruning" -> (bucketPruning _)
  )

  def oracles: Map[String, String] = Map(
    "q_bucketed_join" -> bucketedJoinOracle,
    "q_bucket_pruning" -> bucketPruningOracle
  )
}
