package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Set-sketch operators over the event stream's activity cells — the
  * OLAP layer a warehouse team puts UNDER segment-overlap questions
  * ("how many daily-active cells do segments share?") once
  * `COUNT(DISTINCT)` pair joins stop fitting: a bitmap index (exact,
  * popcount arithmetic instead of set joins) and a KMV bottom-k sketch
  * (fixed-size, mergeable, with the estimate audited against the exact
  * answer in the same result row).
  *
  * The granule both operators share is the ACTIVITY CELL
  * `user_id·1024 + day_offset` — one integer per (user, active day),
  * the same daily-active unit the rolling-DAU query counts. Per-type
  * plain user sets would be degenerate here (every type sees every
  * user at every SF), while cells differ per type, so overlap is a
  * real measurement; the 1024 stride keeps the cell below 2^31 for
  * any user_id < 2^21 (pre-mask [[Parity.mixBucket]] covers beyond).
  *
  * Parity doctrine as everywhere: ratios live on the e6 integer
  * lattice via floor division, hashes are the house masked
  * multiplicative hash rendered by ONE definition for both engines
  * ([[Parity.mixBucketSql]]), so every value is order- and
  * partition-count-independent.
  */
object SketchOps {

  /** (t, cell): distinct activity cells per event type. */
  private def cells(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_type").as("t"),
        (col("user_id") * 1024 +
          datediff(to_date(col("ts")), lit("2024-01-01").cast("date")))
          .as("cell"))
      .distinct()

  private val cellsSql =
    """SELECT DISTINCT event_type AS t,
      |       user_id * 1024 + date_diff('day', DATE '2024-01-01',
      |                                  CAST(ts AS DATE)) AS cell
      |FROM events""".stripMargin

  // ------------------------------------------------------- bitmap index
  /** Segment-overlap matrix via a BITMAP INDEX: each (type, 64-cell
    * block) holds one long whose bits mark the block's active cells
    * (`bit_or` of `1 << cell%64` — partial-aggregable, so mappers
    * pre-OR their local bits before the one shuffle). Set sizes are
    * `sum(bit_count(mask))`; pair intersections are popcounts of
    * `mask & mask` under a block-aligned equi-join. Exact — same
    * numbers as `COUNT(DISTINCT)` joins — which is precisely what the
    * DuckDB oracle computes, by the set-join algorithm, so the two
    * engines cross-validate two genuinely different algorithms.
    *
    * Scale shape: the index is |cells|/64 rows however many segment
    * pairs are asked — pairwise overlap reuses it with a join keyed on
    * block (co-partitioned by construction), never re-shuffling the
    * raw events per pair. At 100 TB the event scan pays one
    * distinct-cell aggregation; everything after runs on the 64×
    * compressed bitmap frame. The house pattern for the raw scan at
    * that scale is the materialized-silver read ([[graft.etl.Medallion]]);
    * compressed bitmap containers (roaring) only change the constant.
    */
  def bitmapSegments(spark: SparkSession, sfDir: String): DataFrame = {
    val masks = cells(spark, sfDir)
      .groupBy(col("t"), expr("cell DIV 64").as("blk"))
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(cell % 64 AS INT)))")
        .as("mask"))
    val sizes = masks.groupBy(col("t"))
      .agg(sum(bit_count(col("mask"))).as("n"))
    val a = masks.select(col("t").as("t1"), col("blk"), col("mask").as("m1"))
    val b = masks.select(col("t").as("t2"), col("blk"), col("mask").as("m2"))
    a.join(b, Seq("blk")).filter(col("t1") < col("t2"))
      .groupBy(col("t1"), col("t2"))
      .agg(sum(bit_count(expr("m1 & m2"))).as("n_both"))
      .join(broadcast(sizes.select(col("t").as("t1"), col("n").as("n1"))), Seq("t1"))
      .join(broadcast(sizes.select(col("t").as("t2"), col("n").as("n2"))), Seq("t2"))
      .select(col("t1"), col("t2"), col("n1"), col("n2"), col("n_both"),
        expr("n_both * 1000000 DIV (n1 + n2 - n_both)").as("jaccard_e6"))
      .orderBy(col("t1"), col("t2"))
  }

  private val bitmapSegmentsOracle =
    s"""WITH cells AS ($cellsSql),
       |sizes AS (SELECT t, COUNT(*) AS n FROM cells GROUP BY 1),
       |ovl AS (
       |  SELECT a.t AS t1, b.t AS t2, COUNT(*) AS n_both
       |  FROM cells a JOIN cells b ON a.cell = b.cell AND a.t < b.t
       |  GROUP BY 1, 2)
       |SELECT t1, t2, s1.n AS n1, s2.n AS n2, n_both,
       |       n_both * 1000000 // (s1.n + s2.n - n_both) AS jaccard_e6
       |FROM ovl JOIN sizes s1 ON s1.t = t1 JOIN sizes s2 ON s2.t = t2
       |ORDER BY t1, t2""".stripMargin

  // -------------------------------------------------------- KMV sketch
  /** Bottom-k hashes per type — k smallest. */
  private val KmvK = 128

  /** KMV (k-minimum-values) distinct sketch + sketch-vs-truth audit:
    * per type, the [[KmvK]] smallest 32-bit hashes of the activity
    * cells; the distinct estimate is the textbook (k−1)·2³²/h_k, and
    * pair Jaccard is estimated from the merged bottom-k (the fraction
    * of the union's bottom-k present in both sides' sketches — the
    * mergeability that makes KMV a warehouse primitive: sketches
    * union by keeping the k smallest of the concatenation, no raw
    * data revisited). Every row carries the EXACT values next to the
    * estimates, so the result is its own error report (the
    * `q_ann_recall` pattern).
    *
    * Hash = the house masked multiplicative hash at 2³² buckets —
    * odd multiplier, so cells < 2³¹ map injectively (no tie, hence
    * deterministic bottom-k) — rendered for both engines by
    * [[Parity.mixBucketSql]].
    *
    * Scale shape — why there is no global sort: the bottom-k is
    * found by HISTOGRAM PREFILTER. One hash-aggregated pass counts
    * hashes per (type, 2²⁴-wide bucket) — a 256-row frame per type —
    * the running sum over THOSE rows (a window over ≤256 rows) finds
    * the cutoff bucket where the count reaches k, and only hashes at
    * or below the cutoff (≈ k + one bucket's worth of rows) reach the
    * final exact sort. The full hash set is never sorted and never
    * concentrated on one reducer; the oracle finds the same bottom-k
    * by the naive `ORDER BY h LIMIT k` per type, cross-validating the
    * prefilter. (The sketch-native alternative is a bounded-buffer
    * TypedImperativeAggregate; the relational form keeps the whole
    * path in codegen'd hash aggregates.)
    */
  def kmvJaccard(spark: SparkSession, sfDir: String): DataFrame = {
    // the cell frame feeds the sketch, the type list, the sizes, and
    // both sides of the exact-witness join — checkpoint the 64×-
    // collapsed frame once instead of rescanning events five times
    val c = cells(spark, sfDir).localCheckpoint()
    val hashes = c.select(col("t"),
      Parity.mixBucket(col("cell"), 2654435761L, 4294967296L).as("h"))
    // histogram prefilter: cutoff bucket per type, then exact bottom-k
    // over the ~k surviving rows only
    val hist = hashes.groupBy(col("t"), expr("h DIV 16777216").as("b"))
      .agg(count(lit(1)).as("cnt"))
    val cut = hist
      .withColumn("cum", sum(col("cnt"))
        .over(Window.partitionBy(col("t")).orderBy(col("b"))))
      .withColumn("tot", sum(col("cnt")).over(Window.partitionBy(col("t"))))
      .filter(col("cum") >= least(lit(KmvK.toLong), col("tot")))
      .groupBy(col("t")).agg(min(col("b")).as("cutb"))
    val kmin = hashes.join(broadcast(cut), Seq("t"))
      .filter(expr("h DIV 16777216") <= col("cutb"))
      .withColumn("rn", row_number()
        .over(Window.partitionBy(col("t")).orderBy(col("h"))))
      .filter(col("rn") <= KmvK).select(col("t"), col("h"))
    val est = kmin.groupBy(col("t"))
      .agg(expr(s"(count(1) - 1) * 4294967296 DIV max(h)").as("est_n"))
    // merged bottom-k per pair: both-membership count within the
    // union's bottom-k = the Jaccard numerator
    val types = c.select(col("t")).distinct()
    val pairs = types.select(col("t").as("t1"))
      .crossJoin(types.select(col("t").as("t2")))
      .filter(col("t1") < col("t2"))
    val memb = kmin.join(broadcast(pairs),
      col("t") === col("t1") || col("t") === col("t2"))
    val unionK = memb.groupBy(col("t1"), col("t2"), col("h"))
      .agg(count(lit(1)).as("sides"))
      .withColumn("rn", row_number()
        .over(Window.partitionBy(col("t1"), col("t2")).orderBy(col("h"))))
      .filter(col("rn") <= KmvK)
    val kj = unionK.groupBy(col("t1"), col("t2"))
      .agg(expr("sum(CASE WHEN sides = 2 THEN 1 ELSE 0 END) * 1000000 DIV count(1)")
        .as("kmv_jaccard_e6"))
    // exact witnesses alongside the estimates
    val sizes = c.groupBy(col("t")).agg(count(lit(1)).as("n"))
    val exact = c.select(col("t").as("t1"), col("cell"))
      .join(c.select(col("t").as("t2"), col("cell")), Seq("cell"))
      .filter(col("t1") < col("t2"))
      .groupBy(col("t1"), col("t2")).agg(count(lit(1)).as("n_both"))
    kj
      .join(broadcast(est.select(col("t").as("t1"), col("est_n").as("est_n1"))), Seq("t1"))
      .join(broadcast(est.select(col("t").as("t2"), col("est_n").as("est_n2"))), Seq("t2"))
      .join(exact, Seq("t1", "t2"))
      .join(broadcast(sizes.select(col("t").as("t1"), col("n").as("n1"))), Seq("t1"))
      .join(broadcast(sizes.select(col("t").as("t2"), col("n").as("n2"))), Seq("t2"))
      .select(col("t1"), col("t2"), col("est_n1"), col("n1"),
        col("est_n2"), col("n2"), col("kmv_jaccard_e6"),
        expr("n_both * 1000000 DIV (n1 + n2 - n_both)").as("true_jaccard_e6"))
      .orderBy(col("t1"), col("t2"))
  }

  private val kmvJaccardOracle = {
    val h = Parity.mixBucketSql("cell", 2654435761L, 4294967296L)
    s"""WITH cells AS ($cellsSql),
       |hashes AS (SELECT t, $h AS h FROM cells),
       |kmin AS (
       |  SELECT t, h FROM (
       |    SELECT t, h, row_number() OVER (PARTITION BY t ORDER BY h) AS rn
       |    FROM hashes) WHERE rn <= $KmvK),
       |est AS (SELECT t, (COUNT(*) - 1) * 4294967296 // MAX(h) AS est_n
       |        FROM kmin GROUP BY 1),
       |pairs AS (SELECT a.t AS t1, b.t AS t2
       |          FROM (SELECT DISTINCT t FROM cells) a
       |          JOIN (SELECT DISTINCT t FROM cells) b ON a.t < b.t),
       |memb AS (SELECT p.t1, p.t2, k.h FROM pairs p
       |         JOIN kmin k ON k.t = p.t1 OR k.t = p.t2),
       |unionk AS (
       |  SELECT t1, t2, sides FROM (
       |    SELECT t1, t2, h, COUNT(*) AS sides,
       |           row_number() OVER (PARTITION BY t1, t2 ORDER BY h) AS rn
       |    FROM memb GROUP BY t1, t2, h) WHERE rn <= $KmvK),
       |kj AS (SELECT t1, t2,
       |              CAST(SUM(CASE WHEN sides = 2 THEN 1 ELSE 0 END)
       |                   AS BIGINT) * 1000000
       |                // COUNT(*) AS kmv_jaccard_e6
       |       FROM unionk GROUP BY 1, 2),
       |sizes AS (SELECT t, COUNT(*) AS n FROM cells GROUP BY 1),
       |exact AS (
       |  SELECT a.t AS t1, b.t AS t2, COUNT(*) AS n_both
       |  FROM cells a JOIN cells b ON a.cell = b.cell AND a.t < b.t
       |  GROUP BY 1, 2)
       |SELECT kj.t1, kj.t2, e1.est_n AS est_n1, s1.n AS n1,
       |       e2.est_n AS est_n2, s2.n AS n2, kmv_jaccard_e6,
       |       n_both * 1000000 // (s1.n + s2.n - n_both) AS true_jaccard_e6
       |FROM kj
       |JOIN est e1 ON e1.t = kj.t1 JOIN est e2 ON e2.t = kj.t2
       |JOIN exact x ON x.t1 = kj.t1 AND x.t2 = kj.t2
       |JOIN sizes s1 ON s1.t = kj.t1 JOIN sizes s2 ON s2.t = kj.t2
       |ORDER BY kj.t1, kj.t2""".stripMargin
  }

  // ------------------------------------------------------------ registry
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bitmap_segments" -> (bitmapSegments _),
    "q_kmv_jaccard" -> (kmvJaccard _)
  )

  def oracles: Map[String, String] = Map(
    "q_bitmap_segments" -> bitmapSegmentsOracle,
    "q_kmv_jaccard" -> kmvJaccardOracle
  )
}
