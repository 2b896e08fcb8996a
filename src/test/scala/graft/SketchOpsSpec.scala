package graft

import org.apache.spark.sql.functions._

import graft.ops.SketchOps

/** Semantics checks for the set-sketch family, proven inside Spark
  * against independent invariants (the DuckDB oracle — which computes
  * the bitmap query by plain set joins and the KMV bottom-k by a naive
  * global sort — is the second, external witness):
  *  - the bitmap index is EXACT: per-type popcount totals equal the
  *    distinct activity-cell counts recomputed directly, and pair
  *    intersections respect set algebra (n_both ≤ min(n1, n2),
  *    Jaccard within (0, 1e6));
  *  - the KMV estimate lands within the sketch's expected error band
  *    (~1/√k) of the exact count carried in the same row, for both
  *    the distinct estimates and the merged-sketch Jaccard.
  */
class SketchOpsSpec extends SparkSpec {

  test("bitmap index is exact and respects set algebra") {
    val rows = SketchOps.bitmapSegments(spark, sfTiny).collect()
    assert(rows.length == 10) // C(5,2) type pairs
    val exact = Tables.events(spark, sfTiny)
      .select(col("event_type"),
        (col("user_id") * 1024 +
          datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))).as("cell"))
      .distinct().groupBy(col("event_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n1") == exact(r.getAs[String]("t1")))
      assert(r.getAs[Long]("n2") == exact(r.getAs[String]("t2")))
      val both = r.getAs[Long]("n_both")
      assert(both <= math.min(r.getAs[Long]("n1"), r.getAs[Long]("n2")))
      val j = r.getAs[Long]("jaccard_e6")
      assert(j >= 0 && j <= 1000000)
    }
  }

  test("kmv estimates land inside the sketch error band") {
    val rows = SketchOps.kmvJaccard(spark, sfSmall).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      // distinct estimate: |est/n - 1| within 25% (k=128 → σ ≈ 9%)
      for ((e, n) <- Seq(("est_n1", "n1"), ("est_n2", "n2"))) {
        val est = r.getAs[Long](e).toDouble
        val tru = r.getAs[Long](n).toDouble
        assert(math.abs(est / tru - 1.0) < 0.25, s"$e=$est vs $n=$tru")
      }
      // merged-sketch Jaccard within 0.10 absolute of the exact value
      val dj = math.abs(r.getAs[Long]("kmv_jaccard_e6") -
        r.getAs[Long]("true_jaccard_e6"))
      assert(dj <= 100000, s"jaccard drift $dj")
    }
  }
}
