package graft

import org.apache.spark.sql.functions._

import graft.ops.CatalogOps

/** Privacy-audit semantics (the DuckDB oracle is the external witness;
  * these pin the internal invariants).
  */
class CatalogOpsSpec extends SparkSpec {

  test("l-diversity classes mirror k-anonymity's partition") {
    val ld = CatalogOps.lDiversity(spark, sfTiny).collect()
    val ka = CatalogOps.kAnonymity(spark, sfTiny).collect()
    // same quasi-identifier ⇒ same class partition per segment
    val ldClasses = ld.map(r => r.getAs[String]("segment") -> r.getAs[Long]("n_classes")).toMap
    val kaClasses = ka.map(r => r.getAs[String]("segment") -> r.getAs[Long]("n_classes")).toMap
    assert(ldClasses == kaClasses)
    ld.foreach { r =>
      val minL = r.getAs[Long]("min_l")
      assert(minL >= 1L && minL <= 3L) // 3-value sensitive domain
      assert(r.getAs[Long]("rows_exposed") >= r.getAs[Long]("n_homogeneous"))
    }
    // exposure is bounded by the base table
    val total = Tables.customer(spark, sfTiny).count()
    assert(ld.map(_.getAs[Long]("rows_exposed")).sum <= total)
  }

  test("skew report: cardinalities exact, ratios and salt factors coherent") {
    val rows = CatalogOps.skewReport(spark, sfTiny).collect()
      .map(r => r.getAs[String]("join_key") -> r).toMap
    assert(rows.keySet == Set("l_orderkey", "l_partkey", "l_suppkey"))
    rows.foreach { case (key, r) =>
      val distinct = Tables.lineitem(spark, sfTiny)
        .select(col(key)).distinct().count()
      assert(r.getAs[Long]("n_keys") == distinct, s"$key cardinality")
      assert(r.getAs[Double]("skew_ratio") >= 1.0)
      assert(r.getAs[Long]("salt_factor") >= 1L)
      assert(r.getAs[Double]("p50") <= r.getAs[Double]("p99") + 1e-9)
      assert(r.getAs[Double]("p99") <= r.getAs[Long]("max_cnt").toDouble + 1e-9)
    }
  }
}
