package graft

import org.apache.spark.sql.functions._

import graft.sources.CsvSources

/** Source-format scans proven against the parquet ground truth the
  * fixtures were generated from (the DuckDB oracle re-parses the same
  * files; this pins that the round-trip loses nothing).
  */
class SourcesSpec extends SparkSpec {

  test("fixed-width scan round-trips the supplier table exactly") {
    val got = CsvSources.fixedWidthScan(spark, sfTiny).collect()
      .map(r => (r.getAs[Int]("s_nationkey"),
        (r.getAs[Long]("n_suppliers"), r.getAs[Long]("min_key"),
          r.getAs[Long]("tot_cents"), r.getAs[Int]("name_w")))).toMap
    val want = Tables.supplier(spark, sfTiny)
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n"), min(col("s_suppkey")).as("mk"),
        sum(expr("CAST(round(s_acctbal * 100) AS BIGINT)")).as("tc"),
        max(length(trim(substring(col("s_name"), 1, 18)))).as("nw"))
      .collect()
      .map(r => (r.getAs[Int]("s_nationkey"),
        (r.getAs[Long]("n"), r.getAs[Long]("mk"),
          r.getAs[Long]("tc"), r.getAs[Int]("nw")))).toMap
    assert(got == want)
  }
}
