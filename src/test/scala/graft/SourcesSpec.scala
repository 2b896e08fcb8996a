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
  test("orc roundtrip prunes partitions and pushes predicates") {
    val df = graft.sources.OrcSource.orcScan(spark, sfTiny)
    // values survive the parquet -> ORC -> scan roundtrip
    val got = df.collect().map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    val want = Tables.lineitem(spark, sfTiny)
      .filter(col("l_returnflag") === "A" && col("l_quantity") < 25)
      .groupBy(col("l_linestatus")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want, s"$got != $want")
    // plan: only the A partition is read, quantity predicate is pushed
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("OrcScan") || plan.contains("FileScan orc"),
      s"not an ORC scan:\n$plan")
    assert("PartitionFilters: \\[[^\\]]*l_returnflag".r.findFirstIn(plan).isDefined,
      s"returnflag not a partition filter:\n$plan")
    assert("PushedFilters: \\[[^\\]]*LessThan\\(l_quantity".r.findFirstIn(plan).isDefined,
      s"quantity predicate not pushed:\n$plan")
  }

}
