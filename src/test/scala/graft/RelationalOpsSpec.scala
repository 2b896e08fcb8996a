package graft

import org.apache.spark.sql.functions._

import graft.ops.{AggOps, RelationalOps}

class RelationalOpsSpec extends SparkSpec {

  test("OR-join rewrite == naive disjunctive join (J5 semantics)") {
    val s = Tables.supplier(spark, sfTiny)
    val n = Tables.nation(spark, sfTiny)
    // Naive OR condition → BroadcastNestedLoopJoin; semantically the truth.
    val naive = s.join(n,
        s("s_nationkey") === n("n_nationkey") ||
          pmod(s("s_suppkey"), lit(25)) === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n"), round(sum(col("s_acctbal")), 4).as("sum_bal"))
      .orderBy(col("n_name"))
    assertSameResult(RelationalOps.orJoin(spark, sfTiny), naive)
  }

  test("semi + anti join partition the orders table") {
    val semiN = RelationalOps.semiJoin(spark, sfTiny)
      .agg(sum(col("n"))).first().getLong(0)
    val antiN = RelationalOps.antiJoin(spark, sfTiny)
      .agg(sum(col("n"))).first().getLong(0)
    val total = Tables.orders(spark, sfTiny).count()
    assert(semiN + antiN == total)
  }

  test("scalar-inject k is stable across runs (deterministic two-phase)") {
    val a = AggOps.scalarInject(spark, sfTiny).select("calibration_constant")
      .first().getDouble(0)
    val b = AggOps.scalarInject(spark, sfTiny).select("calibration_constant")
      .first().getDouble(0)
    assert(a == b && a > 0)
  }

  test("union-all branch arithmetic: group counts add up") {
    val df = RelationalOps.unionAll(spark, sfTiny)
    val total = df.agg(sum(col("n"))).first().getLong(0)
    val a = Tables.orders(spark, sfTiny).filter(col("o_orderstatus") === "F").count()
    val b = Tables.lineitem(spark, sfTiny).filter(col("l_returnflag") === "R").count()
    assert(total == a + b)
  }

  test("every oracle key has a query and every query oracle-or-documented") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"oracles without queries: ${os.diff(qs)}")
  }
}
