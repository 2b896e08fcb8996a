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

  test("HLL registers: driver recompute, merge law, estimate identity") {
    val rows = AggOps.hllRegisters(spark, sfTiny).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    // driver-side sketch from raw keys (independent md5 + register fold)
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(k: Long): Long = java.lang.Long.parseLong(
      md.digest(k.toString.getBytes("UTF-8")).map(b => f"$b%02x")
        .mkString.take(15), 16)
    val keys = Tables.lineitem(spark, sfTiny)
      .select(col("l_returnflag"), col("l_orderkey")).distinct().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    def rho(w: Long): Int =
      if (w == 0) 30 else math.min(java.lang.Long.numberOfTrailingZeros(w) + 1, 30)
    def regs(ks: Seq[Long]): Map[Long, Int] =
      ks.map(h60).groupBy(_ % 64).map { case (j, hs) =>
        j -> hs.map(h => rho(h / 64)).max }
    def regSum(m: Map[Long, Int]): Long =
      m.values.map(r => 1L << (30 - r)).sum
    val perFlag = keys.groupBy(_._1).map { case (f, ks) =>
      f -> regs(ks.map(_._2).toSeq) }
    val allRegs = regs(keys.map(_._2).distinct.toSeq)
    // merge law: union-sketch registers == elementwise max of per-flag ones
    val mergedFromParts = perFlag.values.flatten
      .groupBy(_._1).map { case (j, rs) => j -> rs.map(_._2).max }
    assert(mergedFromParts == allRegs, "sketch merge law broken")
    (perFlag + ("ALL" -> allRegs)).foreach { case (f, m) =>
      val (nRegs, sum, est, exact, err) = rows(f)
      assert(nRegs == m.size, s"$f register count")
      assert(sum == regSum(m), s"$f register sum")
      assert(est == 709000L * 4096L * (1L << 30) / sum / 1000000L,
        s"$f estimate identity")
      assert(err == est * 1000000L / exact - 1000000L, s"$f error lattice")
      assert(math.abs(err) < 600000L, s"$f raw estimate off by >60%")
    }
  }
}
