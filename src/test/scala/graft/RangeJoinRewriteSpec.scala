package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.RangeJoinRewrite

/** The optimizer rule must turn the naive BETWEEN theta join into a
  * bucketed equi-join WITHOUT changing results — checked by running the
  * identical query with the rule detached and attached.
  */
class RangeJoinRewriteSpec extends SparkSpec {

  private def withRule[T](f: => T): T = {
    val before = spark.experimental.extraOptimizations
    RangeJoinRewrite.install(spark)
    try f finally spark.experimental.extraOptimizations = before
  }

  private def thetaJoin: DataFrame = {
    val ev = Tables.events(spark, sfTiny)
      .select(unix_millis(col("ts")).as("ms"), col("value"))
    val iv = ev.select((col("ms") - pmod(col("ms"), lit(3600000L))).as("ws"))
      .filter((col("ws") / 3600000L).cast("long") % 4 === 0).distinct()
      .withColumn("we", col("ws") + lit(5400000L))
    ev.join(iv, col("ms") >= col("ws") && col("ms") < col("we"))
      .groupBy(col("ws")).agg(count(lit(1)).as("n"),
        round(sum(col("value")), 4).as("v"))
      .orderBy(col("ws"))
  }

  test("rewritten plan is an equi-join with a Generate, not a nested loop") {
    val plain = thetaJoin.queryExecution.executedPlan.toString
    assert(plain.contains("BroadcastNestedLoopJoin"),
      s"precondition: naive plan should nested-loop:\n$plain")
    withRule {
      val plan = thetaJoin.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"rule did not fire:\n$plan")
      assert(plan.contains("Generate explode"), s"no interval explode:\n$plan")
      assert(plan.contains("__graft_bucket"), s"no bucket key:\n$plan")
    }
  }

  test("rewrite preserves results exactly") {
    val expected = thetaJoin.collect().toSeq
    val got = withRule(thetaJoin.collect().toSeq)
    assert(got == expected, s"rewrite changed results: $got vs $expected")
  }

  test("empty and NULL-bound intervals are dropped, not crashed (inverted sequence)") {
    import spark.implicits._
    val points = Seq(1L, 5L, 10L).toDF("p")
    val iv = Seq((8L, 4L), (12L, 12L), (4L, 8L)).toDF("lo", "hi")
      .union(Seq((null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(9L)))
        .toDF("lo", "hi"))
    val joined = points.join(iv, col("p") >= col("lo") && col("p") < col("hi"))
    val expected = joined.collect().map(_.toSeq).toSet
    val got = withRule {
      spark.conf.set("graft.rangeJoin.bucketWidth", "4")
      try joined.collect().map(_.toSeq).toSet
      finally spark.conf.unset("graft.rangeJoin.bucketWidth")
    }
    assert(got == expected, s"$got vs $expected")
    assert(expected == Set(Seq(5L, 4L, 8L)), s"fixture sanity: $expected")
  }
}
