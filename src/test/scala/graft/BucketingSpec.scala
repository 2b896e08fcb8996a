package graft

import graft.etl.Bucketing

/** The point of bucketing is the ABSENCE of a shuffle: the join of the
  * two bucketed tables must contain no Exchange operator upstream of the
  * join (the only exchanges allowed are the post-join aggregation /
  * ordering ones).
  */
class BucketingSpec extends SparkSpec {

  test("bucketed orders-lineitem join plans without a join-side shuffle") {
    // disable auto-broadcast: at spec scale the tables are tiny enough to
    // broadcast, which would hide the bucket layout this test asserts
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try doTest() finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  private def doTest(): Unit = {
    val df = Bucketing.bucketedJoin(spark, sfTiny)
    val plan = df.queryExecution.executedPlan.toString
    val joinIdx = plan.indexOf("SortMergeJoin")
    assert(joinIdx >= 0, s"expected a sort-merge join over bucketed scans:\n$plan")
    // everything BELOW the join in the plan string (its inputs) must be
    // exchange-free: bucket layout replaces the shuffle
    val belowJoin = plan.substring(joinIdx)
    assert(!belowJoin.contains("Exchange"),
      s"join inputs must not shuffle — bucketing failed:\n$plan")
    // and the numbers still have to be right
    assert(df.count() == 5)
  }
  test("point lookup on the bucket column selects a strict subset of buckets") {
    val df = graft.etl.Bucketing.bucketPruning(spark, sfTiny)
    val plan = df.queryExecution.executedPlan.toString
    val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
    assert(m.isDefined, s"no bucket pruning in scan:\n$plan")
    assert(m.get.group(1).toInt < m.get.group(2).toInt,
      s"IN-list probe must prune buckets: ${m.get.matched}")
    assert(df.count() > 0)
  }

}
