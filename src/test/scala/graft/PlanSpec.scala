package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

import graft.ops.{PipelineOps, RelationalOps}

/** Physical-plan shape assertions — the properties that make these
  * operators survive a 100× scale-up, pinned so a refactor can't
  * silently regress them: filter/projection pushdown into the parquet
  * scan, broadcast (not shuffled/nested-loop) joins for dimension-sized
  * sides, partial top-k before the shuffle, and the as-of join's
  * single-exchange window rewrite.
  */
class PlanSpec extends SparkSpec {

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  private def executed(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("parquet scan receives pushed filters and a pruned read schema") {
    val plan = formatted(RelationalOps.filterPred(spark, sfTiny))
    assert(plan.contains("PushedFilters: ["),  s"no pushdown section:\n$plan")
    assert("PushedFilters: \\[[^\\]]*IsNotNull".r.findFirstIn(plan).isDefined,
      s"expected at least one pushed filter:\n$plan")
    // the lineitem scan must not read all 16 columns
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(plan)
    assert(read.isDefined, s"no ReadSchema in:\n$plan")
    val nCols = read.get.group(1).split(",").length
    assert(nCols <= 6, s"scan reads $nCols columns — pruning failed:\n$plan")
  }

  test("as-of join plans as ONE data exchange (window rewrite, no join node)") {
    val plan = executed(PipelineOps.asofJoin(spark, sfTiny))
    assert(!plan.contains("Join"), s"asof rewrite must not plan a join:\n$plan")
    // one exchange for the user_id window; the final orderBy adds a
    // rangepartitioning exchange — nothing else may shuffle
    val exchanges = "Exchange (hashpartitioning|rangepartitioning|SinglePartition)".r
      .findAllIn(plan).toSeq
    assert(exchanges.count(_.contains("hashpartitioning")) == 1,
      s"expected exactly one hash exchange, got $exchanges:\n$plan")
  }

  test("range join plans as a broadcast equi-join, not a nested-loop theta join") {
    val plan = executed(PipelineOps.rangeJoin(spark, sfTiny))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join fell back to a nested-loop plan:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("SortMergeJoin"), s"no equi-join in range join plan:\n$plan")
  }

  test("decontamination joins the eval n-gram set via broadcast") {
    val plan = executed(PipelineOps.decontaminate(spark, sfTiny))
    assert(plan.contains("BroadcastHashJoin"),
      s"eval-gram semi join must broadcast:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"unexpected nested-loop join:\n$plan")
  }

  test("salted skew join plans a shuffled hash join on (key, salt)") {
    val plan = executed(PipelineOps.skewJoin(spark, sfTiny))
    assert(plan.contains("ShuffledHashJoin"),
      s"salting demo must not broadcast:\n$plan")
    assert(plan.contains("salt"), s"salt column missing from join key:\n$plan")
  }

  test("per-group top-k runs a partial WindowGroupLimit before the shuffle") {
    val plan = executed(PipelineOps.topkPerGroup(spark, sfTiny))
    val limitIdx = plan.indexOf("WindowGroupLimit")
    assert(limitIdx >= 0, s"no WindowGroupLimit in plan:\n$plan")
    // Partial mode appears below (after) the exchange in the plan tree
    assert(plan.substring(limitIdx).contains("Partial"),
      s"expected a Partial WindowGroupLimit (map-side top-k):\n$plan")
  }
}
