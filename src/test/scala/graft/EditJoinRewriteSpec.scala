package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.EditJoinRewrite

/** The edit-distance join rewrite: a `levenshtein(a, b) <= k` theta
  * join must (1) stop planning a full nested loop for the long-string
  * mass once the rule is installed, and (2) return exactly the rows
  * the naive plan returns — including short strings, whose vacuous
  * count bound routes them through the preserved nested-loop legs.
  */
class EditJoinRewriteSpec extends SparkSpec {

  private def leftDf: DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfTiny)
      .select(col("doc_id"), substring(col("text"), 1, 24).as("s"))
    // short strings below (k+1)·q = 15 chars exercise the union legs
    docs.unionByName(
      Seq((9001L, "abc"), (9002L, "short str"), (9003L, "tiny"))
        .toDF("doc_id", "s"))
  }

  private def rightDf: DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfTiny)
      .select(col("doc_id").as("rid"), substring(col("text"), 2, 24).as("t"))
    docs.unionByName(
      Seq((9101L, "abd"), (9102L, "short strX"), (9103L, "entirely other"))
        .toDF("rid", "t"))
  }

  private def thetaJoin: DataFrame =
    leftDf.join(rightDf, levenshtein(col("s"), col("t")) <= 2)
      .select(col("doc_id"), col("rid"))

  test("rewrite preserves results exactly, short strings included") {
    // naive result BEFORE the rule exists on the session
    assert(!spark.experimental.extraOptimizations
      .exists(_.isInstanceOf[EditJoinRewrite]),
      "rule must not be pre-installed for the naive baseline")
    val naive = thetaJoin.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.nonEmpty, "fixture must produce matches")
    assert(naive.contains((9001L, 9101L)), "short-string pair abc~abd")
    assert(naive.contains((9002L, 9102L)), "short-string pair short str~X")

    EditJoinRewrite.install(spark)
    try {
      val rewritten = thetaJoin.collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rewritten == naive,
        s"rewrite changed the result: missing=${(naive -- rewritten).take(3)} " +
          s"extra=${(rewritten -- naive).take(3)}")
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_.isInstanceOf[EditJoinRewrite])
    }
  }

  test("rewritten plan: q-gram generate + count filter + hash join on the long mass") {
    EditJoinRewrite.install(spark)
    try {
      val df = thetaJoin
      val opt = df.queryExecution.optimizedPlan.toString
      assert(opt.contains("Union"), s"expected the 3-leg union:\n$opt")
      assert(opt.contains("posexplode") || opt.contains("PosExplode"),
        s"expected the q-gram generate:\n$opt")
      val phys = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      // the candidate path must plan HASH joins (gram equi + the two
      // reassembly equi joins); nested loops survive ONLY for the
      // short-string legs
      assert(phys.contains("BroadcastHashJoin") ||
        phys.contains("ShuffledHashJoin") || phys.contains("SortMergeJoin"),
        s"no hash join in rewritten plan:\n$phys")
      // and the rule must actually have removed the long-mass nested
      // loop: every remaining BNLJ sits under a short-string filter
      val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(phys).size
      assert(bnlj <= 2, s"expected only the two short legs as BNLJ, got $bnlj:\n$phys")
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_.isInstanceOf[EditJoinRewrite])
    }
  }

  test("marker guard is subtree-scoped: a user __graft_ej* column elsewhere doesn't disable the rewrite") {
    EditJoinRewrite.install(spark)
    try {
      // a SEPARATE branch of the query carries a user column that
      // happens to collide with the rule's marker prefix — the old
      // whole-plan guard silently disabled the rewrite for the entire
      // query; the subtree-scoped guard must still fire on the join
      val decoy = leftDf.select(col("doc_id").as("__graft_ej_fake"))
        .groupBy().count().select(col("count").as("n_decoy"))
      val joined = thetaJoin.crossJoin(decoy)
      val opt = joined.queryExecution.optimizedPlan.toString
      assert(opt.contains("__graft_ej_s"),
        s"rewrite must fire despite the decoy column:\n$opt")
      assert(opt.contains("Union"), s"expected the 3-leg union:\n$opt")
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_.isInstanceOf[EditJoinRewrite])
    }
  }

  test("structural short-leg guard: the rule's own legs are not re-split without tags") {
    // Feed the rule the SHAPE of its own short-left leg (a fresh plan,
    // so no TreeNode tags exist — exactly the tag-loss scenario): the
    // structural guard must decline, and the long-mass-only pre-filter
    // variant must still rewrite (declining there costs correctness
    // nothing, only the optimization — but it must not loop either).
    EditJoinRewrite.install(spark)
    try {
      val minLen = 15 // (k+1)·q for k=2, q=5
      val shortLeft = leftDf.filter(length(col("s")) < minLen)
        .join(rightDf, levenshtein(col("s"), col("t")) <= 2)
      val optShort = shortLeft.queryExecution.optimizedPlan.toString
      assert(!optShort.contains("__graft_ej"),
        s"rule re-split its own short-left leg shape:\n$optShort")
      // and the result is still correct through the naive plan
      assert(shortLeft.count() ==
        leftDf.filter(length(col("s")) < minLen).collect().map(_.getString(1))
          .map(s => rightDf.collect().map(_.getString(1))
            .count(t => levDriver(s, t) <= 2)).sum,
        "short-leg naive result mismatch")
      // the long/short two-sided leg shape also declines
      val shortRight = leftDf.filter(length(col("s")) >= minLen)
        .join(rightDf.filter(length(col("t")) < minLen),
          levenshtein(col("s"), col("t")) <= 2)
      assert(!shortRight.queryExecution.optimizedPlan.toString
        .contains("__graft_ej"),
        "rule re-split its own short-right leg shape")
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_.isInstanceOf[EditJoinRewrite])
    }
  }

  private def levDriver(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("rule leaves equi joins and non-edit theta joins untouched") {
    EditJoinRewrite.install(spark)
    try {
      // equi join with a levenshtein residual: guard must not fire
      val equi = leftDf.join(rightDf,
        col("doc_id") === col("rid") && levenshtein(col("s"), col("t")) <= 2)
      assert(!equi.queryExecution.optimizedPlan.toString.contains("__graft_ej"),
        "rule fired on an equi join")
      // plain inequality theta join: no levenshtein, no rewrite
      val theta = leftDf.join(rightDf, length(col("s")) < length(col("t")))
      assert(!theta.queryExecution.optimizedPlan.toString.contains("__graft_ej"),
        "rule fired on a non-edit theta join")
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_.isInstanceOf[EditJoinRewrite])
    }
  }
}
