package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Catalyst optimizer rule: rewrite interval-containment theta joins
  * into bucketed equi-joins.
  *
  * An inner join whose only cross-side predicate is
  * `point >= lo AND point < hi` (all BIGINT — ms-epoch convention) has
  * no equi key, so Spark plans BroadcastNestedLoopJoin — O(|L|·|R|)
  * comparisons, the classic range-join scale cliff. This rule applies
  * the standard bucketing rewrite mechanically, the same shape
  * [[graft.ops.PipelineOps.rangeJoin]] writes by hand:
  *
  *  - point side gains `bucket = point div W`,
  *  - interval side EXPLODES to the buckets it covers
  *    (`sequence(lo div W, (hi-1) div W)` — `ceil(span/W)+1` rows, 2 for
  *    the repo's 90-min windows at the default hour bucket),
  *  - the join becomes `EqualTo(bucket_p, bucket_i) AND <original>`, so
  *    ExtractEquiJoinKeys plans a hash join; the original predicate
  *    survives as the residual containment filter,
  *  - a Project restores the original output (buckets never escape).
  *
  * Interval rows with `lo >= hi` (empty — nothing can satisfy the
  * containment) or a NULL bound are pre-filtered: they can produce no
  * join matches in the original plan, and `sequence()` would throw on
  * inverted bounds.
  *
  * The rule never re-fires on its own output (the rewritten join has an
  * equi conjunct, which the guard excludes). Registered via
  * `SparkSessionExtensions.injectOptimizerRule` (GraftExtensions) or
  * `spark.experimental.extraOptimizations` on a live session.
  */
case class RangeJoinRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  /** Bucket width in point units; hour-of-ms to match the repo's
    * ms-epoch convention. Overridable per session. */
  private def bucketWidth: Long =
    spark.conf.getOption("graft.rangeJoin.bucketWidth")
      // an optimizer rule must never throw on user conf: a malformed or
      // non-positive width (zero ⇒ IntegralDivide null keys) would fail
      // EVERY query planned in the session — fall back to the default
      .flatMap(_.toLongOption).filter(_ > 0L)
      .getOrElse(3600000L)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = {
        def split(e: Expression): Seq[Expression] = e match {
          case And(a, b) => split(a) ++ split(b)
          case other => Seq(other)
        }
        split(cond)
      }
      val crossSide = conjuncts.filter(c =>
        c.references.intersect(left.outputSet).nonEmpty &&
          c.references.intersect(right.outputSet).nonEmpty)
      // only fire when the join has NO equi conjunct (else Spark already
      // has a hash key) and the cross-side predicates are exactly one
      // >= / < pair over the same point expression
      val hasEqui = crossSide.exists {
        case EqualTo(a, b) => true
        case EqualNullSafe(a, b) => true
        case _ => false
      }
      extractRange(crossSide, left, right) match {
        case Some((point, lo, hi, pointOnLeft)) if !hasEqui &&
            crossSide.length == 2 =>
          val w = Literal(bucketWidth, LongType)
          val (pointSide, intervalSide) =
            if (pointOnLeft) (left, right) else (right, left)
          // point side: bucket projection
          val bucketP = Alias(IntegralDivide(point, w), "__graft_bucket_p")()
          val newPoint = Project(pointSide.output :+ bucketP, pointSide)
          // interval side: drop empty/NULL-bound intervals (no possible
          // match; sequence() would throw on inverted bounds), then
          // explode covered buckets
          val guarded = Filter(LessThan(lo, hi), intervalSide)
          val seq = new Sequence(
            IntegralDivide(lo, w),
            IntegralDivide(Subtract(hi, Literal(1L, LongType)), w),
            Literal(1L, LongType))
            .withTimeZone(conf.sessionLocalTimeZone)
          val bucketI =
            AttributeReference("__graft_bucket_i", LongType, nullable = true)()
          val newInterval = Generate(Explode(seq), unrequiredChildIndex = Nil,
            outer = false, qualifier = None,
            generatorOutput = Seq(bucketI), child = guarded)
          val equi = EqualTo(bucketP.toAttribute, bucketI)
          val (newLeft, newRight) =
            if (pointOnLeft) (newPoint, newInterval) else (newInterval, newPoint)
          Project(j.output,
            Join(newLeft, newRight, Inner, Some(And(equi, cond)), hint))
        case _ => j
      }
  }

  /** Find `point >= lo AND point < hi` with point bound to one side and
    * both bounds to the other, all LongType. Returns
    * (point, lo, hi, pointOnLeft). */
  private def extractRange(
      crossSide: Seq[Expression],
      left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Expression, Boolean)] = {
    def sideOf(e: Expression): Option[Boolean] =
      if (e.references.subsetOf(left.outputSet)) Some(true)
      else if (e.references.subsetOf(right.outputSet)) Some(false)
      else None
    val lowers = crossSide.collect {
      case GreaterThanOrEqual(p, lo) => (p, lo)
      case LessThanOrEqual(lo, p) => (p, lo)
    }
    val uppers = crossSide.collect {
      case LessThan(p, hi) => (p, hi)
      case GreaterThan(hi, p) => (p, hi)
    }
    (for {
      (p1, lo) <- lowers
      (p2, hi) <- uppers
      if p1.semanticEquals(p2)
      if p1.dataType == LongType && lo.dataType == LongType && hi.dataType == LongType
      if p1.deterministic && lo.deterministic && hi.deterministic
      pSide <- sideOf(p1)
      loSide <- sideOf(lo)
      hiSide <- sideOf(hi)
      if loSide == hiSide && loSide != pSide
    } yield (p1, lo, hi, pSide)).headOption
  }
}

object RangeJoinRewrite {
  /** Attach the rule to a live session (idempotent). */
  def install(spark: SparkSession): SparkSession = {
    val existing = spark.experimental.extraOptimizations
    if (!existing.exists(_.isInstanceOf[RangeJoinRewrite]))
      spark.experimental.extraOptimizations = existing :+ RangeJoinRewrite(spark)
    spark
  }
}
