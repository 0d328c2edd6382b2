package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite point-in-interval joins into the binned
  * equi-join of [[graft.operators.RangeJoin]] AUTOMATICALLY, so SQL
  * `ON p.ts BETWEEN i.lo AND i.hi` gets the scale-safe plan without
  * the caller knowing the trick.
  *
  * Spark plans a pure interval join as BroadcastNestedLoopJoin /
  * CartesianProduct (quadratic), and an equi+interval join as a
  * sort-merge whose per-key range scan is quadratic in the hot key.
  * The rewrite quantizes the point into `width`-sized buckets,
  * explodes each interval into the buckets it covers, and joins on
  * the bucket (plus any existing equi keys); the original interval
  * conjuncts stay in the join condition as exact post-filters.
  *
  * OPT-IN by conf — bucket width is workload knowledge the optimizer
  * does not have (pick it near the median interval length, in the
  * point column's numeric unit — seconds for timestamps):
  * {{{ spark.conf.set("spark.graft.rangeJoin.bucketWidth", "3600") }}}
  * Unset or ≤ 0 disables the rule. Guards: inner joins only, batch
  * only (streaming interval joins carry watermark state semantics),
  * numeric/timestamp points, and a marker-attribute check for
  * idempotence inside the fixed-point optimizer batch.
  *
  * Null semantics are preserved: a NULL point/lo/hi bucket makes
  * `sequence` NULL (explode emits nothing) or the bucket equality
  * NULL — the row is dropped exactly as the original predicate
  * dropped it. An inverted interval (lo > hi) matched no rows before
  * and matches none now (the exact post-filter rejects whatever the
  * descending-sequence buckets admit).
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val WidthConf = "spark.graft.rangeJoin.bucketWidth"
  private val BucketPrefix = "__graft_bucket"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = conf.getConfString(WidthConf, "0").toDouble
    if (width <= 0) plan
    else plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), _)
          if !left.isStreaming && !right.isStreaming &&
            !cond.references.exists(_.name.startsWith(BucketPrefix)) =>
        rewrite(j, cond, width).getOrElse(j)
    }
  }

  /** trunc-division bucket id as a resolved long expression (explicit
    * timezone: timezone-aware Casts are unresolved without one inside
    * the optimizer). */
  private def bucketOf(point: Expression, width: Double): Expression = {
    val tz = Some(conf.sessionLocalTimeZone)
    Cast(Divide(Cast(point, DoubleType, tz), Literal(width, DoubleType)),
      LongType, tz)
  }

  private def bucketable(dt: DataType): Boolean = dt match {
    // NOT TimestampNTZType: Spark defines numeric Casts for
    // TimestampType only, so a bucketOf() over an NTZ column would be
    // an unresolvable Cast mid-optimizer — the rule must leave such
    // joins alone rather than fail them
    case _: NumericType | TimestampType => true
    case _ => false
  }

  private def rewrite(j: Join, cond: Expression,
                      width: Double): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    // normalize to (point, bound, pointIsLower): point ≥ lo / point ≤ hi
    val lowers = conjuncts.collect {
      case GreaterThanOrEqual(p, b) => (p, b)
      case GreaterThan(p, b) => (p, b)
      case LessThanOrEqual(b, p) => (p, b)
      case LessThan(b, p) => (p, b)
    }
    val uppers = conjuncts.collect {
      case LessThanOrEqual(p, b) => (p, b)
      case LessThan(p, b) => (p, b)
      case GreaterThanOrEqual(b, p) => (p, b)
      case GreaterThan(b, p) => (p, b)
    }
    def sideOf(e: Expression): Option[Boolean] = {
      // Some(true) = left-only, Some(false) = right-only
      val refs = e.references
      if (refs.isEmpty) None
      else if (refs.subsetOf(j.left.outputSet)) Some(true)
      else if (refs.subsetOf(j.right.outputSet)) Some(false)
      else None
    }
    // find a lower and an upper bound on the SAME point expression,
    // with the point on one side and both bounds on the other
    val pattern = (for {
      (p, lo) <- lowers.iterator
      (p2, hi) <- uppers.iterator
      if p.semanticEquals(p2) && bucketable(p.dataType)
      pSide <- sideOf(p)
      loSide <- sideOf(lo)
      hiSide <- sideOf(hi)
      if loSide == hiSide && loSide != pSide
    } yield (p, lo, hi, pSide)).nextOption()

    pattern.map { case (point, lo, hi, pointOnLeft) =>
      val (pointPlan, ivPlan) =
        if (pointOnLeft) (j.left, j.right) else (j.right, j.left)
      // point side: project the point's bucket
      val pBucket = Alias(bucketOf(point, width), s"${BucketPrefix}_p")()
      val pProj = Project(pointPlan.output :+ pBucket, pointPlan)
      // interval side: explode the covered bucket range
      val seq = Sequence(bucketOf(lo, width), bucketOf(hi, width), None,
        Some(conf.sessionLocalTimeZone))
      val ivAttr = AttributeReference(s"${BucketPrefix}_iv", LongType,
        nullable = false)()
      val ivGen = Generate(Explode(seq), unrequiredChildIndex = Nil,
        outer = false, qualifier = None, generatorOutput = Seq(ivAttr),
        child = ivPlan)
      val newCond = (conjuncts :+
        EqualTo(pBucket.toAttribute, ivAttr)).reduce(And)
      val (newLeft, newRight) =
        if (pointOnLeft) (pProj, ivGen) else (ivGen, pProj)
      Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), j.hint))
    }
      // belt-and-braces: if any constructed expression failed to
      // resolve (e.g. an unexpected unsupported cast), fall back to
      // the original join instead of surfacing an optimizer error
      .filter(_.resolved)
  }
}
