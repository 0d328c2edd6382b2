package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite EXACT `count(DISTINCT x)` aggregates into
  * HyperLogLog++ sketches AUTOMATICALLY when the session opts in —
  * the dashboard-refresh switch. An exact distinct count plans as an
  * Expand (one extra row per aggregate per input row) plus a second
  * shuffle keyed on (group, x); at 100 TB over high-cardinality x
  * that second shuffle dominates the query. The sketch replaces it
  * with a fixed few-KB state per group, mergeable in one pass — the
  * standard trade every interactive analytics layer offers
  * ("approximate distinct" toggles in BI tools), here surfaced as a
  * plan rewrite so EXISTING queries get it without edits.
  *
  * OPT-IN by conf, default off (correctness gates must never see it):
  * {{{
  *   spark.conf.set("spark.graft.approxDistinct.rsd", "0.05")
  * }}}
  * Unset/≤0 disables. Guards: batch plans only; only rewrites
  * `Count(distinct)` whose children are deterministic; leaves
  * non-distinct counts, count(1), and multi-arg distinct counts (a
  * multi-column HLL key would change NULL semantics: count distinct
  * drops rows where ANY child is NULL, an HLL over a struct would
  * not) untouched unless single-child. Result type (long) and NULL
  * behavior match the exact operator — HLL++ also ignores NULL
  * inputs.
  */
object ApproxDistinctRewrite extends Rule[LogicalPlan] {

  val RsdConf = "spark.graft.approxDistinct.rsd"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val rsd = conf.getConfString(RsdConf, "0").toDouble
    if (rsd <= 0) plan
    else plan.transformUp {
      case agg: Aggregate if !agg.isStreaming =>
        agg.transformExpressions {
          case ae @ AggregateExpression(
              Count(children), mode, true, filter, resultId)
              if children.size == 1 && children.head.deterministic =>
            AggregateExpression(
              HyperLogLogPlusPlus(children.head, rsd),
              mode, isDistinct = false, filter, resultId)
        }
    }
  }
}
