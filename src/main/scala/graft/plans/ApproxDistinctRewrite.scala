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

  /** HLL++ needs precision p ≥ 4, i.e. rsd < 1.106/2^1.5 ≈ 0.391 —
    * validated HERE with a message naming the conf, not later as a
    * bare require inside the aggregate's constructor mid-query. */
  private val MaxRsd = 0.39

  /** Parse-once cache: the rule runs on every plan in the session,
    * so a malformed value must not throw a bare
    * NumberFormatException per query (and a well-formed one should
    * not re-parse per query). Malformed → warn once, treat as
    * disabled; out-of-range → fail fast with the conf name. */
  @volatile private var lastParsed: (String, Double) = ("0", 0.0)

  private def rsdFor(raw: String): Double = {
    val cached = lastParsed
    if (cached._1 == raw) cached._2
    else {
      val v = try raw.trim.toDouble catch {
        case _: NumberFormatException =>
          logWarning(s"ignoring malformed $RsdConf='$raw' (expected a " +
            "double in (0, 0.39)); approx-distinct rewrite disabled")
          0.0
      }
      if (v >= MaxRsd) throw new IllegalArgumentException(
        s"$RsdConf=$raw out of range: HyperLogLog++ supports a relative " +
          s"standard deviation below $MaxRsd (precision >= 4); unset or " +
          "lower the value")
      lastParsed = (raw, v)
      v
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val rsd = rsdFor(conf.getConfString(RsdConf, "0"))
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
