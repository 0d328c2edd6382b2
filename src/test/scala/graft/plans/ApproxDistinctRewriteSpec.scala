package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class ApproxDistinctRewriteSpec extends SparkSpec {

  private def withRule[T](rsd: Double)(body: => T): T = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ ApproxDistinctRewrite
    spark.conf.set(ApproxDistinctRewrite.RsdConf, rsd.toString)
    try body finally {
      spark.conf.unset(ApproxDistinctRewrite.RsdConf)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ == ApproxDistinctRewrite)
    }
  }

  private def q: DataFrame = tables.events
    .groupBy(col("event_type"))
    .agg(countDistinct(col("user_id")).as("users"),
      count(lit(1)).as("n"))

  test("opt-in rewrites count(DISTINCT) to HLL++; plain counts untouched") {
    val exact = q.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    withRule(0.05) {
      val df = q
      val opt = df.queryExecution.optimizedPlan.toString
      assert(opt.contains("hyperloglogplusplus") ||
        opt.contains("approx_count_distinct"),
        s"rewrite did not fire:\n$opt")
      // no Expand in the physical plan: the double-shuffle is gone
      val phys = df.queryExecution.executedPlan.toString
      assert(!phys.contains("Expand"), s"Expand survived:\n$phys")
      val approx = df.collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      exact.foreach { case (k, (users, n)) =>
        val (au, an) = approx(k)
        assert(an == n, "plain count must stay exact")
        assert(math.abs(au - users).toDouble / users <= 0.15,
          s"$k: approx $au vs exact $users")
      }
    }
  }

  test("rule is inert when the conf is unset and for streaming-safe NULLs") {
    // conf unset → plan unchanged, result exact
    val exact = q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val opt = q.queryExecution.optimizedPlan.toString
    assert(!opt.contains("hyperloglogplusplus"))
    // NULL semantics under the rule: count distinct ignores NULLs,
    // HLL++ does too — a column with nulls agrees on small exact data
    import spark.implicits._
    val d = Seq(("a", Some(1L)), ("a", None), ("a", Some(1L)),
      ("b", None)).toDF("k", "v")
    withRule(0.01) {
      val r = d.groupBy("k").agg(countDistinct(col("v")).as("nv"))
        .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
      assert(r("a") == 1L && r("b") == 0L)
    }
    assert(exact.nonEmpty)
  }
}
