package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class RangeJoinRewriteSpec extends SparkSpec {

  private def withRule[T](width: Long)(body: => T): T = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RangeJoinRewrite
    spark.conf.set(RangeJoinRewrite.WidthConf, width.toString)
    try body finally {
      spark.conf.unset(RangeJoinRewrite.WidthConf)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == RangeJoinRewrite)
    }
  }

  // points: (user_id, ts, event_id); intervals: ±5 s (µs units) around
  // a 1-in-50 sample of events
  private lazy val points: DataFrame =
    tables.events.select("user_id", "ts", "event_id")
  private lazy val intervals: DataFrame =
    tables.events.filter(col("event_id") % 50 === 0)
      .select(col("user_id"), (col("ts") - 5000000L).as("lo"),
        (col("ts") + 5000000L).as("hi"), col("event_id").as("iv_id"))

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select("event_id", "iv_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("equi+interval join is rewritten to a binned equi-join, same rows") {
    val cond = points("user_id") === intervals("user_id") &&
      points("ts") >= intervals("lo") && points("ts") <= intervals("hi")
    val naive = pairs(points.join(intervals, cond))
    withRule(10000000L) {
      val df = points.join(intervals, cond)
      val opt = df.queryExecution.optimizedPlan.toString
      assert(opt.contains("__graft_bucket"), s"rewrite did not fire:\n$opt")
      assert(pairs(df) == naive)
    }
  }

  test("pure interval join (no equi key) loses the nested loop") {
    val p = points.filter(col("event_id") < 500)
    val iv = intervals.limit(10)
    val cond = p("ts") >= iv("lo") && p("ts") <= iv("hi")
    // without the rule: nested-loop (the quadratic shape)
    val before = p.join(iv, cond).queryExecution.executedPlan.toString
    assert(before.contains("BroadcastNestedLoopJoin") ||
      before.contains("CartesianProduct"), s"expected NLJ baseline:\n$before")
    val naive = pairs(p.join(iv, cond))
    withRule(10000000L) {
      val df = p.join(iv, cond)
      val exec = df.queryExecution.executedPlan.toString
      assert(!exec.contains("BroadcastNestedLoopJoin") &&
        !exec.contains("CartesianProduct"),
        s"nested loop survived the rewrite:\n$exec")
      assert(pairs(df) == naive)
    }
  }

  test("SQL BETWEEN gets the rewrite too") {
    points.createOrReplaceTempView("rj_points")
    intervals.createOrReplaceTempView("rj_intervals")
    val sql = """SELECT p.event_id, i.iv_id FROM rj_points p
                 JOIN rj_intervals i ON p.user_id = i.user_id
                  AND p.ts BETWEEN i.lo AND i.hi"""
    val naive = spark.sql(sql).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    withRule(10000000L) {
      val df = spark.sql(sql)
      assert(df.queryExecution.optimizedPlan.toString.contains("__graft_bucket"))
      assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        == naive)
    }
  }

  test("TIMESTAMP_NTZ points are left alone (no numeric cast exists) and still answer") {
    // NTZ has no Cast to DOUBLE — the rule must skip, not build an
    // unresolvable expression mid-optimizer
    val p = points.limit(200)
      .select(col("event_id"), col("user_id"),
        timestamp_micros(col("ts")).cast("timestamp_ntz").as("ts"))
    val iv = intervals.limit(5)
      .select(col("iv_id"), col("user_id"),
        timestamp_micros(col("lo")).cast("timestamp_ntz").as("lo"),
        timestamp_micros(col("hi")).cast("timestamp_ntz").as("hi"))
    val cond = p("user_id") === iv("user_id") &&
      p("ts") >= iv("lo") && p("ts") <= iv("hi")
    val naive = pairs(p.join(iv, cond))
    withRule(10000000L) {
      val df = p.join(iv, cond)
      assert(!df.queryExecution.optimizedPlan.toString.contains("__graft_bucket"),
        "rule must not fire on an NTZ point column")
      assert(pairs(df) == naive)
    }
  }

  test("rule is inert when the width conf is unset") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RangeJoinRewrite
    try {
      val cond = points("user_id") === intervals("user_id") &&
        points("ts") >= intervals("lo") && points("ts") <= intervals("hi")
      val opt = points.join(intervals, cond)
        .queryExecution.optimizedPlan.toString
      assert(!opt.contains("__graft_bucket"))
    } finally
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == RangeJoinRewrite)
  }
}
