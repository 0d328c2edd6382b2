package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {

  test("bucketed point-in-interval equals the naive BETWEEN join") {
    import spark.implicits._
    val points = Seq((1L, 5L, 100L), (1L, 25L, 101L), (2L, 50L, 102L),
      (1L, 99L, 103L)).toDF("k", "ts", "pid")
    val intervals = Seq((1L, 0L, 30L, "a"), (1L, 20L, 90L, "b"),
      (2L, 40L, 60L, "c")).toDF("k", "lo", "hi", "iid")
    val bucketed = RangeJoin.pointInInterval(points, intervals,
      "k", "ts", "lo", "hi", bucketWidth = 7L)
      .select("pid", "iid")
    val naive = points.join(intervals, Seq("k"))
      .filter(col("ts") >= col("lo") && col("ts") <= col("hi"))
      .select("pid", "iid")
    assert(bucketed.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(bucketed).count() == 0)
    // overlapping intervals both match point ts=25
    assert(bucketed.filter(col("pid") === 101L).count() == 2)
    // ts=99 is outside every interval
    assert(bucketed.filter(col("pid") === 103L).count() == 0)
  }

  test("interval overlap equals the naive overlap join, each pair once") {
    import spark.implicits._
    val left = Seq((1L, 0L, 30L, "a"), (1L, 20L, 90L, "b"),
      (2L, 40L, 60L, "c"), (1L, 95L, 95L, "d")).toDF("k", "llo", "lhi", "lid")
    val right = Seq((1L, 10L, 50L, "x"), (1L, 85L, 120L, "y"),
      (2L, 0L, 39L, "z"), (2L, 55L, 58L, "w")).toDF("k", "rlo", "rhi", "rid")
    // bucketWidth 3 makes every overlap span MANY buckets — the
    // overlap-start-bucket guard must still emit each pair exactly once
    val bucketed = RangeJoin.intervalOverlap(left, right, "k",
      "llo", "lhi", "rlo", "rhi", bucketWidth = 3L).select("lid", "rid")
    val naive = left.join(right, Seq("k"))
      .filter(col("llo") <= col("rhi") && col("rlo") <= col("lhi"))
      .select("lid", "rid")
    assert(bucketed.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(bucketed).count() == 0)
    assert(bucketed.count() == bucketed.distinct().count())
    // point-interval (d: 95..95) overlaps y but nothing else
    assert(bucketed.filter(col("lid") === "d").collect()
      .map(_.getString(1)).toSeq == Seq("y"))
    // disjoint same-key intervals don't pair (c vs z: 40>39)
    assert(bucketed.filter(col("lid") === "c" && col("rid") === "z")
      .count() == 0)
  }

  test("events-in-session counts cover every event exactly once") {
    val ev = tables.events
    val sessions = graft.streaming.Streams.sessionizeBatch(ev, 1800000000L)
    val joined = RangeJoin.pointInInterval(
      ev.select(col("user_id"), col("ts"), col("event_id")), sessions,
      "user_id", "ts", "session_start", "session_end", 1800000000L)
    // sessions partition the per-user timeline: every event falls in
    // exactly one of its user's sessions
    assert(joined.count() == ev.count())
    assert(joined.groupBy("event_id").count()
      .filter(col("count") > 1).count() == 0)
  }
}
