package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TransitionsSpec extends SparkSpec {

  test("topPaths: hand-computed windows, tie order, share ppm") {
    import spark.implicits._
    // user 1: A B A B  → paths A>B>A, B>A>B
    // user 2: A B A    → A>B>A
    // user 3: C C C C  → C>C>C ×2
    val ev = Seq(
      (1L, 10L, 1L, "A"), (2L, 20L, 1L, "B"),
      (3L, 30L, 1L, "A"), (4L, 40L, 1L, "B"),
      (5L, 10L, 2L, "A"), (6L, 20L, 2L, "B"), (7L, 30L, 2L, "A"),
      (8L, 10L, 3L, "C"), (9L, 20L, 3L, "C"),
      (10L, 30L, 3L, "C"), (11L, 40L, 3L, "C"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = Transitions.topPaths(ev, len = 3, topN = 20).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.keySet == Set("A>B>A", "B>A>B", "C>C>C"))
    assert(out("A>B>A")._1 == 2L && out("C>C>C")._1 == 2L &&
      out("B>A>B")._1 == 1L)
    // 5 paths total: 2/5 = 400000 ppm, 1/5 = 200000 ppm
    assert(out("A>B>A")._2 == 400000L && out("B>A>B")._2 == 200000L)
    // rank: count desc, then path asc — A>B>A before C>C>C
    assert(out("A>B>A")._3 == 1L && out("C>C>C")._3 == 2L &&
      out("B>A>B")._3 == 3L)
  }

  test("topPaths: windows never cross users; ts,event_id order breaks ties") {
    import spark.implicits._
    // same ts → event_id orders; users are independent streams
    val ev = Seq(
      (1L, 10L, 1L, "X"), (2L, 10L, 1L, "Y"), (3L, 10L, 1L, "Z"),
      (4L, 10L, 2L, "Z"), (5L, 10L, 2L, "Y"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = Transitions.topPaths(ev, len = 3, topN = 20).collect()
    assert(out.map(_.getString(0)).toSet == Set("X>Y>Z"))
  }
}
