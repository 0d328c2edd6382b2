package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkSpec {

  test("asofJoin picks the latest right row at or before each left ts") {
    import spark.implicits._
    val left = Seq((1L, 10L, 100L), (2L, 10L, 250L), (3L, 20L, 100L))
      .toDF("id", "k", "ts")
    val right = Seq((10L, 100L, "a"), (10L, 200L, "b"), (20L, 150L, "c"))
      .toDF("k", "ts", "tag")
    val out = AsOf.asofJoin(left, right, "k", "ts", Seq("tag"))
      .orderBy("id").collect()
    // id=1: right at exactly ts=100 matches (>= semantics)
    assert(out(0).getAs[String]("matched_tag") == "a")
    // id=2: latest of {100, 200} <= 250 → "b"
    assert(out(1).getAs[String]("matched_tag") == "b")
    // id=3: right ts=150 > 100 → no match (left outer → null)
    assert(out(2).isNullAt(out(2).fieldIndex("matched_tag")))
    assert(out.length == 3)
  }

  test("asofJoin on events matches a window-free reference computation") {
    val ev = tables.events
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts", "value")
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("event_id"), max(col("value")).as("value"))
    val out = AsOf.asofJoin(clicks, purchases, "user_id", "ts",
      Seq("event_id", "value"))
    assert(out.count() == clicks.count())
    // every matched purchase precedes (or equals) its click
    val bad = out.filter(col("matched_event_id").isNotNull)
      .join(purchases.select(col("event_id").as("matched_event_id"),
        col("ts").as("p_ts")), "matched_event_id")
      .filter(col("p_ts") > col("ts"))
    assert(bad.count() == 0)
  }

  test("asofJoinNative: the custom exec plans in and matches the " +
    "composed operator row for row") {
    val ev = tables.events
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts", "value")
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("event_id"),
        max(col("value")).as("value"))
    val native = AsOf.asofJoinNative(clicks, purchases, "user_id", "ts",
      Seq("event_id", "value"))
    // the physical operator actually planned — not a silent fallback
    assert(native.queryExecution.executedPlan.toString
      .contains("AsofJoin"), "AsofJoinExec missing from the plan")
    val composed = AsOf.asofJoin(clicks, purchases, "user_id", "ts",
      Seq("event_id", "value"))
    assert(native.columns.toSeq === composed.columns.toSeq)
    val canon = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().map(_.mkString("|")).sorted.toSeq
    assert(canon(native) === canon(composed))
  }

  test("asofJoinNative: ties, misses, and null keys behave like the " +
    "composed operator") {
    import spark.implicits._
    val left = Seq((1L, 10L, 100L), (2L, 10L, 250L), (3L, 20L, 100L),
      (4L, 99L, 500L)).toDF("id", "k", "ts")
    val right = Seq((10L, 100L, "a"), (10L, 200L, "b"), (20L, 150L, "c"))
      .toDF("k", "ts", "tag")
    val out = AsOf.asofJoinNative(left, right, "k", "ts", Seq("tag"))
      .orderBy("id").collect()
    assert(out.length == 4)
    assert(out(0).getAs[String]("matched_tag") == "a") // exact-ts tie
    assert(out(1).getAs[String]("matched_tag") == "b") // latest of two
    assert(out(2).isNullAt(out(2).fieldIndex("matched_tag"))) // future-only
    assert(out(3).isNullAt(out(3).fieldIndex("matched_tag"))) // absent key
    // null keys never match, rows survive
    val ln = Seq((Some(1L), Option.empty[Long], Some(100L)),
      (Some(2L), Some(10L), Some(100L)))
      .toDF("id", "k", "ts")
    val outN = AsOf.asofJoinNative(ln, right, "k", "ts", Seq("tag"))
      .orderBy("id").collect()
    assert(outN.length == 2)
    assert(outN(0).isNullAt(outN(0).fieldIndex("matched_tag")))
    assert(outN(1).getAs[String]("matched_tag") == "a")
  }

  test("asofJoinNativeForward: time reversal matches the composed " +
    "forward operator row for row") {
    val ev = tables.events
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts", "value")
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("event_id"),
        max(col("value")).as("value"))
    val native = AsOf.asofJoinNativeForward(clicks, purchases,
      "user_id", "ts", Seq("event_id", "value"))
    val composed = AsOf.asofJoinForward(clicks, purchases, "user_id",
      "ts", Seq("event_id", "value"))
    assert(native.columns.toSeq === composed.columns.toSeq)
    val canon = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().map(_.mkString("|")).sorted.toSeq
    assert(canon(native) === canon(composed))
  }

  test("asofJoinNativeForward accepts TIMESTAMP ts columns (reversal " +
    "maps to epoch micros before negating) and matches the composed path") {
    import spark.implicits._
    val left = Seq((1L, 10L, "2024-01-01 00:01:00"),
      (2L, 10L, "2024-01-01 00:05:00"), (3L, 20L, "2024-01-01 00:02:00"))
      .toDF("id", "k", "s").withColumn("ts", col("s").cast("timestamp"))
      .drop("s")
    val right = Seq((10L, "2024-01-01 00:01:00", "a"),
      (10L, "2024-01-01 00:03:00", "b"), (20L, "2024-01-01 00:01:30", "c"))
      .toDF("k", "s", "tag").withColumn("ts", col("s").cast("timestamp"))
      .drop("s")
    val native = AsOf.asofJoinNativeForward(left, right, "k", "ts",
      Seq("tag")).orderBy("id").collect()
    // id=1: exact-ts right visible; id=2: nothing after; id=3: none fwd
    assert(native(0).getAs[String]("matched_tag") == "a")
    assert(native(1).isNullAt(native(1).fieldIndex("matched_tag")))
    assert(native(2).isNullAt(native(2).fieldIndex("matched_tag")))
    val composed = AsOf.asofJoinForward(left, right, "k", "ts", Seq("tag"))
      .orderBy("id").collect()
    assert(native.map(_.mkString("|")).toSeq ===
      composed.map(_.mkString("|")).toSeq)
  }

  test("tolerance nulls matches older than the max gap, keeps rows") {
    import spark.implicits._
    val lefts = Seq((1L, 10L, 1000L), (1L, 20L, 2000L), (2L, 30L, 500L))
      .toDF("user_id", "event_id", "ts")
    val rights = Seq((1L, 900L, 77L), (2L, 100L, 88L))
      .toDF("user_id", "ts", "event_id")
    val out = AsOf.asofJoin(lefts, rights, "user_id", "ts",
        Seq("event_id"), toleranceUs = Some(200L))
      .orderBy("event_id").collect()
    assert(out.length == 3)
    // left ts 1000 matches right ts 900 (gap 100 ≤ 200)
    assert(out(0).getAs[Long]("matched_event_id") == 77L)
    // left ts 2000: the same right row is now 1100 stale → nulled
    assert(out(1).isNullAt(out(1).fieldIndex("matched_event_id")))
    // user 2: gap 400 > 200 → nulled, row kept
    assert(out(2).isNullAt(out(2).fieldIndex("matched_event_id")))
    // no tolerance: both stale matches come back
    val full = AsOf.asofJoin(lefts, rights, "user_id", "ts",
      Seq("event_id")).collect()
    assert(full.count(!_.isNullAt(full.head.fieldIndex("matched_event_id"))) == 3)
  }

  test("asofJoinForward picks the earliest right row at or after each left ts") {
    import spark.implicits._
    val left = Seq((1L, 10L, 100L), (2L, 10L, 250L), (3L, 20L, 200L))
      .toDF("id", "k", "ts")
    val right = Seq((10L, 100L, "a"), (10L, 200L, "b"), (20L, 150L, "c"))
      .toDF("k", "ts", "tag")
    val out = AsOf.asofJoinForward(left, right, "k", "ts", Seq("tag"))
      .orderBy("id").collect()
    // id=1: right at exactly ts=100 matches (<= semantics)
    assert(out(0).getAs[String]("matched_tag") == "a")
    // id=2: nothing at or after 250 → null, row kept
    assert(out(1).isNullAt(out(1).fieldIndex("matched_tag")))
    // id=3: right ts=150 < 200 → no match forward
    assert(out(2).isNullAt(out(2).fieldIndex("matched_tag")))
  }

  test("forward join is the exact mirror of backward on reversed time") {
    import spark.implicits._
    // negating ts turns "earliest at-or-after" into "latest at-or-
    // before": the two directions must agree through the reflection
    val left = Seq((1L, 5L, 100L), (2L, 5L, 150L), (3L, 5L, 320L),
      (4L, 7L, 90L)).toDF("id", "k", "ts")
    val right = Seq((5L, 110L, 1L), (5L, 300L, 2L), (7L, 80L, 3L))
      .toDF("k", "ts", "rid")
    val fwd = AsOf.asofJoinForward(left, right, "k", "ts", Seq("rid"))
      .select("id", "matched_rid").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val bwd = AsOf.asofJoin(
      left.withColumn("ts", -col("ts")),
      right.withColumn("ts", -col("ts")), "k", "ts", Seq("rid"))
      .select("id", "matched_rid").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(fwd == bwd)
    assert(fwd(1L) == Some(1L) && fwd(2L) == Some(2L) &&
      fwd(3L).isEmpty && fwd(4L).isEmpty)
  }

  test("forward tolerance bounds the look-ahead") {
    import spark.implicits._
    val lefts = Seq((1L, 10L, 1000L), (1L, 20L, 400L))
      .toDF("user_id", "event_id", "ts")
    val rights = Seq((1L, 1100L, 77L)).toDF("user_id", "ts", "event_id")
    val out = AsOf.asofJoinForward(lefts, rights, "user_id", "ts",
        Seq("event_id"), toleranceUs = Some(200L))
      .orderBy("event_id").collect()
    // gap 100 ≤ 200 matches; gap 700 > 200 nulls but keeps the row
    assert(out(0).getAs[Long]("matched_event_id") == 77L)
    assert(out(1).isNullAt(out(1).fieldIndex("matched_event_id")))
  }
}
