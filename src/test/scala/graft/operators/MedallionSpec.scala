package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MedallionSpec extends SparkSpec {

  test("dedupLatest keeps exactly one latest row per key") {
    val out = Medallion.dedupLatest(tables.events, "user_id", "ts", "event_id")
    val users = tables.events.select("user_id").distinct().count()
    assert(out.count() == users)
    // the kept row carries the max ts of its group
    val maxTs = tables.events.groupBy("user_id").agg(max("ts").as("mx"))
    val joined = out.join(maxTs, "user_id").filter(col("ts") =!= col("mx"))
    assert(joined.count() == 0)
  }

  test("mergeUpsert: update rows win, unmatched base rows survive") {
    val ev = tables.events
    val base = Medallion.dedupLatest(ev.filter(col("event_id") % 2 === 0),
      "user_id", "ts", "event_id")
    val upd = Medallion.dedupLatest(ev.filter(col("event_id") % 2 === 1),
      "user_id", "ts", "event_id")
    val merged = Medallion.mergeUpsert(base, upd, Seq("user_id"))
    assert(merged.count() ==
      base.select("user_id").union(upd.select("user_id")).distinct().count())
    // every key present in updates maps to the update's row
    val check = merged.alias("m").join(upd.alias("u"), "user_id")
      .filter(col("m.event_id") =!= col("u.event_id"))
    assert(check.count() == 0)
  }

  test("explodeItems itemises tokens with 0-based position surrogate key") {
    val out = Medallion.explodeItems(tables.documents)
    val firstDoc = tables.documents.orderBy("doc_id").select("text").head.getString(0)
    val expected = firstDoc.split(" ").length
    assert(out.filter(col("doc_id") === 0).count() == expected)
    assert(out.filter(col("doc_id") === 0 && col("item_number") === 0)
      .head.getAs[String]("id") == "0-0")
  }

  test("withRowHash emits a 64-hex sha256 per row, stable across runs") {
    val cols = Seq("n_nationkey", "n_name", "n_regionkey")
    val h1 = Medallion.withRowHash(tables.nation, cols)
      .select("row_hash").collect().map(_.getString(0)).sorted
    assert(h1.forall(_.matches("[0-9a-f]{64}")))
    assert(h1.distinct.length == 25)
  }

  test("scd2History: exactly one current version per key, dense versions") {
    val out = Medallion.scd2History(tables.events, "user_id", "ts", "event_id")
    val users = tables.events.select("user_id").distinct().count()
    assert(out.filter(col("is_current")).count() == users)
    assert(out.filter(col("version") === 1).count() == users)
  }

  test("silverDimCustomer assigns a region_code to every customer") {
    val out = Medallion.silverDimCustomer(tables.customer, tables.nation,
      tables.region)
    assert(out.count() == tables.customer.count())
    assert(out.filter(col("region_code").isNull).count() == 0)
    assert(out.filter(col("unique_id").isNull).count() == 0)
  }

  test("tableDiff: added/removed/changed exact, unchanged rows omitted") {
    import spark.implicits._
    val prev = Seq((1L, "a", "en"), (2L, "b", "en"), (3L, "c", "de"),
      (4L, "d", "fr")).toDF("id", "text", "lang")
    val cur = Seq((1L, "a", "en"),          // unchanged → omitted
      (2L, "b2", "en"),                     // changed (text)
      (3L, "c", "zh"),                      // changed (lang)
      (5L, "e", "es"))                      // added; 4 removed
      .toDF("id", "text", "lang")
    val out = Medallion.tableDiff(prev, cur, "id", Seq("text", "lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(2L -> "changed", 3L -> "changed",
      4L -> "removed", 5L -> "added"))
  }
}
