package graft

import org.apache.spark.sql.types._

/** Testdata-schema canary: the driver regenerates /root/testdata between
  * rounds and has already changed physical types once (events.ts went
  * from parquet TIMESTAMP(NANOS) to TIMESTAMP(MICROS, NTZ) in r6, which
  * silently broke 50 queries). This suite pins the logical schema every
  * graft operator assumes, per table, as read through the canonical
  * [[Tables]] loaders — so a regeneration that shifts a type again fails
  * HERE with an exact message instead of as a cascade of analysis errors
  * across the whole suite.
  *
  * If this spec is red and nothing in graft changed: the driver
  * regenerated the data. Fix the canonicalization in [[Tables]] (events
  * already branches on the read dtype), then update the expectation here
  * if the new logical type is intentional.
  */
class TestdataSchemaSpec extends SparkSpec {

  private def fields(df: org.apache.spark.sql.DataFrame): Map[String, DataType] =
    df.schema.fields.map(f => f.name -> f.dataType).toMap

  private def assertSchema(name: String,
                           df: org.apache.spark.sql.DataFrame,
                           expected: (String, DataType)*): Unit = {
    val actual = fields(df)
    expected.foreach { case (c, dt) =>
      assert(actual.contains(c), s"$name: column `$c` missing — driver regenerated testdata? actual: ${actual.keys.toSeq.sorted.mkString(", ")}")
      assert(actual(c) == dt, s"$name.$c: expected $dt, read ${actual(c)} — driver regenerated testdata with a new physical type")
    }
    assert(actual.size == expected.size,
      s"$name: expected ${expected.size} columns, read ${actual.size} (${actual.keys.toSeq.sorted.mkString(", ")})")
  }

  test("region / nation / customer / supplier keep their pinned schemas") {
    assertSchema("region", tables.region,
      "r_regionkey" -> IntegerType, "r_name" -> StringType)
    assertSchema("nation", tables.nation,
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType)
    assertSchema("customer", tables.customer,
      "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType)
    assertSchema("supplier", tables.supplier,
      "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType)
  }

  test("part / orders / lineitem keep their pinned schemas") {
    assertSchema("part", tables.part,
      "p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType)
    val orders = fields(tables.orders)
    assert(Set[DataType](TimestampType, TimestampNTZType).contains(orders("o_orderdate")),
      s"orders.o_orderdate: expected a timestamp type, read ${orders("o_orderdate")}")
    val li = fields(tables.lineitem)
    assert(Set[DataType](TimestampType, TimestampNTZType).contains(li("l_shipdate")),
      s"lineitem.l_shipdate: expected a timestamp type, read ${li("l_shipdate")}")
    assert(li("l_quantity") == DoubleType && li("l_extendedprice") == DoubleType &&
      li("l_discount") == DoubleType && li("l_tax") == DoubleType,
      s"lineitem numeric columns drifted: $li")
  }

  test("events canonicalizes ts to epoch-micros LongType whatever the file encodes") {
    // the raw file may be INT64-nanos (pre-r6 data) or TIMESTAMP micros
    // (r6+ data); Tables.events must absorb either
    assertSchema("events", tables.events,
      "event_id" -> LongType, "ts" -> LongType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType,
      "props" -> StringType)
    // sanity on the values, not just the type: epoch-micros for any
    // plausible testdata date range (2000-01-01 .. 2100-01-01). A unit
    // slip (nanos kept as-is, or millis) lands far outside this band.
    val row = tables.events.selectExpr("min(ts)", "max(ts)").head()
    val (lo, hi) = (row.getLong(0), row.getLong(1))
    val y2000Us = 946684800L * 1000000L
    val y2100Us = 4102444800L * 1000000L
    assert(lo >= y2000Us && hi <= y2100Us,
      s"events.ts out of plausible epoch-micros band: min=$lo max=$hi — unit canonicalization broken")
    assertSchema("eventsTimestamped", tables.eventsTimestamped,
      "event_id" -> LongType, "ts" -> TimestampType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType,
      "props" -> StringType)
  }

  test("documents / embeddings keep their pinned schemas") {
    assertSchema("documents", tables.documents,
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType)
    assertSchema("embeddings", tables.embeddings,
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType),
      "label" -> IntegerType)
  }
}
