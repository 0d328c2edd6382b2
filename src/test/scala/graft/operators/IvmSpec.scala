package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IvmSpec extends SparkSpec {

  private def full = Ivm.mergePartials(
    Ivm.goldPartial(tables.lineitem, tables.orders, tables.customer,
      tables.nation))

  test("maintain(base, delta) equals the full recompute bit-for-bit") {
    val base = tables.lineitem.filter(expr("l_orderkey % 10 != 0"))
    val delta = tables.lineitem.filter(expr("l_orderkey % 10 = 0"))
    val maintained = Ivm.maintain(base, delta, tables.orders,
      tables.customer, tables.nation)
    assert(maintained.exceptAll(full).count() == 0 &&
      full.exceptAll(maintained).count() == 0)
  }

  test("an empty delta is a no-op") {
    val maintained = Ivm.maintain(tables.lineitem,
      tables.lineitem.limit(0), tables.orders, tables.customer,
      tables.nation)
    assert(maintained.exceptAll(full).count() == 0 &&
      full.exceptAll(maintained).count() == 0)
  }

  test("retractions cancel exactly: maintained equals the filtered recompute") {
    val base = tables.lineitem.filter(expr("l_orderkey % 10 != 0"))
    val deletes = tables.lineitem.filter(expr("l_orderkey % 20 = 1"))
    val inserts = tables.lineitem.filter(expr("l_orderkey % 10 = 0"))
    val maintained = Ivm.maintainWithRetractions(base, deletes, inserts,
      tables.orders, tables.customer, tables.nation)
    val expected = Ivm.mergePartials(Ivm.goldPartial(
      tables.lineitem.filter(expr(
        "(l_orderkey % 10 != 0 AND l_orderkey % 20 != 1) " +
          "OR l_orderkey % 10 = 0")),
      tables.orders, tables.customer, tables.nation))
    assert(maintained.exceptAll(expected).count() == 0 &&
      expected.exceptAll(maintained).count() == 0)
  }

  test("a fully-retracted group vanishes from the maintained view") {
    // delete EVERYTHING that was in the base → only inserts remain
    val base = tables.lineitem.filter(expr("l_orderkey % 10 != 0"))
    val inserts = tables.lineitem.filter(expr("l_orderkey % 10 = 0"))
    val maintained = Ivm.maintainWithRetractions(base, base, inserts,
      tables.orders, tables.customer, tables.nation)
    val insertOnly = Ivm.mergePartials(Ivm.goldPartial(inserts,
      tables.orders, tables.customer, tables.nation))
    assert(maintained.exceptAll(insertOnly).count() == 0 &&
      insertOnly.exceptAll(maintained).count() == 0)
  }

  test("three-way split merges the same as two-way (associativity)") {
    val p0 = Ivm.goldPartial(
      tables.lineitem.filter(expr("l_orderkey % 3 = 0")),
      tables.orders, tables.customer, tables.nation)
    val p1 = Ivm.goldPartial(
      tables.lineitem.filter(expr("l_orderkey % 3 = 1")),
      tables.orders, tables.customer, tables.nation)
    val p2 = Ivm.goldPartial(
      tables.lineitem.filter(expr("l_orderkey % 3 = 2")),
      tables.orders, tables.customer, tables.nation)
    val merged = Ivm.mergePartials(p0, p1, p2)
    assert(merged.exceptAll(full).count() == 0 &&
      full.exceptAll(merged).count() == 0)
  }
}
