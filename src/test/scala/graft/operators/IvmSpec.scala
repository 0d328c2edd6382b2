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
