package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("saltedJoin returns exactly the rows of the plain join") {
    val right = tables.orders.withColumnRenamed("o_orderkey", "l_orderkey")
    val salted = Skew.saltedJoin(tables.lineitem, right, "l_orderkey",
      saltFactor = 8, leftSaltSource = "l_linenumber")
    val plain = tables.lineitem.join(right, "l_orderkey")
    assert(salted.count() == plain.count())
    // row-level equivalence on a projection
    val a = salted.select("l_orderkey", "l_linenumber", "o_orderpriority")
    val b = plain.select("l_orderkey", "l_linenumber", "o_orderpriority")
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("salt is deterministic and spans the requested range") {
    val s = tables.lineitem.select(
      Skew.salt(col("l_linenumber"), 8).as("s")).distinct()
      .collect().map(_.getInt(0)).toSet
    assert(s.subsetOf((0 until 8).toSet))
    assert(s.size > 1)
  }

  test("approx_count_distinct lands within 5% of exact") {
    val r = tables.events.groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id")).as("approx"),
        countDistinct(col("user_id")).as("exact")).collect()
    r.foreach { row =>
      val (ap, ex) = (row.getAs[Long]("approx").toDouble,
        row.getAs[Long]("exact").toDouble)
      assert(math.abs(ap - ex) / ex <= 0.05, s"approx $ap vs exact $ex")
    }
  }
}
