package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BasketSpec extends SparkSpec {

  private def li(rows: (Long, Long)*) = {
    import spark.implicits._
    rows.toDF("l_orderkey", "l_partkey")
  }

  test("support counts and lift on a hand-built basket set") {
    // baskets: {1,2,3} {1,2} {1,2} {3,4} — N=4
    //   (1,2): co 3, n1 3, n2 3 → lift 3·4/9 = 4/3
    //   (3,4): co 1 → below minSupport 2, dropped
    //   (1,3)/(2,3): co 1 → dropped
    val out = Basket.marketBasket(li(
      10L -> 1L, 10L -> 2L, 10L -> 3L,
      11L -> 1L, 11L -> 2L,
      12L -> 1L, 12L -> 2L,
      13L -> 3L, 13L -> 4L)).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(r.getAs[Long]("n_co") == 3 && r.getAs[Long]("n_a") == 3 &&
      r.getAs[Long]("n_b") == 3)
    assert(r.getAs[Double]("lift") == 3.0 * 4.0 / 9.0)
  }

  test("repeated lines of one part in a basket count once") {
    // part 5 appears twice in order 20 — distinct collapses it, so
    // (5,6) co-occurs once per basket, not twice
    val out = Basket.marketBasket(li(
      20L -> 5L, 20L -> 5L, 20L -> 6L,
      21L -> 5L, 21L -> 6L), minSupport = 2L).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("n_co") == 2 &&
      out.head.getAs[Long]("n_a") == 2)
  }

  test("lift separates affinity from popularity") {
    // parts 1,2 always together (2 of 7 baskets): lift 7·2/(2·2) = 3.5
    // parts 8,9 together once of n_8=2, n_9=4: lift 7·1/8 < 1
    val rows = Seq(
      30L -> 1L, 30L -> 2L, 31L -> 1L, 31L -> 2L,
      32L -> 8L, 33L -> 8L, 34L -> 9L, 35L -> 9L, 36L -> 9L) ++
      Seq(32L -> 9L) // one co-occurrence of the popular pair
    val out = Basket.marketBasket(li(rows: _*), minSupport = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        r.getAs[Double]("lift")).toMap
    assert(out((1L, 2L)) == 3.5)
    assert(out((8L, 9L)) == 7.0 / 8.0)
  }

  test("maxBasket guard drops a degenerate mega-basket before expansion") {
    val mega = (1L to 100L).map(p => 40L -> p)
    val small = Seq(41L -> 1L, 41L -> 2L, 42L -> 1L, 42L -> 2L)
    val out = Basket.marketBasket(li(mega ++ small: _*),
      minSupport = 2L, maxBasket = 64)
    val rows = out.collect()
    // only the small baskets survive: their pair and N=2
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("n_co") == 2)
    assert(rows.head.getAs[Double]("lift") == 2.0 * 2.0 / 4.0)
  }

  test("matches a naive per-basket pair count on the real table") {
    val out = Basket.marketBasket(tables.lineitem, minSupport = 2L)
    val naiveCo = tables.lineitem
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
      .groupBy("ok").agg(collect_set("pk").as("ps"))
      .select(explode(expr(
        """flatten(transform(array_sort(ps), (x, i) ->
           transform(slice(array_sort(ps), i + 2, size(ps)),
             y -> struct(x as a, y as b))))""")).as("p"))
      .groupBy("p.a", "p.b").count()
      .filter(col("count") >= 2)
    val lhs = out.select(col("part_a"), col("part_b"), col("n_co"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val rhs = naiveCo.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(lhs == rhs && lhs.nonEmpty)
  }
}
