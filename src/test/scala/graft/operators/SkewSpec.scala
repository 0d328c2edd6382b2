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

  test("skewReport: hand-computed shares, salt factors, and rank order") {
    import spark.implicits._
    // key a: 6 rows, b: 2, c: 1, d: 1 → t=10, d=4, avg=2.5
    val df = (Seq.fill(6)("a") ++ Seq.fill(2)("b") ++ Seq("c", "d"))
      .toDF("k")
    val out = Skew.skewReport(df, "k", topN = 3).orderBy("key_rank")
      .collect()
    assert(out.map(_.getAs[String]("k")).toSeq == Seq("a", "b", "c"))
    assert(out.map(_.getAs[Long]("cnt")).toSeq == Seq(6L, 2L, 1L))
    assert(out.map(_.getAs[Long]("share_ppm")).toSeq ==
      Seq(600000L, 200000L, 100000L))
    // ceil(cnt·d/t): a → ceil(24/10)=3, b → ceil(8/10)=1, c → 1
    assert(out.map(_.getAs[Long]("salt_factor")).toSeq == Seq(3L, 1L, 1L))
    // rank ties break by key: equal-count keys order deterministically
    val tied = Skew.skewReport(Seq("x", "y", "z").toDF("k"), "k", 2)
      .orderBy("key_rank").collect().map(_.getAs[String]("k")).toSeq
    assert(tied == Seq("x", "y"))
  }

  test("joinSizeEstimate: exact when heavy hitters cover all keys") {
    import spark.implicits._
    val df = (Seq.fill(4)("a") ++ Seq.fill(3)("b") ++ Seq("c")).toDF("k")
    val r = Skew.joinSizeEstimate(df, "k", hh = 10).collect().head
    assert(r.getAs[Long]("actual_pairs") == 16L + 9L + 1L)
    assert(r.getAs[Long]("est_pairs") == r.getAs[Long]("actual_pairs"))
    assert(r.getAs[Long]("err_ppm") == 0L)
  }

  test("joinSizeEstimate: integral-uniform residual, hand-computed error") {
    import spark.implicits._
    // hh=1 captures a(×4); residual b(×3), c(×1): rest_rows=4 over 2
    // keys → q=2 r=0 → est_rest = 2·2² = 8; est = 16+8 = 24 vs
    // actual 16+9+1 = 26 → err = 2e6/26
    val df = (Seq.fill(4)("a") ++ Seq.fill(3)("b") ++ Seq("c")).toDF("k")
    val r = Skew.joinSizeEstimate(df, "k", hh = 1).collect().head
    assert(r.getAs[Long]("n_hh") == 1L)
    assert(r.getAs[Long]("est_pairs") == 24L)
    assert(r.getAs[Long]("actual_pairs") == 26L)
    assert(r.getAs[Long]("err_ppm") == 2L * 1000000L / 26L)
  }

  test("joinSizeEstimate: ragged residual uses the integral split") {
    import spark.implicits._
    // hh=1 → a(×5); residual b×3, c×2, d×2: rest_rows=7 over 3 keys
    // → q=2 r=1 → est_rest = 1·3² + 2·2² = 17
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c")
      ++ Seq.fill(2)("d")).toDF("k")
    val r = Skew.joinSizeEstimate(df, "k", hh = 1).collect().head
    assert(r.getAs[Long]("est_pairs") == 25L + 17L)
    assert(r.getAs[Long]("actual_pairs") == 25L + 9L + 4L + 4L)
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
