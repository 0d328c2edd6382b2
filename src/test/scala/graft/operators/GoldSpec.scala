package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GoldSpec extends SparkSpec {

  test("q1Pricing aggregates by flag+status with exact decimal sums") {
    val out = Gold.q1Pricing(tables.lineitem).collect()
    assert(out.length > 0 && out.length <= 9)
    val cols = Gold.q1Pricing(tables.lineitem).columns.toSet
    assert(cols == Set("l_returnflag", "l_linestatus", "sum_qty",
      "sum_base_price", "sum_disc_price", "sum_charge", "count_order",
      "avg_qty", "avg_price"))
    out.foreach { r =>
      assert(r.getAs[Double]("sum_qty") > 0)
      assert(r.getAs[Double]("sum_disc_price") <= r.getAs[Double]("sum_base_price"))
    }
  }

  test("rankTopK keeps at most k customers per nation") {
    val out = Gold.rankTopK(tables.lineitem, tables.orders,
      tables.customer, tables.nation, k = 3)
    val perNation = out.groupBy("nation").count().collect()
    assert(perNation.forall(_.getAs[Long]("count") <= 3))
    assert(out.filter(col("customer_rank") > 3).count() == 0)
  }

  test("regionSales covers all regions with positive revenue") {
    val out = Gold.regionSales(tables.lineitem, tables.orders,
      tables.customer, tables.nation, tables.region)
    assert(out.select("region").distinct().count() == 5)
    assert(out.filter(col("total_sales") <= 0).count() == 0)
  }

  test("q1Pricing plan pushes the shipdate filter to the parquet scan") {
    val plan = Gold.q1Pricing(tables.lineitem)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("l_shipdate"), s"no pushdown in plan:\n$plan")
  }

  test("exact two-phase quantiles agree with percentile_approx within tolerance") {
    // the single-pass sketch (percentile_approx, accuracy 10k) is the
    // cheap companion when exactness isn't required; it must land
    // within a tight value band of the exact two-phase rank selection
    val exact = Gold.exactGroupQuantiles(tables.events, "event_type",
        "value", Seq(0.25, 0.5, 0.75), 2.0)
      .withColumnRenamed("quantile_value", "exact_v")
    val approx = tables.events.groupBy(col("event_type"))
      .agg(percentile_approx(col("value"),
        array(lit(0.25), lit(0.5), lit(0.75)), lit(10000)).as("vs"))
      .select(col("event_type"), posexplode(col("vs")).as(Seq("i", "approx_v")))
      .withColumn("p", element_at(array(lit(0.25), lit(0.5), lit(0.75)),
        col("i") + 1)).drop("i")
    val joined = exact.join(approx, Seq("event_type", "p")).collect()
    assert(joined.length == 15)
    joined.foreach { r =>
      val (e, a) = (r.getAs[Double]("exact_v"), r.getAs[Double]("approx_v"))
      assert(math.abs(e - a) <= math.max(1.0, e.abs * 0.02),
        s"approx $a too far from exact $e at ${r.getAs[String]("event_type")}/${r.getAs[Double]("p")}")
    }
  }

  test("winsorize clamps to the exact fences and keeps every row") {
    import spark.implicits._
    // group g: values 1..20 → p10 fence = value at rank ceil(0.1*20)=2,
    // p90 = rank 18; clamped range [2, 18]
    val df = (1 to 20).map(v => (v.toLong, "g", v.toDouble))
      .toDF("event_id", "event_type", "value")
    val out = Gold.winsorize(df, "event_type", "value", 0.1, 0.9, 2.0)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Double]("value_w"), r.getAs[Boolean]("clipped"))).toMap
    assert(out.size == 20)
    assert(out(1L) == (2.0, true) && out(2L) == (2.0, false))
    assert(out(19L) == (18.0, true) && out(20L) == (18.0, true))
    assert(out(10L) == (10.0, false))
    // clamped values are COPIES of in-group values, never new numbers
    val vs = (1 to 20).map(_.toDouble).toSet
    assert(out.values.forall(v => vs.contains(v._1)))
  }

  test("winsorize fences are per-group, not global") {
    import spark.implicits._
    val df = ((1 to 10).map(v => (v.toLong, "small", v.toDouble)) ++
      (1 to 10).map(v => (100L + v, "big", v * 1000.0)))
      .toDF("event_id", "event_type", "value")
    val out = Gold.winsorize(df, "event_type", "value", 0.2, 0.8, 2.0)
    // a big-group value that would be an extreme outlier globally is
    // untouched inside its own group's fences
    val bigMid = out.filter(col("event_id") === 105L).collect().head
    assert(bigMid.getAs[Double]("value_w") == 5000.0 &&
      !bigMid.getAs[Boolean]("clipped"))
    // per group: 1 below the p20 fence, 2 above the p80 fence
    assert(out.filter(col("clipped")).count() == 6)
  }

  test("equi-depth histogram splits a group into equal-count buckets") {
    import spark.implicits._
    // 20 values 1..20, 4 buckets → fences at ranks 5/10/15 (values
    // 5, 10, 15); bucket i holds exactly 5 rows
    val df = (1 to 20).map(v => (v.toLong, "g", v.toDouble))
      .toDF("event_id", "event_type", "value")
    val out = Gold.equiDepthHistogram(df, "event_type", "value", 4, 2.0)
      .collect().map(r => r.getAs[Long]("bucket") ->
        (r.getAs[Long]("n"), r.getAs[Double]("lo"), r.getAs[Double]("hi")))
      .toMap
    assert(out.size == 4)
    assert(out(0L) == (5L, 1.0, 5.0))
    assert(out(1L) == (5L, 6.0, 10.0))
    assert(out(2L) == (5L, 11.0, 15.0))
    assert(out(3L) == (5L, 16.0, 20.0))
  }

  test("equi-depth histogram: boundary ties merge deterministically") {
    import spark.implicits._
    // 8 identical values + 2 distinct: the constant spans several
    // fences, ties fold into the low bucket — counts stay exact
    val df = (Seq.fill(8)(5.0) ++ Seq(7.0, 9.0)).zipWithIndex
      .map { case (v, i) => (i.toLong, "g", v) }
      .toDF("event_id", "event_type", "value")
    val out = Gold.equiDepthHistogram(df, "event_type", "value", 4, 2.0)
      .collect().map(r => r.getAs[Long]("bucket") ->
        (r.getAs[Long]("n"), r.getAs[Double]("lo"), r.getAs[Double]("hi")))
      .toMap
    // ranks 3/5/8 all land on the constant → fences (5, 5, 5): the
    // 5.0s beat no fence (bucket 0), 7.0 and 9.0 beat all three
    assert(out.size == 2)
    assert(out(0L) == (8L, 5.0, 5.0))
    assert(out(3L) == (2L, 7.0, 9.0))
    assert(out.values.map(_._1).sum == 10L)
  }

  test("madOutliers flags what the 2-sigma fence misses; MAD=0 groups skip") {
    import spark.implicits._
    // group "g": 20 values at 10±1 plus TWO wild points — the wild
    // pair inflates std enough that 2σ keeps one of them inside, but
    // the median/MAD fence (breakdown 50%) flags both
    val base = (1 to 20).map(i => (i.toLong, "g", 10.0 + (i % 3) - 1))
    val wild = Seq((100L, "g", 500.0), (101L, "g", 5000.0))
    // group "flat": >half identical → MAD = 0 → skipped entirely
    val flat = (200 to 210).map(i => (i.toLong, "flat", 7.0)) ++
      Seq((211L, "flat", 9000.0))
    val df = (base ++ wild ++ flat)
      .toDF("event_id", "event_type", "value")
    val out = Gold.madOutliers(df).collect()
    val flagged = out.map(_.getAs[Long]("event_id")).toSet
    assert(flagged == Set(100L, 101L), s"flagged $flagged")
    out.foreach { r =>
      assert(r.getAs[Double]("mod_z") > 3.5)
      assert(r.getAs[String]("event_type") == "g")
    }
    // the classic 2σ fence misses the smaller wild point: the bigger
    // one drags std to ~1000, hiding its 500-valued companion inside
    // the fence — exactly the masking MAD's 50% breakdown resists
    val stats = df.filter(col("event_type") === "g")
      .agg(avg("value"), stddev_pop("value")).head
    val (mu, sd) = (stats.getDouble(0), stats.getDouble(1))
    assert(math.abs(500.0 - mu) < 2 * sd,
      "test premise: 2-sigma should miss the smaller wild point")
  }

  test("skyline2d: frontier keeps ties, strict domination removes equals") {
    import spark.implicits._
    // customer → n orders of a fixed price (spend = n·price):
    //   c1,c2: (5, 100) tie — both survive     c3: (5, 90) dominated
    //   c4: (3, 150) — dominated by c8's (4, 150): equal spend,
    //       strictly more orders               c6: (6, 90) top count
    //   c7: (2, 80) dominated                  c8: (4, 150) survives
    val rows = Seq(1L -> (5, 20.0), 2L -> (5, 20.0), 3L -> (5, 18.0),
      4L -> (3, 50.0), 6L -> (6, 15.0), 7L -> (2, 40.0),
      8L -> (4, 37.5))
    val orders = rows.flatMap { case (c, (n, p)) =>
      (1 to n).map(i => (c * 100 + i, c, p)) }
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val out = Gold.skyline2d(orders).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.keySet == Set(1L, 2L, 6L, 8L))
    assert(out(6L) == ((6L, 90.0)) && out(8L) == ((4L, 150.0)))
    assert(out(1L) == ((5L, 100.0)) && out(2L) == ((5L, 100.0)))
  }

  test("approxQuantilesAudit: hand-known fences, sketch inside the band") {
    import spark.implicits._
    // values 1..100 in one group: nearest-rank p50=50, band [48, 52]
    val ev = (1 to 100).map(v => ("a", v.toDouble))
      .toDF("event_type", "value")
    val out = Gold.approxQuantilesAudit(ev)
      .collect().map(r => r.getAs[Long]("pct") -> r).toMap
    assert(out(50L).getAs[Double]("exact_value") == 50.0)
    assert(out(50L).getAs[Double]("band_lo") == 48.0 &&
      out(50L).getAs[Double]("band_hi") == 52.0)
    assert(out(90L).getAs[Double]("exact_value") == 90.0)
    assert(out(99L).getAs[Double]("band_hi") == 100.0) // clamped p+2 → 100
    assert(out.values.forall(_.getAs[Boolean]("approx_in_band")))
  }

  test("approxQuantilesAudit: real events — bands ordered, contract holds") {
    val out = Gold.approxQuantilesAudit(tables.events).collect()
    assert(out.length == 15) // 5 types × 3 percentiles
    out.foreach { r =>
      assert(r.getAs[Double]("band_lo") <= r.getAs[Double]("exact_value"))
      assert(r.getAs[Double]("exact_value") <= r.getAs[Double]("band_hi"))
      assert(r.getAs[Boolean]("approx_in_band"))
    }
  }
}
