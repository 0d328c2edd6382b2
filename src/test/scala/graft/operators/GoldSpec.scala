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
}
