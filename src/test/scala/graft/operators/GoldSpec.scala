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
}
