package graft.operators

import graft.SparkSpec
import graft.functions.expressions.LongBloomMightContain
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftBridge

class RuntimeFilterSpec extends SparkSpec {

  private def urgentOrders = tables.orders
    .filter(col("o_orderpriority") === "1-URGENT")
    .select("o_orderkey", "o_orderpriority")

  test("bloom probe never drops a true match (no false negatives)") {
    val bytes = RuntimeFilter.keyBloom(urgentOrders, "o_orderkey",
      expectedItems = 1 << 16, fpp = 0.03)
    val pruned = RuntimeFilter.bloomProbe(tables.lineitem, "l_orderkey", bytes)
    val trueMatches = tables.lineitem.join(
      urgentOrders.withColumnRenamed("o_orderkey", "l_orderkey"),
      Seq("l_orderkey")).select("l_orderkey").distinct()
    val dropped = trueMatches.except(pruned.select("l_orderkey").distinct())
    assert(dropped.count() === 0L)
  }

  test("bloom probe prunes: survivors are bounded by matches + fp budget") {
    val bytes = RuntimeFilter.keyBloom(urgentOrders, "o_orderkey",
      expectedItems = 1 << 16, fpp = 0.03)
    val total = tables.lineitem.count()
    val survivors = RuntimeFilter
      .bloomProbe(tables.lineitem, "l_orderkey", bytes).count()
    val matches = tables.lineitem.join(
      urgentOrders.withColumnRenamed("o_orderkey", "l_orderkey"),
      Seq("l_orderkey")).count()
    // ~20% of orders are 1-URGENT: the probe must remove most of the
    // non-matching 80%, not just a sliver (10% slack over the exact
    // match count covers bloom false positives at fpp=3%)
    assert(survivors >= matches, "bloom dropped true matches")
    assert(survivors <= matches + (total * 0.10).toLong,
      s"bloom pruned too little: $survivors survivors for $matches matches of $total")
  }

  test("bloomPrunedJoin is result-identical to the plain join") {
    val pruned = RuntimeFilter.bloomPrunedJoin(
        tables.lineitem.select("l_orderkey", "l_quantity"), "l_orderkey",
        urgentOrders, "o_orderkey", expectedItems = 1 << 16)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(12,2)")).as("q"))
    val plain = tables.lineitem.select("l_orderkey", "l_quantity")
      .join(urgentOrders.withColumnRenamed("o_orderkey", "l_orderkey"),
        Seq("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(12,2)")).as("q"))
    assert(pruned.except(plain).count() === 0L)
    assert(plain.except(pruned).count() === 0L)
  }

  test("bloom probe survives codegen and interpreted paths identically") {
    val bytes = RuntimeFilter.keyBloom(urgentOrders, "o_orderkey",
      expectedItems = 1 << 16, fpp = 0.03)
    val bc = spark.sparkContext.broadcast(bytes)
    def probes = tables.lineitem.limit(200).select(col("l_orderkey"),
      GraftBridge.column(LongBloomMightContain(
        GraftBridge.expression(col("l_orderkey")), bc)).as("hit"))
    val withCodegen = probes.collect().map(r => (r.getLong(0), r.getBoolean(1)))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interpreted = probes.collect().map(r => (r.getLong(0), r.getBoolean(1)))
      assert(withCodegen.sameElements(interpreted))
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }
}
