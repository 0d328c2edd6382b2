package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Gold-layer rollups — Spark-native re-expressions of the reference's
  * gold tables (reference: `2 Medaillon architecture.py`:558-599 and
  * `4  Delta Live Tables (SQL).sql`:177-201: country/monthly sales,
  * top customers, rank-top-3).
  *
  * Determinism: money columns are cast to exact decimals BEFORE
  * aggregation (doubles sum non-deterministically across partition
  * orders and engines; decimals are exact in both Spark and DuckDB).
  * Averages are emitted as `cast(exact_sum as double) / count` — a
  * single bit-identical division.
  *
  * Scale: dimension tables (region/nation/customer) are broadcast; the
  * only shuffles are the fact-side aggregations. All expressions are
  * `functions._`-based → whole-stage codegen.
  */
object Gold {

  /** price/qty → exact decimal: values are 2-dp, < 1e10. */
  private def money(c: Column): Column = c.cast(DecimalType(12, 2))
  /** small factors (discount/tax in [0,1]) → exact decimal. */
  private def factor(c: Column): Column = c.cast(DecimalType(4, 2))
  private val one = lit(1).cast(DecimalType(4, 2))

  /** `l_extendedprice * (1 - l_discount)` as an exact decimal(17,4). */
  def revenue(price: Column, discount: Column): Column =
    money(price) * (one - factor(discount))

  /** TPC-H-Q1-style pricing summary on lineitem (the reference's
    * gold-aggregate pattern applied to the testdata fact table). */
  def q1Pricing(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(money(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(money(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(revenue(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("sum_disc_price"),
        sum(revenue(col("l_extendedprice"), col("l_discount")) *
          (one + factor(col("l_tax")))).cast("double").as("sum_charge"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty",
        col("sum_qty").cast("double") / col("count_order"))
      .withColumn("avg_price",
        col("sum_base_price").cast("double") / col("count_order"))

  /** Revenue by region × month (≈ gold_country_sales: country_code ×
    * sales_month, total_sales, number_of_sales). Dims broadcast. */
  def regionSales(lineitem: DataFrame, orders: DataFrame,
                  customer: DataFrame, nation: DataFrame,
                  region: DataFrame): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region"),
        date_format(col("o_orderdate"), "yyyy-MM").as("sales_month"))
      .agg(
        sum(revenue(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("total_sales"),
        countDistinct(col("o_orderkey")).as("number_of_sales"))

  /** Spend per customer (≈ gold_top_customers: store × customer × name
    * × total_spend). Customer dim broadcast. */
  def topCustomers(lineitem: DataFrame, orders: DataFrame,
                   customer: DataFrame): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_nationkey"))
      .agg(sum(revenue(col("l_extendedprice"), col("l_discount")))
        .cast("double").as("total_spend"))

  /** Top-3 customers per nation by spend (≈ the reference's
    * `rank() over (partition by store_id order by total_spend desc)
    * where customer_rank <= 3`). */
  def rankTopK(lineitem: DataFrame, orders: DataFrame,
               customer: DataFrame, nation: DataFrame,
               k: Int = 3): DataFrame = {
    val spend = topCustomers(lineitem, orders, customer)
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
    val w = Window.partitionBy(col("n_name"))
      .orderBy(col("total_spend").desc, col("c_custkey"))
    spend
      .withColumn("customer_rank", rank().over(w).cast("long"))
      .filter(col("customer_rank") <= k)
      .select(col("n_name").as("nation"), col("c_name").as("customer_name"),
        col("total_spend").as("customer_spend"), col("customer_rank"))
  }

  /** TPC-H-Q5-style: revenue by supplier nation where customer and
    * supplier share the nation (two fact joins + three broadcast
    * dims — the widest join tree in the reference's gold family). */
  def supplierVolume(lineitem: DataFrame, orders: DataFrame,
                     customer: DataFrame, supplier: DataFrame,
                     nation: DataFrame): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(sum(revenue(col("l_extendedprice"), col("l_discount")))
        .cast("double").as("revenue"),
        count(lit(1)).as("line_count"))

  /** TPC-H-Q14-style: per part type, revenue and share of lines in a
    * shipdate window (part dim broadcast; exact-decimal ratio). */
  def partTypeRevenue(lineitem: DataFrame, part: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_type"))
      .agg(sum(revenue(col("l_extendedprice"), col("l_discount")))
        .cast("double").as("type_revenue"),
        count(lit(1)).as("line_count"),
        sum(money(col("p_retailprice"))).cast("double").as("retail_value"))

  /** Exact type-1 (discrete) per-group quantiles — value at rank
    * ceil(p·n) — via TWO-PHASE selection rather than a per-group
    * window sort (which serializes each group's entire volume into one
    * task when the group key is low-cardinality):
    *  1. value-bucket histogram: one parallel shuffle on
    *     (group, bucket); cumulative counts over the tiny histogram
    *     locate, per target rank, the containing bucket and in-bucket
    *     offset k;
    *  2. probe: broadcast-join the target buckets back and take the
    *     k-th order statistic INSIDE single buckets only
    *     (~n/buckets rows per task; shrink `bucketWidth` — or recurse
    *     — as n grows).
    * Rank-based, so engine parity needs no interpolation formula. */
  def exactGroupQuantiles(df: DataFrame, groupCol: String,
                          valueCol: String, ps: Seq[Double],
                          bucketWidth: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bucketed = df.select(col(groupCol), col(valueCol))
      .withColumn("bucket",
        floor(col(valueCol) / bucketWidth).cast("long"))
    val hist = bucketed.groupBy(col(groupCol), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(
        Window.partitionBy(col(groupCol)).orderBy(col("bucket"))))
      .withColumn("n", sum(col("cnt")).over(
        Window.partitionBy(col(groupCol))))
    val targets = cum
      .select(col(groupCol), col("bucket"), col("cnt"), col("cum"),
        col("n"), explode(array(ps.map(lit): _*)).as("p"))
      .withColumn("r", ceil(col("p") * col("n")))
      .filter(col("cum") >= col("r") &&
        col("cum") - col("cnt") < col("r"))
      .select(col(groupCol), col("bucket"), col("p"),
        (col("r") - (col("cum") - col("cnt"))).as("k"))
    bucketed.join(broadcast(targets), Seq(groupCol, "bucket"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col(groupCol), col("p"))
          .orderBy(col(valueCol))))
      .filter(col("rn") === col("k"))
      .select(col(groupCol), col("p"),
        col(valueCol).as("quantile_value"))
  }

  /** Mergeable-sketch quantile audit — the approx_distinct pattern
    * applied to quantiles: `percentile_approx` (the mergeable GK-style
    * sketch every 100 TB pipeline actually serves percentiles from) is
    * engine- and merge-order-specific in its raw estimate, so the
    * audit publishes the EXACT nearest-rank value at each percentile
    * plus the sketch-in-band CONTRACT — approx ∈ [exact(p−slack),
    * exact(p+slack)] — which holds for ANY partitioning because the
    * sketch's rank-error guarantee (1/accuracy, here 1e-4) is far
    * inside the band. Percentiles arrive as integer percents and
    * become doubles via one `pct/100.0` division — the identical
    * IEEE double the oracle's literal parses to, so rank cutoffs
    * agree exactly.
    *
    * Scale: exact fences via [[exactGroupQuantiles]]'s two-phase rank
    * (histogram shuffle + in-bucket top-k — no per-group sort); the
    * sketch side is one map-side-combined aggregate. */
  def approxQuantilesAudit(events: DataFrame,
                           pcts: Seq[Int] = Seq(50, 90, 99),
                           slackPct: Int = 2,
                           accuracy: Int = 10000,
                           bucketWidth: Double = 2.0): DataFrame = {
    require(pcts.forall(p => p - slackPct > 0 && p <= 100))
    val allPcts = (pcts ++ pcts.map(_ - slackPct) ++
      pcts.map(p => math.min(p + slackPct, 100))).distinct
    val exact = exactGroupQuantiles(events, "event_type", "value",
      allPcts.map(_ / 100.0), bucketWidth)
    val approx = events.groupBy(col("event_type"))
      .agg(percentile_approx(col("value"),
        array(pcts.map(p => lit(p / 100.0)): _*), lit(accuracy))
        .as("approx"))
    val perP = approx.select(col("event_type"),
      posexplode(col("approx")).as(Seq("i", "approx_v")))
      // index → integer percent, then the SAME pct/100.0 division
      // the exact frame's keys were built with
      .withColumn("pct", pcts.zipWithIndex.foldLeft(lit(-1)) {
        case (acc, (p, i)) => when(col("i") === i, lit(p)).otherwise(acc)
      })
      .withColumn("p_mid", col("pct").cast("double") / 100.0)
      .withColumn("p_lo",
        (col("pct") - slackPct).cast("double") / 100.0)
      .withColumn("p_hi",
        least(col("pct") + slackPct, lit(100)).cast("double") / 100.0)
    val mid = exact.select(col("event_type"), col("p").as("p_mid"),
      col("quantile_value").as("exact_value"))
    val lo = exact.select(col("event_type"), col("p").as("p_lo"),
      col("quantile_value").as("band_lo"))
    val hi = exact.select(col("event_type"), col("p").as("p_hi"),
      col("quantile_value").as("band_hi"))
    perP
      .join(mid, Seq("event_type", "p_mid"))
      .join(lo, Seq("event_type", "p_lo"))
      .join(hi, Seq("event_type", "p_hi"))
      .select(col("event_type"), col("pct").cast("long").as("pct"),
        col("exact_value"), col("band_lo"), col("band_hi"),
        (col("approx_v") >= col("band_lo") &&
          col("approx_v") <= col("band_hi")).as("approx_in_band"))
  }

  /** Winsorization — the outlier TREATMENT step after value_outliers
    * flags them: per-group exact nearest-rank quantile fences
    * [pLo, pHi], values outside clamped TO the fence (never dropped —
    * row count and joins downstream stay intact, unlike a filter).
    * Fences come from [[exactGroupQuantiles]] (two-phase rank: no
    * per-group global sort), pivot to one row per group, broadcast
    * back, and the clamp is a pure when-chain that only ever COPIES an
    * existing double — no arithmetic, so output hash-matches the
    * oracle bit-for-bit. One histogram shuffle + a broadcast probe;
    * the clamp itself is map-only. */
  def winsorize(df: DataFrame, groupCol: String, valueCol: String,
                pLo: Double, pHi: Double,
                bucketWidth: Double): DataFrame = {
    val fences = exactGroupQuantiles(df, groupCol, valueCol,
      Seq(pLo, pHi), bucketWidth)
      .groupBy(col(groupCol))
      .agg(
        min(when(col("p") === pLo, col("quantile_value"))).as("lo"),
        min(when(col("p") === pHi, col("quantile_value"))).as("hi"))
    df.join(broadcast(fences), Seq(groupCol))
      .select(col("event_id"), col(groupCol), col(valueCol),
        when(col(valueCol) < col("lo"), col("lo"))
          .when(col(valueCol) > col("hi"), col("hi"))
          .otherwise(col(valueCol)).as("value_w"),
        (col(valueCol) < col("lo") || col(valueCol) > col("hi"))
          .as("clipped"))
  }

  /** Equi-DEPTH histogram — value_histogram's fixed-width buckets
    * answer "how are values spread", equal-count buckets answer "where
    * do the rows live": B buckets bounded by the exact nearest-rank
    * i/B quantiles, each holding ~n/B rows (exactly n/B up to
    * boundary ties, which merge deterministically). Fences come from
    * [[exactGroupQuantiles]] (two-phase rank, no per-group global
    * sort), collapse to one tiny array per group, broadcast back, and
    * the bucket id is a pure comparison count — no arithmetic touches
    * the values, so min/max/count hash-match the oracle exactly. */
  def equiDepthHistogram(df: DataFrame, groupCol: String,
                         valueCol: String, buckets: Int,
                         bucketWidth: Double): DataFrame = {
    val ps = (1 until buckets).map(_.toDouble / buckets)
    val fences = exactGroupQuantiles(df, groupCol, valueCol, ps,
      bucketWidth)
      .groupBy(col(groupCol))
      .agg(sort_array(collect_list(struct(col("p"),
        col("quantile_value")))).as("fs"))
      .select(col(groupCol),
        expr("transform(fs, f -> f.quantile_value)").as("farr"))
    df.join(broadcast(fences), Seq(groupCol))
      .withColumn("bucket",
        size(filter(col("farr"), f => col(valueCol) > f)).cast("long"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(count(lit(1)).as("n"), min(col(valueCol)).as("lo"),
        max(col(valueCol)).as("hi"))
  }

  /** Orders × lineitem rollup by priority (count-distinct pattern from
    * the reference gold tables). */
  def orderPriority(lineitem: DataFrame, orders: DataFrame): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        countDistinct(col("o_orderkey")).as("order_count"),
        count(lit(1)).as("line_count"),
        sum(money(col("l_quantity"))).cast("double").as("total_qty"))

  /** RFM customer segmentation over the event stream: per user,
    * Recency (days since last event, vs the table's newest event),
    * Frequency (event count) and Monetary (exact-decimal value sum),
    * each scored into quintiles 1–5 against EXACT nearest-rank
    * fences, concatenated into the classic "RFM" segment label
    * ("555" = recent + frequent + high-value).
    *
    * Determinism: recency/frequency are integers; monetary is the
    * exact decimal(18,2) sum cast once to double (the value_outliers
    * idiom); fences are type-1 exact quantiles (value AT rank
    * ceil(p·n) — [[exactGroupQuantiles]]), and a score is `1 + #
    * fences strictly below the value` (recency inverted: newer =
    * higher) — pure comparisons against copied values, no arithmetic,
    * so both engines agree exactly.
    *
    * Scale shape: one user-keyed map-side-combined aggregate (the
    * same key the session/funnel family shuffles on), then three
    * two-phase quantile selections over USER-metric rows (histogram
    * shuffle + in-bucket offset — never a global sort), fences
    * broadcast back, scoring map-side. No driver state, no single-
    * partition window at any size. */
  def userRfm(events: DataFrame): DataFrame = {
    val dayUs = 86400000000L
    val tRef = events.agg(max(col("ts")).as("t_ref"))
    val perUser = events.crossJoin(broadcast(tRef))
      .groupBy(col("user_id"))
      .agg(
        ((first(col("t_ref")) - max(col("ts"))).cast("long")).as("age_us"),
        count(lit(1)).as("frequency"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double")
          .as("monetary"))
      .select(col("user_id"),
        expr(s"age_us div $dayUs").as("recency_days"),
        col("frequency"), col("monetary"))
      .withColumn("g", lit(1))
    val ps = Seq(0.2, 0.4, 0.6, 0.8)
    // 4-row driver scalar per metric (the anonymize_generalize
    // pattern) — fences are broadcast-by-literal into the scoring map
    def fences(valueCol: String, bucketWidth: Double): Column = {
      val f = exactGroupQuantiles(perUser, "g", valueCol, ps, bucketWidth)
        .select(col("p"), col("quantile_value").cast("double").as("qv"))
        .orderBy("p").collect().map(_.getAs[Double]("qv"))
      array(f.map(lit): _*)
    }
    val rF = fences("recency_days", 1.0)
    val fF = fences("frequency", 1.0)
    val mF = fences("monetary", 10.0)
    def above(v: Column, fs: Column): Column =
      size(filter(fs, f => v > f)).cast("long")
    perUser
      .withColumn("r_score", lit(5L) - above(col("recency_days").cast("double"), rF))
      .withColumn("f_score", lit(1L) + above(col("frequency").cast("double"), fF))
      .withColumn("m_score", lit(1L) + above(col("monetary"), mF))
      .select(col("user_id"), col("recency_days"), col("frequency"),
        col("monetary"), col("r_score"), col("f_score"), col("m_score"),
        concat(col("r_score"), col("f_score"), col("m_score"))
          .as("rfm_segment"))
  }

  /** Robust outlier detection via the MAD modified z-score
    * (Iglewicz-Hoaglin): rows where 0.6745·|x − median|/MAD exceeds
    * `threshold` — the robust companion to the 2σ `value_outliers`
    * (mean/std are themselves dragged by the outliers they hunt;
    * median/MAD have a 50% breakdown point, so one wild stripe can't
    * hide itself by inflating the fence).
    *
    * Determinism: both the median and the MAD come from
    * [[exactGroupQuantiles]] — COPIES of existing data values, never
    * arithmetic — and the z-score is one fixed double chain. Groups
    * where MAD = 0 (over half the values identical) are skipped: the
    * score is undefined there and flagging "everything ≠ mode" is a
    * different operator.
    *
    * Scale shape: two two-phase quantile passes (histogram shuffle +
    * broadcast rank probe each — no per-group global sort) and two
    * broadcast joins of |groups|-row fence frames; the flag filter is
    * map-side. */
  def madOutliers(df: DataFrame, groupCol: String = "event_type",
                  valueCol: String = "value", idCol: String = "event_id",
                  threshold: Double = 3.5): DataFrame = {
    val med = exactGroupQuantiles(df, groupCol, valueCol, Seq(0.5), 2.0)
      .select(col(groupCol), col("quantile_value").as("med"))
    val dev = df.join(broadcast(med), groupCol)
      .withColumn("dev", abs(col(valueCol) - col("med")))
    val mad = exactGroupQuantiles(dev, groupCol, "dev", Seq(0.5), 0.5)
      .select(col(groupCol), col("quantile_value").as("mad"))
    dev.join(broadcast(mad), groupCol)
      .withColumn("mod_z", lit(0.6745) * col("dev") / col("mad"))
      .filter(col("mad") > 0 && col("mod_z") > threshold)
      .select(col(idCol), col(groupCol), col(valueCol), col("med"),
        col("mad"), col("mod_z"))
  }

  /** 2-D skyline (Pareto frontier) of customers over (order count,
    * total spend) — the rows no other row dominates in BOTH
    * dimensions (≥ in both, > in at least one): "best customers" with
    * no single ranking function imposed. The textbook formulation is
    * a quadratic NOT-EXISTS self-join (the oracle); in 2-D it
    * collapses to maxima bookkeeping: a row survives iff its spend
    * equals its count-group's max AND strictly exceeds every
    * higher-count group's max.
    *
    * Scale shape: one per-customer aggregate (the only full-data
    * shuffle), then per-count maxima — a ≤|distinct counts| frame
    * whose running-max window is the plan's one tiny single-partition
    * exchange — broadcast back for a map-side filter. NO self-join at
    * any size; the n-D generalization would partition on a grid. */
  def skyline2d(orders: DataFrame): DataFrame = {
    val a = orders.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(money(col("o_totalprice"))).cast("double").as("total_spend"))
    val nmax = a.groupBy(col("n_orders"))
      .agg(max(col("total_spend")).as("mx_same"))
    val wAbove = Window.orderBy(col("n_orders").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val fronts = nmax.withColumn("mx_above",
      max(col("mx_same")).over(wAbove))
    a.join(broadcast(fronts), "n_orders")
      .filter(col("total_spend") === col("mx_same") &&
        (col("mx_above").isNull || col("total_spend") > col("mx_above")))
      .select(col("o_custkey"), col("n_orders"), col("total_spend"))
  }
}
