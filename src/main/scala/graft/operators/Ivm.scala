package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance for ADDITIVE gold aggregates: when
  * the nightly drop is a delta of fact rows, re-aggregating 100 TB
  * to refresh a gold table is the thing a real pipeline cannot
  * afford. For aggregates built from associative partial states
  * (sum, count — the classic self-maintainable views), the
  * maintained view is `merge(partial(base), partial(delta))`, and
  * the merge shuffles only |groups| + |delta-groups| rows.
  *
  * Determinism: revenue partials are EXACT decimal sums (the money
  * rule, SURVEY §4) and merge by decimal addition — associative and
  * rounding-free — so maintained ≡ recomputed bit-for-bit; the cast
  * to double happens once, after the merge, exactly where the full
  * recompute casts.
  *
  * Scale: the base partial is what the gold table already stores (a
  * production system persists the decimal partial column next to
  * the published double); the per-refresh cost is one aggregation
  * over the DELTA plus a |groups|-keyed merge join. The dims
  * broadcast as in every gold query.
  */
object Ivm {

  private val revenue =
    expr("cast(l_extendedprice as decimal(12,2)) * " +
      "(cast(1 as decimal(4,2)) - cast(l_discount as decimal(4,2)))")

  /** Mergeable partial state of the nation × month revenue view:
    * (n_name, sales_month, rev_dec, n_items). */
  def goldPartial(lineitem: DataFrame, orders: DataFrame,
                  customer: DataFrame, nation: DataFrame): DataFrame =
    lineitem
      // fact × fact: shuffle on the join key (AQE may still broadcast
      // at small SF) — only the DIMS get explicit broadcast hints
      .join(orders.select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate")), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer.select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"),
        date_format(col("o_orderdate"), "yyyy-MM").as("sales_month"))
      .agg(sum(revenue).as("rev_dec"), count(lit(1)).as("n_items"))

  /** Merge any number of partial-state frames (base + deltas) into
    * the published view: decimal partials add associatively, the
    * double cast happens once at publish. */
  def mergePartials(partials: DataFrame*): DataFrame =
    partials.reduce(_.unionByName(_))
      .groupBy(col("n_name"), col("sales_month"))
      .agg(sum(col("rev_dec")).as("rev_dec"), sum(col("n_items")).as("n_items"))
      .select(col("n_name"), col("sales_month"),
        col("rev_dec").cast("double").as("total_revenue"), col("n_items"))

  /** The full maintenance flow on a base/delta split of lineitem:
    * partial(base) merged with partial(delta) — result ≡ the full
    * recompute over base ∪ delta (the oracle), at delta cost. */
  def maintain(baseLineitem: DataFrame, deltaLineitem: DataFrame,
               orders: DataFrame, customer: DataFrame,
               nation: DataFrame): DataFrame =
    mergePartials(
      goldPartial(baseLineitem, orders, customer, nation),
      goldPartial(deltaLineitem, orders, customer, nation))

  /** Signed partial for RETRACTIONS: the same aggregation with every
    * contribution multiplied by `sign` (+1 insert / −1 delete) —
    * decimal sums and counts both negate exactly, so a delete delta
    * cancels its insert bit-for-bit in the merge. */
  def goldPartialSigned(lineitem: DataFrame, sign: Int,
                        orders: DataFrame, customer: DataFrame,
                        nation: DataFrame): DataFrame =
    lineitem
      .join(orders.select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate")), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer.select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"),
        date_format(col("o_orderdate"), "yyyy-MM").as("sales_month"))
      .agg((sum(revenue) * lit(sign)).as("rev_dec"),
        (count(lit(1)) * lit(sign.toLong)).as("n_items"))

  /** Maintenance under inserts AND deletes: merge(partial(base),
    * −partial(deletes), +partial(inserts)); groups whose row count
    * retracts to zero vanish — exactly as a full recompute over
    * (base ∖ deletes) ∪ inserts would never emit them. */
  def maintainWithRetractions(baseLineitem: DataFrame,
                              deleteLineitem: DataFrame,
                              insertLineitem: DataFrame,
                              orders: DataFrame, customer: DataFrame,
                              nation: DataFrame): DataFrame =
    Seq(goldPartial(baseLineitem, orders, customer, nation),
      goldPartialSigned(deleteLineitem, -1, orders, customer, nation),
      goldPartialSigned(insertLineitem, 1, orders, customer, nation))
      .reduce(_.unionByName(_))
      .groupBy(col("n_name"), col("sales_month"))
      .agg(sum(col("rev_dec")).as("rev_dec"),
        sum(col("n_items")).as("n_items"))
      .filter(col("n_items") > 0)
      .select(col("n_name"), col("sales_month"),
        col("rev_dec").cast("double").as("total_revenue"), col("n_items"))
}
