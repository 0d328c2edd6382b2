package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys: salting.
  *
  * A shuffle join on a skewed key puts a hot key's entire volume in
  * one task. Salting splits each left-side key into `saltFactor`
  * sub-partitions (deterministic salt from a secondary column — no
  * RNG, so retries/speculative tasks agree) and replicates the right
  * side per salt. Results are identical to the plain join; the hot
  * key's work now spreads over `saltFactor` tasks.
  *
  * AQE's skew-join handles moderate skew automatically; explicit
  * salting is for the pathological keys AQE can't split (single-key
  * hot spots inside one shuffle block).
  */
object Skew {

  /** Deterministic salt in [0, saltFactor) derived from `source`. */
  def salt(source: Column, saltFactor: Int): Column =
    pmod(hash(source), lit(saltFactor))

  /** Equi-join `left`⋈`right` on `key` with the left side salted by
    * `leftSaltSource` and the right side replicated `saltFactor`×.
    * Both sides must share the `key` column name. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltFactor: Int, leftSaltSource: String): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      salt(col(leftSaltSource), saltFactor))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedLeft.join(replicatedRight, Seq(key, "__salt")).drop("__salt")
  }

  /** Join-key skew audit: the heaviest `topN` keys with their share
    * of the table (ppm) and the salt factor that would spread each
    * back to average-task volume — the diagnostic run BEFORE picking
    * `saltFactor` for [[saltedJoin]] (or deciding AQE will cope).
    *
    * All integer arithmetic (integral `div`, exact counts) so the
    * report is engine-reproducible. Scale shape: per-key counts are
    * ONE map-side-combined shuffle; the totals row broadcasts; the
    * global top-N prunes per task via `WindowGroupLimit` over the
    * already-aggregated |keys| frame — no full sort of the key
    * census. */
  def skewReport(df: DataFrame, keyCol: String,
                 topN: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(topN > 0, "topN is the number of heavy keys to report")
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(sum(col("cnt")).as("t"),
      count(lit(1)).as("d"))
    val w = Window.orderBy(col("cnt").desc, col(keyCol))
    counts.withColumn("key_rank", row_number().over(w).cast("long"))
      .filter(col("key_rank") <= topN)
      .crossJoin(broadcast(totals))
      .select(col("key_rank"), col(keyCol), col("cnt"),
        // widen through decimal(38,0) BEFORE the multiply: cnt·10⁶
        // (and cnt·d) wrap a long once a key holds ~10¹³ rows — the
        // silent-overflow class the 100 TB posture bans; `div` takes
        // the exact integral quotient back to long
        expr("cast(cnt as decimal(38,0)) * 1000000 div t")
          .as("share_ppm"),
        // ceil(cnt / (t/d)) = how many average keys this key weighs
        expr("(cast(cnt as decimal(38,0)) * d + t - 1) div t")
          .as("salt_factor"))
  }

  /** Optimizer-statistics join-cardinality estimator, graded against
    * truth: estimates |df ⋈ df on keyCol| (the self-equi-join row
    * count Σ c_k²) from exactly the statistics a planner keeps — the
    * top-`hh` heavy-hitter counts plus (rows, distinct) for the
    * residual under a uniform assumption — and reports the exact
    * error in ppm. The uniform residual is computed as the INTEGRAL
    * uniform split (r keys of ⌈q⌉, d−r of ⌊q⌋), so the whole
    * estimate is deterministic 63-bit integer arithmetic.
    *
    * Scale: the key census is one map-side combined shuffle; the
    * estimator consumes only its top-`hh` rows (WindowGroupLimit —
    * no full census sort) and three scalar aggregates. "Actual" is
    * census-derived too (Σ c²), never a materialized join: grading
    * the estimator costs O(|keys|), not O(|output|). Census counts
    * are widened through decimal(38,0) before squaring — c² wraps a
    * long once a key holds ~3·10⁹ rows, well inside 100 TB reality. */
  def joinSizeEstimate(df: DataFrame, keyCol: String,
                       hh: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(hh > 0, "hh is the heavy-hitter budget")
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy(col("cnt").desc, col(keyCol))
    val ranked = counts.withColumn("key_rank",
      row_number().over(w).cast("long"))
    val hhStats = ranked.filter(col("key_rank") <= hh)
      .agg(count(lit(1)).as("n_hh"),
        coalesce(sum(col("cnt")), lit(0L)).as("hh_rows"),
        coalesce(sum(expr("cast(cnt as decimal(38,0)) * cnt")),
          lit(0L).cast("decimal(38,0)")).as("hh_pairs"))
    val totals = counts.agg(count(lit(1)).as("n_keys"),
      sum(col("cnt")).as("n_rows"),
      sum(expr("cast(cnt as decimal(38,0)) * cnt")).as("actual_pairs"))
    totals.crossJoin(broadcast(hhStats))
      .select(col("n_rows"), col("n_keys"), col("n_hh"),
        col("actual_pairs").cast("long").as("actual_pairs"),
        // residual: rest_rows over rest_keys, integral uniform split
        expr("""
          cast(hh_pairs + CASE WHEN n_keys > n_hh THEN
            (n_rows - hh_rows) % (n_keys - n_hh)
              * cast((n_rows - hh_rows) div (n_keys - n_hh) + 1
                     as decimal(38,0))
              * ((n_rows - hh_rows) div (n_keys - n_hh) + 1)
            + (n_keys - n_hh - (n_rows - hh_rows) % (n_keys - n_hh))
              * cast((n_rows - hh_rows) div (n_keys - n_hh)
                     as decimal(38,0))
              * ((n_rows - hh_rows) div (n_keys - n_hh))
          ELSE 0 END as long)""").as("est_pairs"))
      .withColumn("err_ppm",
        expr("abs(est_pairs - actual_pairs) * 1000000 div actual_pairs"))
  }
}
