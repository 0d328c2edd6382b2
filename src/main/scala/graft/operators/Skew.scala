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
}
