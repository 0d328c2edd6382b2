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
}
