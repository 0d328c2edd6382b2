package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic experiment readout over the events stream: users are
  * assigned to control/treatment by salted content hash (the same
  * engine-portable Bernoulli every sampling operator here uses — no
  * RNG state, append-stable, reproducible across engines and runs),
  * conversion is "the user ever purchased", and the readout is the
  * classic two-proportion z-test.
  *
  * Determinism: assignment and conversion are pure integer/hash
  * functions of the data; counts and ppm rates are exact 63-bit
  * integers; the z² statistic is the one double chain — every term a
  * cast of an exact integer, every operation explicitly associated —
  * so both engines round identically at each IEEE step.
  *
  * Scale: one shuffle keyed on user_id (map-side combined max), then
  * a 1-row global aggregate. Nothing driver-side; the user
  * dimension, not the event volume, bounds the wide state.
  */
object Experiment {

  private def sha60(c: Column): Column =
    org.apache.spark.sql.graft.GraftBridge.column(
      graft.functions.expressions.Sha60(
        org.apache.spark.sql.graft.GraftBridge.expression(c)))

  /** One-row A/B readout: per-arm user and conversion counts, exact
    * ppm rates and lift, and the pooled two-proportion z².
    * Conversion = at least `minCount` events of `convertType` — a
    * count threshold rather than mere presence, so the metric splits
    * the population at any event volume (with presence, a long
    * enough observation window converts everyone and the test
    * degenerates to zero variance — that case is NULL-guarded too). */
  def abTest(events: DataFrame, convertType: String = "purchase",
             minCount: Long = 14L, salt: String = "ab"): DataFrame = {
    val perUser = events
      .groupBy(col("user_id"))
      .agg(when(sum(when(col("event_type") === lit(convertType), 1L)
        .otherwise(0L)) >= minCount, 1L).otherwise(0L).as("conv"))
      .withColumn("v",
        pmod(sha60(concat(lit(s"$salt:"), col("user_id").cast("string"))),
          lit(2L)))
    val counts = perUser.agg(
      sum(when(col("v") === 0, 1L).otherwise(0L)).as("n_control"),
      sum(when(col("v") === 0, col("conv")).otherwise(0L)).as("conv_control"),
      sum(when(col("v") === 1, 1L).otherwise(0L)).as("n_treat"),
      sum(when(col("v") === 1, col("conv")).otherwise(0L)).as("conv_treat"))
    // the one double chain — mirrored token-for-token in the oracle
    counts.select(
      col("n_control"), col("conv_control"), col("n_treat"), col("conv_treat"),
      // empty-arm guard: a degenerate population (no users in an
      // arm) reports NULL rates, never a division error
      expr("CASE WHEN n_control > 0 THEN conv_control * 1000000 div n_control END")
        .as("conv_control_ppm"),
      expr("CASE WHEN n_treat > 0 THEN conv_treat * 1000000 div n_treat END")
        .as("conv_treat_ppm"),
      expr("CASE WHEN n_control > 0 AND n_treat > 0 THEN " +
        "conv_treat * 1000000 div n_treat " +
        "- conv_control * 1000000 div n_control END").as("lift_ppm"),
      expr("""
        CASE WHEN n_control = 0 OR n_treat = 0
          OR conv_treat + conv_control = 0
          OR conv_treat + conv_control = n_treat + n_control THEN NULL
        ELSE
          ((cast(conv_treat as double) / cast(n_treat as double)
            - cast(conv_control as double) / cast(n_control as double))
           * (cast(conv_treat as double) / cast(n_treat as double)
            - cast(conv_control as double) / cast(n_control as double)))
          / (((cast(conv_treat + conv_control as double)
               / cast(n_treat + n_control as double))
              * (1.0 - cast(conv_treat + conv_control as double)
                 / cast(n_treat + n_control as double))
              * cast(n_treat + n_control as double))
             / cast(n_treat * n_control as double))
        END""").as("z_squared"))
  }
}
