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

  /** Poisson(1) weight thresholds in ppm of the hash space: P(0) and
    * P(1) = e⁻¹ ≈ 0.367879, P(2) ≈ 0.183940, P(≥3) lumped at 3 —
    * fixed INTEGER constants, so both engines draw identical weights
    * from identical hashes. */
  val BootThresholds: (Long, Long, Long) = (367879L, 735758L, 919698L)

  /** Deterministic Poisson-bootstrap confidence bracket for the
    * per-group mean token count — error bars at corpus scale without
    * resampling the data: each of `b` virtual resamples weights every
    * row by a Poisson(1)-approximating integer w ∈ {0,1,2,3} drawn
    * from a salted hash of (resample, doc_id) — the standard
    * map-side-combinable bootstrap (Chamandy et al.'s "Estimating
    * Uncertainty for Massive Data Streams", Google TR 2012) made
    * engine-portable: no RNG state, identical weights in any engine,
    * append-stable.
    *
    * Output one row per group: n, mean (one exact-integer division
    * chain), b, and the rank-based bracket [ci_lo, ci_hi] = the
    * `trim+1`-th smallest / largest of the b resample means (for
    * b = 32, trim = 1 that is a ~94% interval). Resample means are
    * divisions of exact longs — bit-identical doubles in any engine,
    * so their order statistics match too.
    *
    * Scale shape: ONE corpus scan; the b-way explode is map-side and
    * the (group, resample) aggregate map-side-combines, so the
    * shuffle carries |groups|·b rows; the bracket windows run over
    * that tiny frame. */
  def bootstrapCi(documents: DataFrame, groupCol: String = "source",
                  b: Int = 32, trim: Int = 1,
                  salt: String = "boot"): DataFrame = {
    require(b >= 2 && trim >= 0 && 2 * (trim + 1) <= b,
      "need at least trim+1 resamples on each flank")
    val (t0, t1, t2) = BootThresholds
    val base = documents.select(col(groupCol),
      size(split(col("text"), " ")).cast("long").as("x"),
      col("doc_id"))
    val resampled = base
      .withColumn("r", explode(array((0 until b).map(lit(_)): _*)))
      .withColumn("u",
        pmod(sha60(concat(lit(s"$salt:"), col("r").cast("string"),
          lit(":"), col("doc_id").cast("string"))), lit(1000000L)))
      .withColumn("w",
        when(col("u") < t0, 0L).when(col("u") < t1, 1L)
          .when(col("u") < t2, 2L).otherwise(3L))
    val perResample = resampled
      .groupBy(col(groupCol), col("r"))
      .agg(sum(col("w") * col("x")).as("ws"), sum(col("w")).as("wn"))
      // an all-zero-weight resample (vanishing probability past a few
      // rows) contributes the empty mean 0 rather than a NULL hole
      .withColumn("rmean",
        when(col("wn") === 0L, lit(0.0))
          .otherwise(col("ws").cast("double") / col("wn").cast("double")))
    val asc = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("rmean"), col("r"))
    val desc = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("rmean").desc, col("r"))
    val bracket = perResample
      .withColumn("ra", row_number().over(asc))
      .withColumn("rd", row_number().over(desc))
      .groupBy(col(groupCol))
      .agg(min(when(col("ra") === trim + 1, col("rmean"))).as("ci_lo"),
        min(when(col("rd") === trim + 1, col("rmean"))).as("ci_hi"))
    base.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
      .withColumn("mean",
        col("sx").cast("double") / col("n").cast("double"))
      .drop("sx")
      .withColumn("b", lit(b.toLong))
      .join(bracket, groupCol)
  }
}
