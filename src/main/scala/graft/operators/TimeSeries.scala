package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series gap repair — the step after event_resample's
  * densification: the dense grid's EMPTY buckets get linearly
  * interpolated values between the nearest observed neighbors
  * (edges clamp to the nearest observation), turning an irregular
  * event stream into an analysis-ready regular series.
  *
  * Determinism: observed bucket values are exact-decimal sums divided
  * once (the value_outliers idiom); the interpolation itself is one
  * fixed left-associated double expression — prev + (next − prev) ·
  * Δ/span — so both engines produce bit-identical doubles.
  *
  * Scale: bucket aggregation is one map-side-combined shuffle over
  * (type, bucket) keys; the grid is bounded by type-count × time-span
  * (tiny relative to events at any scale) and the neighbor scan is a
  * window over GRID rows, never raw events. A per-type window sort of
  * the grid is the only ordered pass, and its partition is the
  * series, which is exactly the unit a forecasting consumer needs
  * co-located anyway.
  */
object TimeSeries {

  /** Hourly mean-value series per event_type with empty hours filled
    * by linear interpolation: (event_type, hour_us, value_f,
    * observed). */
  def interpolate(events: DataFrame): DataFrame = {
    val hourUs = 3600000000L
    val hourly = events.select(col("event_type"),
        (col("ts") - pmod(col("ts"), lit(hourUs))).as("hour_us"),
        col("value"))
      .groupBy("event_type", "hour_us")
      .agg((sum(col("value").cast("decimal(18,2)")).cast("double") /
        count(lit(1))).as("v"))
    val grid = events.groupBy(col("event_type"))
      .agg(min(col("ts")).as("lo"), max(col("ts")).as("hi"))
      .select(col("event_type"), explode(sequence(
        col("lo") - pmod(col("lo"), lit(hourUs)),
        col("hi") - pmod(col("hi"), lit(hourUs)),
        lit(hourUs))).as("hour_us"))
    val joined = grid.join(hourly, Seq("event_type", "hour_us"), "left")
    val w = Window.partitionBy("event_type").orderBy("hour_us")
    val back = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsHour = when(col("v").isNotNull, col("hour_us"))
    joined
      .withColumn("pv", last(col("v"), ignoreNulls = true).over(back))
      .withColumn("ph", last(obsHour, ignoreNulls = true).over(back))
      .withColumn("nv", first(col("v"), ignoreNulls = true).over(fwd))
      .withColumn("nh", first(obsHour, ignoreNulls = true).over(fwd))
      .select(col("event_type"), col("hour_us"),
        when(col("v").isNotNull, col("v"))
          .when(col("pv").isNull, col("nv"))
          .when(col("nv").isNull, col("pv"))
          .otherwise(col("pv") + (col("nv") - col("pv")) *
            ((col("hour_us") - col("ph")).cast("double") /
              (col("nh") - col("ph")).cast("double")))
          .as("value_f"),
        col("v").isNotNull.as("observed"))
  }
}
