package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence mining: the first-order Markov transition matrix
  * over per-user event streams — P(next event type | current event
  * type). The behavioral-analytics complement of conversion_funnel
  * (which tracks ONE hand-picked pair): the matrix surfaces every
  * follow-on pattern at once and is the input to next-event
  * prediction, funnel discovery, and anomalous-session scoring.
  *
  * Determinism: the successor of an event is defined by the TOTAL
  * order (ts, event_id) within each user — ties cannot reorder. All
  * counts are integers; the only double is one final fixed division
  * per matrix cell, so both engines agree bit-for-bit.
  *
  * Scale shape: raw events shuffle ONCE on user_id for the lead()
  * window (the same key the session/funnel family uses — a shared
  * exchange in a composed pipeline). The pair frame then collapses
  * via a map-side-combined groupBy to at most |types|² rows, and the
  * per-source normalizer is a window over THAT tiny matrix frame —
  * never over raw events. No driver-side state at any size.
  */
object Transitions {

  /** (from_type, to_type, n_pairs, p_next) over consecutive events
    * per user, ordered by (ts, event_id). */
  def matrix(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
    val pairs = events
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(byUser))
      .filter(col("to_type").isNotNull)
    val cells = pairs.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_pairs"))
    val byFrom = Window.partitionBy("from_type")
    cells
      .withColumn("p_next", col("n_pairs").cast("double") /
        sum(col("n_pairs")).over(byFrom).cast("double"))
  }
}
