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

  /** Top event PATHS of length `len` — the second-order extension of
    * [[matrix]]: every window of `len` consecutive event types per
    * user (ordered by (ts, event_id)) counted corpus-wide, with
    * corpus share in floor-ppm and a global frequency rank — "what
    * do users actually DO", the path-discovery complement of a
    * hand-specified funnel.
    *
    * Scale shape: the same single user_id-keyed window shuffle as
    * [[matrix]] (lead() chains add columns, not passes), then a
    * map-side-combined groupBy to ≤|types|^len path rows; rank and
    * share run over that tiny frame. */
  def topPaths(events: DataFrame, len: Int = 3,
               topN: Int = 20): DataFrame = {
    require(len >= 2 && len <= 5, "path length in [2,5]")
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
    val base = events.select(col("user_id"), col("ts"), col("event_id"),
      col("event_type"))
    val withLeads = (1 until len).foldLeft(base) { (df, i) =>
      df.withColumn(s"t$i", lead(col("event_type"), i).over(byUser))
    }
    val pathCol = concat_ws(">",
      (col("event_type") +: (1 until len).map(i => col(s"t$i"))): _*)
    val paths = withLeads
      .filter(col(s"t${len - 1}").isNotNull)
      .select(pathCol.as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_paths"))
    val total = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    paths
      .withColumn("t", sum(col("n_paths")).over(total))
      .withColumn("path_rank", row_number().over(
        Window.orderBy(col("n_paths").desc, col("path"))).cast("long"))
      .filter(col("path_rank") <= topN)
      .select(col("path"), col("n_paths"),
        expr("(n_paths * 1000000L) div t").as("share_ppm"),
        col("path_rank"))
  }
}
