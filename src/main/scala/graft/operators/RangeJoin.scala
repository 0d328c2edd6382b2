package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join without a nested-loop: Spark plans
  * `l.key = r.key AND l.ts BETWEEN r.lo AND r.hi` as a broadcast
  * nested loop (or a per-key sort-merge with full per-key scans) —
  * at scale that is quadratic in the hot key.
  *
  * Bucketing fix: quantize time into `bucketWidth` buckets, explode
  * each interval into the buckets it covers, equi-join on
  * (key, bucket), then filter exact containment. The shuffle key is
  * (key, bucket) — work per bucket is bounded, and interval
  * replication is |interval| / bucketWidth rows (pick bucketWidth
  * near the median interval length).
  */
object RangeJoin {

  private def bucketOf(ts: Column, bucketWidth: Long): Column =
    (ts.cast("long") / bucketWidth).cast("long")

  /** Join point rows (`points`, column `tsCol`) to interval rows
    * (`intervals`, columns `loCol`..`hiCol`, inclusive) sharing
    * `key`. Result: every (point, containing interval) pair. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      key: String, tsCol: String, loCol: String,
                      hiCol: String, bucketWidth: Long): DataFrame = {
    val p = points.withColumn("__bucket", bucketOf(col(tsCol), bucketWidth))
    val iv = intervals.withColumn("__bucket",
      explode(sequence(bucketOf(col(loCol), bucketWidth),
        bucketOf(col(hiCol), bucketWidth))))
    p.join(iv, Seq(key, "__bucket"))
      .filter(col(tsCol) >= col(loCol) && col(tsCol) <= col(hiCol))
      .drop("__bucket")
  }

  /** Interval×interval OVERLAP join (inclusive ends): every
    * (left, right) pair sharing `key` with
    * `leftLo <= rightHi && rightLo <= leftHi` — the interval
    * generalization of [[pointInInterval]], again without a
    * nested-loop.
    *
    * Both sides explode into the `bucketWidth` buckets they cover and
    * equi-join on (key, bucket). An overlapping pair collides in
    * EVERY bucket the overlap spans, so instead of a dedup shuffle
    * (`distinct` over the pair output) the pair is kept only in the
    * one bucket containing the overlap's start
    * (`greatest(leftLo, rightLo)`) — emitted exactly once, map-side.
    * Shuffle key is (key, bucket): replication per row is
    * |interval| / bucketWidth, work per bucket bounded. */
  def intervalOverlap(left: DataFrame, right: DataFrame, key: String,
                      leftLo: String, leftHi: String, rightLo: String,
                      rightHi: String, bucketWidth: Long): DataFrame = {
    val l = left.withColumn("__bucket",
      explode(sequence(bucketOf(col(leftLo), bucketWidth),
        bucketOf(col(leftHi), bucketWidth))))
    val r = right.withColumn("__bucket",
      explode(sequence(bucketOf(col(rightLo), bucketWidth),
        bucketOf(col(rightHi), bucketWidth))))
    l.join(r, Seq(key, "__bucket"))
      .filter(col(leftLo) <= col(rightHi) && col(rightLo) <= col(leftHi))
      .filter(col("__bucket") ===
        bucketOf(greatest(col(leftLo), col(rightLo)), bucketWidth))
      .drop("__bucket")
  }
}
