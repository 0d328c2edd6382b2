package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-source content overlap — the triage that decides WHERE
  * cross-source dedup money goes: per source pair, the exact content
  * Jaccard AND its k-minimum-values sketch estimate side by side
  * (reference keeps no cross-dataset comparison; its notebooks treat
  * each table independently — 2-Bronze-to-Silver.py:316).
  *
  * KMV at 100 TB: the exact leg shuffles every distinct content hash
  * once (fine at audit SF, expensive at corpus scale); the sketch leg
  * reduces each source to its k SMALLEST sha60 values — a
  * WindowGroupLimit top-k per source, k·|sources| rows total — and
  * estimates Jaccard per pair from the k smallest of the UNION of two
  * signatures (the classic KMV coincidence estimator: the fraction of
  * union-k-minima present in both sets is an unbiased Jaccard
  * estimate). Publishing both at test scale IS the sketch's
  * calibration contract (the approx_distinct pattern); at production
  * scale only the sketch leg runs.
  *
  * Everything is deterministic integer arithmetic: sha60 content
  * hashes, exact counts, ppm ratios by integer division — no
  * RAND(), no float, so both engines emit identical rows. */
object Overlap {

  private def sha60(c: Column): Column =
    org.apache.spark.sql.graft.GraftBridge.column(
      graft.functions.expressions.Sha60(
        org.apache.spark.sql.graft.GraftBridge.expression(c)))

  /** The mergeable core of the sketch leg: each arrival slice's
    * per-source k smallest distinct content hashes. k-min sets are
    * order statistics, so the k smallest of a UNION of per-batch
    * k-min sets equal the k smallest of the union of the batches —
    * the merge is EXACT (not approximate), which is what lets the
    * streaming monitor fold signature shards and still reproduce the
    * one-shot estimate bit-for-bit. */
  def kminShard(documents: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k sizes the KMV signature")
    val wk = Window.partitionBy(col("source")).orderBy(col("h"))
    documents
      .select(col("source"), sha60(col("text")).as("h"))
      .distinct()
      .withColumn("rn", row_number().over(wk))
      .filter(col("rn") <= k)
      .select(col("source"), col("h"))
  }

  /** Fold k-min shards back to one exact per-source signature and
    * emit the per-pair KMV Jaccard estimate — identical integers to
    * the batch sketch leg on ANY arrival split. */
  def kmvEstimateFromShards(shards: DataFrame, k: Int): DataFrame = {
    val wk = Window.partitionBy(col("source")).orderBy(col("h"))
    val sigs = shards.select(col("source"), col("h")).distinct()
      .withColumn("rn", row_number().over(wk))
      .filter(col("rn") <= k)
      .select(col("source"), col("h"))
    val srcs = sigs.select(col("source")).distinct()
    val pairs = broadcast(srcs.select(col("source").as("source_a"))
      .join(srcs.select(col("source").as("source_b")),
        col("source_a") < col("source_b")))
    val tagged = sigs
      .join(pairs,
        col("source") === col("source_a") ||
          col("source") === col("source_b"))
      .groupBy(col("source_a"), col("source_b"), col("h"))
      .agg(max(when(col("source") === col("source_a"), 1L)
        .otherwise(0L)).as("in_a"),
        max(when(col("source") === col("source_b"), 1L)
          .otherwise(0L)).as("in_b"))
    val wp = Window.partitionBy(col("source_a"), col("source_b"))
      .orderBy(col("h"))
    tagged
      .withColumn("rn", row_number().over(wp))
      .filter(col("rn") <= k)
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("m"),
        sum(when(col("in_a") === 1L && col("in_b") === 1L, 1L)
          .otherwise(0L)).as("m_both"))
      .withColumn("kmv_est_ppm", expr("m_both * 1000000 div m"))
      .select(col("source_a"), col("source_b"), col("m"),
        col("m_both"), col("kmv_est_ppm"))
  }

  /** Per ordered source pair (a < b lexicographically):
    * (source_a, source_b, n_a, n_b, n_inter, jaccard_ppm,
    * kmv_est_ppm, kmv_err_ppm). `k` sizes the sketch. */
  def sourceOverlap(documents: DataFrame, k: Int = 128): DataFrame = {
    require(k >= 1, "k sizes the KMV signature")
    // distinct content per source: exact-dup mass inside one source
    // must not inflate its overlap with another
    val hashes = documents
      .select(col("source"), sha60(col("text")).as("h"))
      .distinct()

    // ——— exact leg: one self-join on the content hash ———
    val sizes = hashes.groupBy(col("source"))
      .agg(count(lit(1)).as("n"))
    val inter = hashes.as("x").join(hashes.as("y"),
        col("x.h") === col("y.h") && col("x.source") < col("y.source"))
      .groupBy(col("x.source").as("source_a"),
        col("y.source").as("source_b"))
      .agg(count(lit(1)).as("n_inter"))

    // every ordered pair, so empty intersections still report 0
    val pairs = sizes.select(col("source").as("source_a"),
        col("n").as("n_a"))
      .join(sizes.select(col("source").as("source_b"),
        col("n").as("n_b")), col("source_a") < col("source_b"))
    val exact = pairs
      .join(inter, Seq("source_a", "source_b"), "left")
      .withColumn("n_inter", coalesce(col("n_inter"), lit(0L)))
      .withColumn("jaccard_ppm",
        expr("n_inter * 1000000 div (n_a + n_b - n_inter)"))

    // ——— sketch leg: k smallest hashes per source ———
    val wk = Window.partitionBy(col("source")).orderBy(col("h"))
    val sigs = hashes
      .withColumn("rn", row_number().over(wk))
      .filter(col("rn") <= k)
      .select(col("source"), col("h"))
    // each signature row fans out to every pair its source is in —
    // the pair table is a |sources|²-row broadcast classification
    // frame (like centroid tables), never data-sized
    val pairTags = broadcast(pairs.select(col("source_a"),
      col("source_b")))
    val tagged = sigs
      .join(pairTags,
        col("source") === col("source_a") ||
          col("source") === col("source_b"))
      .groupBy(col("source_a"), col("source_b"), col("h"))
      .agg(max(when(col("source") === col("source_a"), 1L)
        .otherwise(0L)).as("in_a"),
        max(when(col("source") === col("source_b"), 1L)
          .otherwise(0L)).as("in_b"))
    val wp = Window.partitionBy(col("source_a"), col("source_b"))
      .orderBy(col("h"))
    val est = tagged
      .withColumn("rn", row_number().over(wp))
      .filter(col("rn") <= k)
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("m"),
        sum(when(col("in_a") === 1L && col("in_b") === 1L, 1L)
          .otherwise(0L)).as("m_both"))
      .withColumn("kmv_est_ppm", expr("m_both * 1000000 div m"))
      .select(col("source_a"), col("source_b"), col("kmv_est_ppm"))

    exact.join(est, Seq("source_a", "source_b"))
      .withColumn("kmv_err_ppm",
        abs(col("kmv_est_ppm") - col("jaccard_ppm")))
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        col("n_inter"), col("jaccard_ppm"), col("kmv_est_ppm"),
        col("kmv_err_ppm"))
  }
}
