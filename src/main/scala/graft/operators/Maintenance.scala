package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table-maintenance writers — Spark-native analogs of the reference's
  * `OPTIMIZE ... ZORDER BY` and partitioned layout (reference:
  * `2 Medaillon architecture.py`:431-465).
  *
  * Spark has no Delta OPTIMIZE; the equivalents are:
  *  - compaction: repartition to a target file count with
  *    `maxRecordsPerFile` bounding file size;
  *  - ZORDER-ish clustering: `repartitionByRange` +
  *    `sortWithinPartitions` on the lookup keys → parquet row-group
  *    min/max stats become selective, so later point/range reads skip
  *    row groups exactly like a zordered Delta table;
  *  - partition pruning: hive-style `partitionBy` directories.
  */
object Maintenance {

  /** Cluster `df` by `sortCols` into `numFiles` range-partitioned,
    * internally sorted files (OPTIMIZE+ZORDER analog). */
  def clusteredFrame(df: DataFrame, sortCols: Seq[String],
                     numFiles: Int): DataFrame =
    df.repartitionByRange(numFiles, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)

  def writeClustered(df: DataFrame, path: String, sortCols: Seq[String],
                     numFiles: Int,
                     maxRecordsPerFile: Long = 5_000_000L): Unit =
    clusteredFrame(df, sortCols, numFiles)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)

  /** 2-D Morton (Z-order) key: interleaves the bits of two 16-bit
    * normalized coordinates, so sorting on the key clusters BOTH
    * dimensions at once. A linear concatenated sort (a, b) leaves b's
    * min/max stats useless — every file spans b's full range — while
    * the space-filling curve keeps each file a compact rectangle in
    * (a, b) space, so 2-D range predicates prune files on either
    * column. Pure integer bit ops (classic bit-spreading) — stays in
    * whole-stage codegen, no UDF. This is the real ZORDER, beyond the
    * single-axis `repartitionByRange` analog in [[clusteredFrame]]. */
  def mortonKey(a: Column, b: Column): Column = {
    def spread(x: Column): Column = {
      var v = x.bitwiseAND(lit(0xFFFFL))
      v = v.bitwiseOR(shiftleft(v, 8)).bitwiseAND(lit(0x00FF00FFL))
      v = v.bitwiseOR(shiftleft(v, 4)).bitwiseAND(lit(0x0F0F0F0FL))
      v = v.bitwiseOR(shiftleft(v, 2)).bitwiseAND(lit(0x33333333L))
      v.bitwiseOR(shiftleft(v, 1)).bitwiseAND(lit(0x55555555L))
    }
    spread(a).bitwiseOR(shiftleft(spread(b), 1))
  }

  /** Scale a column to the 16-bit Morton coordinate range given its
    * min/max (floor((c−lo)·65535/(hi−lo)), exact in double up to
    * 2^52). */
  def normalize16(c: Column, lo: Long, hi: Long): Column =
    if (hi <= lo) lit(0L)
    else floor(((c.cast("long") - lo) * lit(65535L)).cast("double") /
      (hi - lo)).cast("long")

  /** 3-D Morton key: bits of three 16-bit coordinates interleaved
    * 2 apart (the canonical 21-bit 3-way spread masks, of which we use
    * the low 16) — each file becomes a compact BOX in (a, b, c) space,
    * so range predicates prune on any of the three columns. Same pure
    * codegen integer bit ops as [[mortonKey]]. */
  def mortonKey3(a: Column, b: Column, c: Column): Column = {
    def spread3(x: Column): Column = {
      var v = x.bitwiseAND(lit(0x1FFFFFL))
      v = v.bitwiseOR(shiftleft(v, 32)).bitwiseAND(lit(0x1F00000000FFFFL))
      v = v.bitwiseOR(shiftleft(v, 16)).bitwiseAND(lit(0x1F0000FF0000FFL))
      v = v.bitwiseOR(shiftleft(v, 8)).bitwiseAND(lit(0x100F00F00F00F00FL))
      v = v.bitwiseOR(shiftleft(v, 4)).bitwiseAND(lit(0x10C30C30C30C30C3L))
      v.bitwiseOR(shiftleft(v, 2)).bitwiseAND(lit(0x1249249249249249L))
    }
    spread3(a).bitwiseOR(shiftleft(spread3(b), 1))
      .bitwiseOR(shiftleft(spread3(c), 2))
  }

  /** `df` clustered along the 3-D Morton curve of (`colA`, `colB`,
    * `colC`) into `numFiles` range partitions. */
  def zOrderedFrame3(df: DataFrame, colA: String, colB: String,
                     colC: String, numFiles: Int): DataFrame = {
    val mm = df.agg(
      min(col(colA)).cast("long"), max(col(colA)).cast("long"),
      min(col(colB)).cast("long"), max(col(colB)).cast("long"),
      min(col(colC)).cast("long"), max(col(colC)).cast("long")).head()
    df.withColumn("__z", mortonKey3(
        normalize16(col(colA), mm.getLong(0), mm.getLong(1)),
        normalize16(col(colB), mm.getLong(2), mm.getLong(3)),
        normalize16(col(colC), mm.getLong(4), mm.getLong(5))))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** 3-D Z-ordered write: [[zOrderedFrame3]] to parquet. */
  def writeZOrdered3(df: DataFrame, path: String, colA: String,
                     colB: String, colC: String, numFiles: Int): Unit =
    zOrderedFrame3(df, colA, colB, colC, numFiles)
      .write.mode("overwrite").parquet(path)

  /** `df` clustered along the Morton curve of (`colA`, `colB`) into
    * `numFiles` range partitions. One cheap min/max aggregate + one
    * range shuffle, exactly like [[clusteredFrame]]. */
  def zOrderedFrame(df: DataFrame, colA: String, colB: String,
                    numFiles: Int): DataFrame = {
    val mm = df.agg(min(col(colA)).cast("long"), max(col(colA)).cast("long"),
      min(col(colB)).cast("long"), max(col(colB)).cast("long")).head()
    val (aLo, aHi, bLo, bHi) =
      (mm.getLong(0), mm.getLong(1), mm.getLong(2), mm.getLong(3))
    df.withColumn("__z", mortonKey(
        normalize16(col(colA), aLo, aHi), normalize16(col(colB), bLo, bHi)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** Z-ordered write: [[zOrderedFrame]] to parquet. */
  def writeZOrdered(df: DataFrame, path: String, colA: String,
                    colB: String, numFiles: Int): Unit =
    zOrderedFrame(df, colA, colB, numFiles)
      .write.mode("overwrite").parquet(path)

  /** 2-D Hilbert-curve key over two 16-bit normalized coordinates —
    * [[mortonKey]]'s locality-preserving sibling: consecutive key
    * values are always grid-ADJACENT (spec-proven bijection +
    * unit-step walk), where the Z curve jumps across the plane at
    * every power-of-two boundary — so an equal-size key range tiles
    * into a slightly tighter rectangle. Runs as the codegen'd
    * [[graft.functions.expressions.HilbertKey]] kernel (a 16-step
    * integer loop has no Column-tree form). */
  def hilbertKey(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.GraftBridge.column(
      graft.functions.expressions.HilbertKey(
        org.apache.spark.sql.graft.GraftBridge.expression(a),
        org.apache.spark.sql.graft.GraftBridge.expression(b)))

  /** `df` clustered along the Hilbert curve of (`colA`, `colB`) —
    * same min/max agg + one range shuffle as [[zOrderedFrame]], a
    * different space-filling curve. */
  def hilbertFrame(df: DataFrame, colA: String, colB: String,
                   numFiles: Int): DataFrame = {
    val mm = df.agg(min(col(colA)).cast("long"), max(col(colA)).cast("long"),
      min(col(colB)).cast("long"), max(col(colB)).cast("long")).head()
    df.withColumn("__h", hilbertKey(
        normalize16(col(colA), mm.getLong(0), mm.getLong(1)),
        normalize16(col(colB), mm.getLong(2), mm.getLong(3))))
      .repartitionByRange(numFiles, col("__h"))
      .sortWithinPartitions(col("__h"))
      .drop("__h")
  }

  /** Hilbert-clustered write: [[hilbertFrame]] to parquet. */
  def writeHilbert(df: DataFrame, path: String, colA: String,
                   colB: String, numFiles: Int): Unit =
    hilbertFrame(df, colA, colB, numFiles)
      .write.mode("overwrite").parquet(path)

  /** Hive-partitioned write: one directory per `partitionCol` value —
    * reads filtered on it prune whole directories. */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)

  /** Read-back helper for verifying clustering/pruning behavior. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  // ---------- zone-map data skipping ----------
  // Delta/Iceberg keep per-file column min/max in the transaction log
  // and prune files BEFORE the scan; a plain parquet directory only
  // has row-group stats, discovered after every file is opened. The
  // zone map recovers log-level skipping: one tiny stats table beside
  // the data (underscore dir — invisible to normal reads), consulted
  // driver-side to shortlist files. After a clustered write the
  // shortlist is a small fraction of the directory for selective
  // ranges; at 100 TB that's the difference between listing a few
  // files and opening every footer in the table.

  /** Per-file min/max stats for `cols` — one scan, one row per file. */
  def zoneMapFrame(spark: SparkSession, path: String,
                   cols: Seq[String]): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_rows"),
        cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"),
          max(col(c)).as(s"max_$c"))): _*)

  /** Build + persist the zone map under `path/_zone_map` (underscore
    * prefix: ignored by parquet directory reads, like `_graft_log`). */
  def writeZoneMap(spark: SparkSession, path: String,
                   cols: Seq[String]): Unit =
    zoneMapFrame(spark, path, cols).coalesce(1)
      .write.mode("overwrite").parquet(s"$path/_zone_map")

  /** Files whose [min,max] intersects [lo,hi] on `column` — the
    * driver-side shortlist (the zone map is one row per file). */
  def zoneMapSurvivors(spark: SparkSession, path: String, column: String,
                       lo: Any, hi: Any): Seq[String] =
    spark.read.parquet(s"$path/_zone_map")
      .filter(!(col(s"max_$column") < lit(lo) ||
        col(s"min_$column") > lit(hi)))
      .select("file").collect().map(_.getString(0)).toSeq

  /** Range read with zone-map skipping: only surviving files are
    * handed to the reader (the scan never lists the rest), then the
    * exact predicate runs as the residual filter. Semantically
    * identical to the full-directory read — the zone map can only
    * skip files that provably contain no matches. */
  def readSkipping(spark: SparkSession, path: String, column: String,
                   lo: Any, hi: Any): DataFrame = {
    val survivors = zoneMapSurvivors(spark, path, column, lo, hi)
    val base =
      if (survivors.isEmpty)
        spark.read.parquet(path).limit(0)
      else spark.read.parquet(survivors: _*)
    base.filter(col(column) >= lit(lo) && col(column) <= lit(hi))
  }

  private def bfiSha60(c: Column): Column =
    org.apache.spark.sql.graft.GraftBridge.column(
      graft.functions.expressions.Sha60(
        org.apache.spark.sql.graft.GraftBridge.expression(c)))

  /** Per-FILE bloom index (Delta's bloom-filter data-skipping index,
    * the POINT-lookup complement of the zone map's range skipping —
    * a clustered layout makes min/max selective for the sort key,
    * but a point probe on any OTHER high-cardinality column still
    * touches every file; this index prunes those). The filter is
    * materialized as ROWS, not bytes: per file the DISTINCT set of
    * k sha60 hash positions of its keys — an explicit bit set that a
    * plain groupBy/distinct builds (associative, any partitioning),
    * ≤ files·k·mBits rows, and that plain SQL replicates exactly, so
    * the pruned read is oracle-checkable end-to-end. No false
    * negatives by construction: a file containing the key has all k
    * positions set, so the pruned result ≡ the full-directory
    * filter. */
  def writeBloomIndex(spark: SparkSession, path: String, column: String,
                      mBits: Int = 4096, k: Int = 4): Unit = {
    val keys = spark.read.parquet(path)
      .select(input_file_name().as("file"),
        col(column).cast("string").as("key"))
    (0 until k).map { r =>
      keys.select(col("file"), lit(r).as("r"),
        pmod(bfiSha60(concat(lit(s"bfi:$r:"), col("key"))),
          lit(mBits.toLong)).as("pos"))
    }.reduce(_ unionByName _)
      .distinct()
      .write.mode("overwrite").parquet(s"$path/_bloom_index")
  }

  /** Files whose bloom has ALL k positions of `value` set — the
    * driver-side shortlist (≤ one row per file). */
  def bloomSurvivors(spark: SparkSession, path: String, value: String,
                     mBits: Int = 4096, k: Int = 4): Seq[String] = {
    // probe positions via the SAME kernel on a 1-row frame (bounded
    // driver scalar), so index and probe hashing cannot drift
    val probe: Seq[(Int, Long)] = spark.range(1).select(
      (0 until k).map(r => pmod(bfiSha60(
        concat(lit(s"bfi:$r:"), lit(value))), lit(mBits.toLong))
        .as(s"p$r")): _*)
      .head() match {
        case row => (0 until k).map(r => r -> row.getLong(r))
      }
    val cond = probe.map { case (r, p) =>
      col("r") === r && col("pos") === p
    }.reduce(_ || _)
    spark.read.parquet(s"$path/_bloom_index")
      .filter(cond)
      .groupBy("file").agg(count(lit(1)).as("n"))
      .filter(col("n") === k)
      .select("file").collect().map(_.getString(0)).toSeq
  }

  /** Point read with bloom skipping: only files whose bloom matches
    * are handed to the reader, then the exact predicate runs as the
    * residual filter — semantically identical to the full read. */
  def readBloomPruned(spark: SparkSession, path: String, column: String,
                      value: String, mBits: Int = 4096,
                      k: Int = 4): DataFrame = {
    val survivors = bloomSurvivors(spark, path, value, mBits, k)
    val base =
      if (survivors.isEmpty) spark.read.parquet(path).limit(0)
      else spark.read.parquet(survivors: _*)
    base.filter(col(column).cast("string") === lit(value))
  }

  /** Bucketed table write: rows hash-bucketed (and sorted) by
    * `bucketCol` into `numBuckets` files per partition. Two tables
    * bucketed the same way join WITHOUT a shuffle — the co-located
    * join layout for repeated fact-fact joins at scale. Requires a
    * catalog table (`saveAsTable`); bucket metadata lives in the
    * catalog. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** OPTIMIZE planning — the step BEFORE a compaction rewrite: given
    * a day-partitioned event layout, bin adjacent days into
    * compaction groups of ~`targetRows` rows each (contiguous
    * binning via exclusive prefix sum — preserves time-locality, so
    * a compacted file still zone-map-prunes on ts). Emits per day:
    * row count, assigned bin, bin totals — the work list a rewrite
    * job executes one bin at a time.
    *
    * Scale: per-day counts are one map-side combined shuffle whose
    * key space is the PARTITION count (metadata-sized — days, not
    * rows); the prefix-sum window runs over that same tiny frame.
    * All integer arithmetic. */
  def compactionPlan(events: DataFrame,
                     targetRows: Long = 100000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(targetRows > 0, "targetRows must be positive")
    val dayUs = 86400000000L
    val perDay = events
      .select((col("ts") - pmod(col("ts"), lit(dayUs))).as("day_us"))
      .groupBy("day_us").agg(count(lit(1)).as("n_rows"))
    val wc = Window.orderBy("day_us")
      .rowsBetween(Window.unboundedPreceding, -1)
    val binned = perDay
      .withColumn("__cum_excl",
        coalesce(sum(col("n_rows")).over(wc), lit(0L)))
      .withColumn("bin_id", expr(s"__cum_excl div $targetRows"))
      .drop("__cum_excl")
    val wb = Window.partitionBy("bin_id")
    binned
      .withColumn("bin_rows", sum(col("n_rows")).over(wb))
      .withColumn("bin_parts", count(lit(1)).over(wb))
  }
}
