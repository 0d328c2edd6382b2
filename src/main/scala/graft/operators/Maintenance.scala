package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

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

  /** Hive-partitioned write: one directory per `partitionCol` value —
    * reads filtered on it prune whole directories. */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)

  /** Read-back helper for verifying clustering/pruning behavior. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

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
}
