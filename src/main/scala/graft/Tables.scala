package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided testdata tables (see TESTDATA.md).
  *
  * One parquet file per table under `dir`. All graft queries read through
  * here so that scans stay declarative (column pruning + filter pushdown
  * reach the parquet reader via Catalyst).
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  /** `events.ts` has shipped in two physical encodings across testdata
    * generations: parquet TIMESTAMP(NANOS) (read as LongType epoch-nanos
    * via the legacy `nanosAsLong` conf, since the vectorized reader
    * rejects nanos) and parquet TIMESTAMP(MICROS, isAdjustedToUTC=false)
    * (read natively as TIMESTAMP_NTZ). Branch on the dtype Spark actually
    * read and canonicalize both to a LongType of epoch-MICROseconds —
    * Spark's native timestamp precision, and what DuckDB's parquet reader
    * keeps (`epoch_us(ts)`), so oracle comparisons are exact. The session
    * timezone is pinned to UTC in every entry point, so the NTZ→timestamp
    * cast below is an exact reinterpretation. */
  def events: DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t("events")
    val tsMicros = raw.schema("ts").dataType match {
      case LongType => expr("ts div 1000") // epoch-nanos → micros
      case TimestampNTZType | TimestampType => unix_micros(col("ts").cast(TimestampType))
      case other => throw new IllegalStateException(
        s"events.ts: unexpected parquet-read type $other (expected INT64 nanos or TIMESTAMP)")
    }
    raw.withColumn("ts", tsMicros)
  }

  /** events with `ts` as a proper TimestampType column (µs). */
  def eventsTimestamped: DataFrame =
    events.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
      org.apache.spark.sql.functions.col("ts")))
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {
  /** Names of all testdata tables, for view registration helpers. */
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")
}
