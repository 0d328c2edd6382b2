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
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects ([PARQUET_TYPE_ILLEGAL]). Read it as a LongType of
    * epoch-nanoseconds (runtime-settable legacy conf) and canonicalize
    * to epoch-MICROseconds — Spark's native timestamp precision, and
    * what DuckDB's parquet reader keeps (`epoch_us(ts)`), so oracle
    * comparisons are exact. */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t("events").withColumn("ts", org.apache.spark.sql.functions.expr("ts div 1000"))
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
