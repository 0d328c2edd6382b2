package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Declarative multi-stage pipeline runner — Spark-native
  * re-expression of the reference's DLT pipeline surface: a LIVE
  * TABLE graph with per-table EXPECT constraints (reference
  * `4  Delta Live Tables (SQL).sql`:20-123) whose run emits an event
  * log that per-flow expectation-metrics queries can read (reference
  * `3 Delta Live Tables Setup.py`:134-152).
  *
  * Each stage's output is materialized as a [[VersionedTable]] under
  * `storageDir/<stage>` (like DLT materializing LIVE tables, with
  * history + time travel for free), and the next stage reads the
  * materialized parquet — so a K-stage pipeline scans its input once
  * per stage, never K·(K−1)/2 times from recursive lazy plans. The
  * event log is a tiny driver-side frame (constraints × stages rows),
  * exactly like DLT's runtime-emitted log.
  */
object Pipeline {

  /** ON VIOLATION handling for a stage's expectation suite. */
  sealed trait OnViolation
  object OnViolation {
    /** record metrics only (plain EXPECT) */
    case object Keep extends OnViolation
    /** EXPECT ... ON VIOLATION DROP ROW */
    case object DropRows extends OnViolation
    /** EXPECT ... ON VIOLATION FAIL UPDATE */
    case object Fail extends OnViolation
  }

  final case class Stage(
    name: String,
    transform: DataFrame => DataFrame,
    expectations: Seq[Expectation] = Nil,
    onViolation: OnViolation = OnViolation.Keep)

  final case class RunResult(
    /** stage name → its materialized table (latest version) */
    tables: Map[String, DataFrame],
    /** (stage_seq, flow_name, constraint_name, passed_records,
      * failed_records) — one row per constraint per stage */
    eventLog: DataFrame)

  val EventLogSchema: StructType = StructType(Seq(
    StructField("stage_seq", IntegerType, nullable = false),
    StructField("flow_name", StringType, nullable = false),
    StructField("constraint_name", StringType, nullable = false),
    StructField("passed_records", LongType, nullable = false),
    StructField("failed_records", LongType, nullable = false)))

  /** Run the stage chain over `input`, materializing each stage and
    * recording expectation metrics. Metrics are evaluated on the
    * stage's transform output BEFORE drop-row filtering (DLT counts
    * candidate rows, then drops). */
  def run(spark: SparkSession, input: DataFrame, stages: Seq[Stage],
          storageDir: String): RunResult = {
    require(stages.nonEmpty, "pipeline needs at least one stage")
    require(stages.map(_.name).distinct.size == stages.size,
      "stage names must be unique")
    val logRows = scala.collection.mutable.ArrayBuffer[Row]()
    var cur = input
    val outTables = stages.zipWithIndex.map { case (st, i) =>
      // stages with expectations take two actions over the candidate
      // (metrics scan + versioned write) — persist so the transform is
      // computed once, not once per action
      val candidate =
        if (st.expectations.nonEmpty)
          st.transform(cur).persist(
            org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        else st.transform(cur)
      if (st.expectations.nonEmpty) {
        val m = Expectations.metrics(candidate, st.expectations).collect()
        m.foreach { r =>
          logRows += Row(i, st.name, r.getString(0), r.getLong(1),
            r.getLong(2))
        }
        // Fail mode reuses the already-collected counters — no second
        // metrics scan of the stage input
        if (st.onViolation == OnViolation.Fail) {
          val bad = m.filter(_.getLong(2) > 0)
          if (bad.nonEmpty) {
            val detail = bad
              .map(r => s"${r.getString(0)}: ${r.getLong(2)} failed")
              .mkString("; ")
            throw new ExpectationViolation(
              s"expectations violated in stage ${st.name} — $detail")
          }
        }
      }
      val out = st.onViolation match {
        case OnViolation.DropRows =>
          Expectations.dropInvalid(candidate, st.expectations)
        case _ => candidate
      }
      val path = s"$storageDir/${st.name}"
      VersionedTable.write(out, path, operation = s"PIPELINE[${st.name}]")
      if (st.expectations.nonEmpty) candidate.unpersist()
      cur = VersionedTable.read(spark, path)
      st.name -> cur
    }.toMap
    val log = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(logRows.toSeq).asJava), EventLogSchema)
    RunResult(outTables, log)
  }
}
