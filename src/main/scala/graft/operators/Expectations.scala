package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — Spark-native re-expression
  * of DLT `CONSTRAINT ... EXPECT (...) [ON VIOLATION DROP ROW |
  * FAIL UPDATE]` (reference: `4  Delta Live Tables (SQL).sql`:102-123
  * and the expectation-metrics queries in `3 Delta Live Tables
  * Setup.py`:134-152).
  *
  * Predicates are SQL strings so suites serialize/log cleanly.
  * `metrics` computes ALL constraint counters in ONE pass over the
  * data (conditional aggregation) — at 100 TB you never want one scan
  * per constraint.
  */
final case class Expectation(name: String, predicateSql: String)

class ExpectationViolation(msg: String) extends RuntimeException(msg)

object Expectations {

  /** One row per constraint: (constraint_name, passed_records,
    * failed_records). Single aggregation pass, then an explode of the
    * packed counters (driver-free). NULL predicate results count as
    * failures, matching DLT. */
  def metrics(df: DataFrame, exps: Seq[Expectation]): DataFrame = {
    // coalesce: sum over zero rows is NULL — report 0/0 on an empty
    // input instead (DLT metric semantics)
    val counters = exps.zipWithIndex.flatMap { case (e, i) =>
      Seq(coalesce(sum(when(expr(e.predicateSql), 1L).otherwise(0L)), lit(0L))
          .as(s"p_$i"),
        coalesce(sum(when(expr(e.predicateSql), 0L).otherwise(1L)), lit(0L))
          .as(s"f_$i"))
    }
    val agg = df.agg(counters.head, counters.tail: _*)
    val packed = array(exps.zipWithIndex.map { case (e, i) =>
      struct(lit(e.name).as("constraint_name"),
        col(s"p_$i").as("passed_records"),
        col(s"f_$i").as("failed_records"))
    }: _*)
    agg.select(explode(packed).as("m")).select("m.*")
  }

  /** ON VIOLATION DROP ROW: keep only rows passing every constraint. */
  def dropInvalid(df: DataFrame, exps: Seq[Expectation]): DataFrame =
    df.filter(exps.map(e => expr(e.predicateSql)).reduce(_ && _))

  /** Rows violating ≥1 constraint (quarantine surface) — the exact
    * complement of [[dropInvalid]]: a NULL predicate counts as a
    * violation (matching `metrics`), so the row lands here rather
    * than vanishing from both outputs. */
  def quarantine(df: DataFrame, exps: Seq[Expectation]): DataFrame =
    df.filter(!coalesce(
      exps.map(e => expr(e.predicateSql)).reduce(_ && _), lit(false)))

  /** ON VIOLATION FAIL UPDATE: throw if any constraint has failures. */
  def failOnViolation(df: DataFrame, exps: Seq[Expectation]): Unit = {
    val bad = metrics(df, exps).filter(col("failed_records") > 0)
      .collect()
    if (bad.nonEmpty) {
      val detail = bad.map(r => s"${r.getString(0)}: ${r.getLong(2)} failed")
        .mkString("; ")
      throw new ExpectationViolation(s"expectations violated — $detail")
    }
  }

  /** The demo suite used by the `expectations*` queries (≈ the
    * reference's length/state constraints, on `events`). */
  val EventSuite: Seq[Expectation] = Seq(
    Expectation("value is non-negative", "value >= 0"),
    Expectation("value within sane bound", "value <= 400"),
    Expectation("event_type is known",
      "event_type in ('click','view','purchase','signup','error')"),
    Expectation("no error events", "event_type <> 'error'"),
    Expectation("user present", "user_id is not null"))
}
