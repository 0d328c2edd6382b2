package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` surface, following the standard pattern
  * for Spark extension libraries (a sub-package of
  * `org.apache.spark.sql` sees `private[sql]` members).
  *
  * Used for: wrapping custom Catalyst Expressions as Columns, and
  * runtime function registration on sessions created without
  * `spark.sql.extensions` (e.g. by an external driver).
  */
object GraftBridge {

  def column(e: Expression): Column = ExpressionUtils.column(e)

  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a named Expression-backed SQL function on a live session
    * (idempotent). */
  def registerFunction(spark: SparkSession, name: String, usage: String,
                       builder: Seq[Expression] => Expression): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    val id = FunctionIdentifier(name)
    if (!registry.functionExists(id)) {
      registry.registerFunction(id,
        new ExpressionInfo("graft", name, usage), builder)
    }
  }

  /** Register a named TABLE function (`SELECT * FROM fn(...)`) on a
    * live session (idempotent). */
  def registerTableFunction(
      spark: SparkSession, name: String, usage: String,
      builder: Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.tableFunctionRegistry
    val id = FunctionIdentifier(name)
    if (!registry.functionExists(id)) {
      registry.registerFunction(id,
        new ExpressionInfo("graft", name, usage), builder)
    }
  }

  /** Wrap a (resolved) logical plan as a DataFrame — the entry point
    * a custom whole-operator node needs (Dataset.ofRows is
    * private[sql]). */
  def dataset(spark: SparkSession,
              plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The logical plan behind a DataFrame (for table-function bodies). */
  def logicalPlan(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.logical

  /** The ANALYZED plan behind a DataFrame — resolved expressions with
    * evaluable literals (Dataset.queryExecution is private[sql]). */
  def analyzedPlan(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed
}
