package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from
  * codegen'd `functions._` higher-order functions (no UDFs).
  *
  * All math is promoted to double BEFORE accumulation and folds run
  * sequentially left-to-right, which makes results bit-identical to
  * DuckDB's `list_dot_product(a::DOUBLE[], b::DOUBLE[])` — required
  * for oracle hash-matching (SURVEY §4).
  */
object VectorFunctions {

  /** Poor-man's LET binding: evaluates `value` exactly once per row and
    * exposes it to `body` as a bound lambda variable.
    *
    * Why: higher-order functions run interpreted (no whole-stage
    * codegen, no common-subexpression elimination inside lambdas), so a
    * Column referenced N times inside a lambda is re-COMPUTED N times.
    * Binding through `aggregate`'s initial-value + finish lambda makes
    * it a cheap variable reference instead — turns O(N·cost) plans
    * into O(cost). */
  def bind(value: Column, body: Column => Column): Column =
    aggregate(array(lit(0)), value, (acc, _) => acc, body)

  /** element-wise promote `array<float>` → `array<double>`. */
  def toDoubleArray(v: Column): Column = transform(v, _.cast("double"))

  /** sequential-fold dot product in double precision — native codegen
    * kernel (same element order + promotion as the HOF fold it
    * replaces, so results are unchanged bit-for-bit). */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.GraftBridge.column(
      graft.functions.expressions.FloatDotProduct(
        org.apache.spark.sql.graft.GraftBridge.expression(a),
        org.apache.spark.sql.graft.GraftBridge.expression(b)))

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** cosine similarity; 0 for zero-norm inputs. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = l2Norm(a) * l2Norm(b)
    when(n === 0.0, lit(0.0)).otherwise(d / n)
  }
}
