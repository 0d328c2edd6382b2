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

  /** element-wise promote `array<float>` → `array<double>`. */
  def toDoubleArray(v: Column): Column = transform(v, _.cast("double"))

  /** sequential-fold dot product in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(toDoubleArray(a), toDoubleArray(b), _ * _),
      lit(0.0), _ + _)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** cosine similarity; 0 for zero-norm inputs. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = l2Norm(a) * l2Norm(b)
    when(n === 0.0, lit(0.0)).otherwise(d / n)
  }

  /** 32-bit murmur3 of `v` with permutation index `i` mixed in —
    * the hash family used for MinHash signatures. */
  def permutedHash(v: Column, i: Column): Column = hash(v, i)
}
