package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.graft.GraftBridge
import graft.functions.expressions.{FloatDotProduct, HyperplaneProjections, HyperplaneSignatures, LshBandHashes, MinHashSignature, Sha60, SimHashChunks}

/** SparkSessionExtensions entry point: makes graft's native kernels
  * available as SQL functions. Activate with
  * `spark.sql.extensions=graft.GraftExtensions`, or call
  * [[GraftFunctions.ensureRegistered]] on a live session (for sessions
  * created without the conf).
  *
  * SQL surface:
  *  - `graft_dot(array<float>, array<float>) → double`
  *  - `graft_minhash(array<string>) → array<long>` (64 perms)
  *  - `graft_simhash(array<string>) → array<int>` (4 × 15-bit chunks)
  *  - `graft_hyperplanes(array<float>, dim, bits, tables) → array<int>`
  *  - `graft_sha60(string) → bigint` (the portable content hash)
  *  - `graft_lsh_bands(array<long>, bands, rowsPerBand) → array<long>`
  *  - `graft_project(array<float>, dim, outDim) → array<double>` (JL)
  *
  * TABLE functions (`SELECT * FROM fn(...)`):
  *  - `graft_history('<path>')` — versioned-table commit log
  *  - `graft_changes('<path>', from, to)` — CDF feed in SQL
  *  - `graft_version('<path>', v)` — versioned-table snapshot
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.specs.foreach { case (name, usage, builder) =>
      ext.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          "graft", name, usage),
        builder))
    }
    GraftFunctions.tableSpecs.foreach { case (name, usage, builder) =>
      ext.injectTableFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          "graft", name, usage),
        builder))
    }
    // SQL DML (DELETE/UPDATE/MERGE INTO) over graft catalog tables →
    // the format's file-granular verbs (Delta's interception point)
    ext.injectPostHocResolutionRule(session =>
      graft.plans.GraftDmlRule(session))
    // declarative HOF dot products get the native kernel automatically
    ext.injectOptimizerRule(_ =>
      graft.functions.expressions.NativeDotRewrite)
    // opt-in binned range-join rewrite (spark.graft.rangeJoin.bucketWidth)
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
    // opt-in exact→HLL distinct-count rewrite (spark.graft.approxDistinct.rsd)
    ext.injectOptimizerRule(_ => graft.plans.ApproxDistinctRewrite)
    // native as-of join physical operator (AsofJoin logical node)
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
  }
}

object GraftFunctions {
  import org.apache.spark.sql.catalyst.expressions.Expression

  val specs: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("graft_dot", "graft_dot(a, b) - double dot product of two float arrays",
      (es: Seq[Expression]) => FloatDotProduct(es(0), es(1))),
    ("graft_minhash", "graft_minhash(shingles) - 64-perm MinHash signature",
      (es: Seq[Expression]) => MinHashSignature(es(0), 64)),
    ("graft_simhash", "graft_simhash(tokens) - SimHash as 4x15-bit chunks",
      (es: Seq[Expression]) => SimHashChunks(es(0))),
    ("graft_hyperplanes",
      "graft_hyperplanes(emb, dim, bits, tables) - multi-table hyperplane LSH signatures",
      (es: Seq[Expression]) => HyperplaneSignatures(es(0),
        litInt(es(1), "dim", "graft_hyperplanes"),
        litInt(es(2), "bits", "graft_hyperplanes"),
        litInt(es(3), "tables", "graft_hyperplanes"))),
    ("graft_sha60",
      "graft_sha60(s) - portable 60-bit content hash (sha256 prefix)",
      (es: Seq[Expression]) => Sha60(es(0))),
    ("graft_lsh_bands",
      "graft_lsh_bands(sig, bands, rowsPerBand) - banded-LSH band hashes",
      (es: Seq[Expression]) => LshBandHashes(es(0),
        litInt(es(1), "bands", "graft_lsh_bands"),
        litInt(es(2), "rowsPerBand", "graft_lsh_bands"))),
    ("graft_project",
      "graft_project(emb, dim, outDim) - JL random projection over the hyperplane grid",
      (es: Seq[Expression]) => HyperplaneProjections(es(0),
        litInt(es(1), "dim", "graft_project"),
        litInt(es(2), "outDim", "graft_project"))))

  /** Shape parameters must be integer literals — they size the
    * precomputed component table baked into the plan. */
  private def litInt(e: Expression, what: String, fn: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $what must be an integer literal, got $other")
  }

  /** TABLE functions (`SELECT * FROM fn(...)`). */
  val tableSpecs: Seq[(String, String,
      Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)] =
    graft.functions.GraftTableFunctions.specs

  /** Idempotent runtime registration (sessions created without
    * `spark.sql.extensions`). */
  def ensureRegistered(spark: SparkSession): Unit = {
    specs.foreach { case (name, usage, builder) =>
      GraftBridge.registerFunction(spark, name, usage, builder)
    }
    tableSpecs.foreach { case (name, usage, builder) =>
      GraftBridge.registerTableFunction(spark, name, usage, builder)
    }
  }
}
