package graft

/** GLOBAL plan invariants over the representative query set (the
  * same list graft.Explain dumps to PLANS.md): properties every graft
  * plan must hold at any scale, asserted in one sweep so a NEW query
  * can't quietly ship a scale-killer the per-operator plan tests
  * never look at.
  *
  * - no `CartesianProduct` anywhere (a data×data nested loop is never
  *   acceptable; broadcast nested-loop of a scalar/tiny frame is);
  * - no `InMemoryTableScan` (operators return declarative plans —
  *   caching is the caller's decision, and persisted intermediates
  *   break exchange reuse and pin executor memory);
  * - at most 2 `Exchange SinglePartition` per plan (the two-phase
  *   rank/offset pattern funnels a TINY count frame through one;
  *   profile_diff diffs two |columns|-row frames — anything beyond
  *   that is a full-data global sort/fold hiding in the plan);
  * - no single-partition range sort (`rangepartitioning(..., 1)`),
  *   the classic accidental `orderBy` on an unpartitioned frame.
  *
  * Streaming lifecycle queries execute side effects when built, so —
  * like Explain — the sweep covers the batch/declarative registry
  * surface.
  */
class PlanInvariantsSpec extends SparkSpec {

  private lazy val swept
      : Map[String, (org.apache.spark.sql.types.StructType, String)] = {
    // suites share one session and Spark's cache manager substitutes
    // ANY suite's persisted fragment into matching plans — clear it so
    // the sweep asserts the queries' OWN plans, not a concurrent
    // suite's cache (unpersisted frames rebuild lazily; harmless)
    spark.catalog.clearCache()
    Explain.names.map { n =>
      val df = Queries.queries(n)(spark, sfDir)
      n -> ((df.schema, df.queryExecution.executedPlan.toString))
    }.toMap
  }
  private lazy val plans: Map[String, String] =
    swept.view.mapValues(_._2).toMap

  test("registry invariants: unique names, total oracle coverage, " +
    "SparkEntry maps aligned") {
    val names = Queries.all.map(_.name)
    assert(names.distinct.size == names.size, {
      val dup = names.groupBy(identity).filter(_._2.size > 1).keys
      s"duplicate registry names: ${dup.mkString(", ")}"
    })
    // the driver's hash gate only covers queries that declare an
    // oracle — a Q without one silently downgrades to rows-only
    val noOracle = Queries.all.filter(_.oracle.isEmpty).map(_.name)
    assert(noOracle.isEmpty,
      s"queries without a DuckDB oracle: ${noOracle.mkString(", ")}")
    assert(SparkEntry.queries.keySet == SparkEntry.oracleSql.keySet &&
      SparkEntry.queries.keySet == names.toSet,
      "SparkEntry.queries / oracleSql / Queries.all disagree")
    // every Explain sweep name must exist in the registry
    val ghost = Explain.names.filterNot(names.contains)
    assert(ghost.isEmpty, s"Explain names not in registry: $ghost")
  }

  test("no published schema carries decimal(38,0)") {
    // decimal128(38,0) output columns hash reader-dependently in the
    // driver's canonicalizer (int vs Decimal rendering) — the r8 gate
    // failed 13 queries on exactly this. Internal arithmetic may (and
    // should) use decimal(38,0); the REGISTRY must publish digit
    // strings instead (Queries.pubDec38AsString). The streaming twins
    // are covered by the same census in tools/check.py over the
    // Verify result parquets.
    import org.apache.spark.sql.types.DecimalType
    val bad = swept.toSeq.flatMap { case (n, (schema, _)) =>
      val dec = schema.fields.filter(_.dataType == DecimalType(38, 0))
      if (dec.isEmpty) None
      else Some(s"$n: ${dec.map(_.name).mkString(",")}")
    }
    assert(bad.isEmpty,
      s"decimal(38,0) published by: ${bad.mkString("; ")}")
  }

  test("no representative plan contains a cartesian product") {
    val bad = plans.filter(_._2.contains("CartesianProduct")).keys
    assert(bad.isEmpty, s"cartesian products in: ${bad.mkString(", ")}")
  }

  test("no representative plan reads a cached intermediate") {
    val bad = plans.filter(_._2.contains("InMemoryTableScan")).keys
    assert(bad.isEmpty, s"cached intermediates in: ${bad.mkString(", ")}")
  }

  test("single-partition exchanges stay on tiny frames (<=2 per plan)") {
    val bad = plans.filter { case (_, p) =>
      "Exchange SinglePartition".r.findAllIn(p).size > 2
    }.keys
    assert(bad.isEmpty, s"global funnels in: ${bad.mkString(", ")}")
  }

  test("no plan sorts through one range partition") {
    val bad = plans.filter { case (_, p) =>
      "rangepartitioning\\([^)]*, 1\\)".r.findFirstIn(p).isDefined
    }.keys
    assert(bad.isEmpty,
      s"single-partition range sorts in: ${bad.mkString(", ")}")
  }
}
