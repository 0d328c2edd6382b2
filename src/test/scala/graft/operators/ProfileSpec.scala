package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {

  private def rowFor(df: org.apache.spark.sql.DataFrame, name: String) =
    df.filter(col("col_name") === name).collect().head

  test("profile reports rows/nulls/distincts and typed min-max") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(2.5), Some("b")),
      (2L, None, Some("a")),
      (3L, Some(7.0), None),
      (4L, Some(2.5), Some("a"))).toDF("id", "v", "s")
    val prof = Profile.tableProfile(df)
    assert(prof.count() == 3)
    val id = rowFor(prof, "id")
    assert(id.getAs[Long]("n_rows") == 4 && id.getAs[Long]("n_nulls") == 0)
    assert(id.getAs[Long]("n_distinct") == 4)
    assert(id.getAs[Double]("min_num") == 1.0 &&
      id.getAs[Double]("max_num") == 4.0)
    assert(id.isNullAt(id.fieldIndex("min_str")))
    val v = rowFor(prof, "v")
    // nulls counted but excluded from distinct/min/max
    assert(v.getAs[Long]("n_nulls") == 1 && v.getAs[Long]("n_distinct") == 2)
    assert(v.getAs[Double]("min_num") == 2.5 &&
      v.getAs[Double]("max_num") == 7.0)
    val s = rowFor(prof, "s")
    assert(s.getAs[String]("min_str") == "a" &&
      s.getAs[String]("max_str") == "b")
    assert(s.isNullAt(s.fieldIndex("min_num")))
  }

  test("single scan: profile plan reads the source exactly once") {
    val prof = Profile.tableProfile(tables.events)
    // count source relations in the optimized plan (the executed plan
    // hides them inside the adaptive wrapper until materialization)
    val scans = prof.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation => l
    }
    assert(scans.size == 1)
  }

  test("approx profile agrees on everything but distinct estimates") {
    val exact = Profile.tableProfile(tables.events)
      .drop("n_distinct").collect().toSet
    val approx = Profile.tableProfileApprox(tables.events)
      .drop("n_distinct").collect().toSet
    assert(exact == approx)
    // HLL estimates stay within a loose multiple of the default 5% rsd
    val ed = Profile.tableProfile(tables.events)
      .select("col_name", "n_distinct").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Profile.tableProfileApprox(tables.events)
      .select("col_name", "n_distinct").collect().foreach { r =>
        val e = ed(r.getString(0)).toDouble
        assert(math.abs(r.getLong(1) - e) <= math.max(4.0, 0.15 * e))
      }
  }

  test("chi2Independence: perfect association scores χ²=n across all " +
    "cells, independence scores 0, empty cells included") {
    import spark.implicits._
    // perfectly dependent 2×2 (a follows b): φ² = 1 so Σχ²-cell = n
    val dep = Seq(("a1", "b1"), ("a1", "b1"), ("a2", "b2"), ("a2", "b2"))
      .toDF("x", "y")
    val depOut = Profile.chi2Independence(dep, "x", "y").collect()
    assert(depOut.length == 4, "unobserved cells must be present")
    assert(depOut.count(_.getAs[Long]("observed") == 0L) == 2)
    assert(depOut.forall(_.getAs[Double]("cell_chi2") == 1.0))
    assert(math.abs(depOut.map(_.getAs[Double]("cell_chi2")).sum - 4.0)
      < 1e-12)
    // fully independent 2×2: every deviation is exactly zero
    val ind = Seq(("a1", "b1"), ("a1", "b2"), ("a2", "b1"), ("a2", "b2"))
      .toDF("x", "y")
    val indOut = Profile.chi2Independence(ind, "x", "y").collect()
    assert(indOut.length == 4)
    assert(indOut.forall(r => r.getAs[Double]("cell_chi2") == 0.0 &&
      r.getAs[java.math.BigDecimal]("dev_num").signum == 0 &&
      !r.getAs[Boolean]("dependent_99")))
  }

  test("profileDiff classifies added/removed/common and quantifies drift") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val prev = Seq((1L, 10.0, "a"), (2L, 20.0, "b"), (3L, 30.0, "c"))
      .toDF("id", "v", "tag")
    val cur = Seq[(Long, java.lang.Double, Boolean)](
      (1L, 10.0, true), (2L, 99.0, true), (4L, null, false))
      .toDF("id", "v", "flag")
    val out = Profile.profileDiff(prev, cur).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("tag").getString(1) == "removed")
    assert(out("flag").getString(1) == "added")
    assert(out("id").getString(1) == "common")
    // v: one new null of 3 rows; max rose 30 → 99
    val v = out("v")
    assert(math.abs(v.getDouble(8) - 1.0 / 3.0) < 1e-12)
    assert(v.getBoolean(9))
    // id range shrank on max but min extended? 1..3 → 1..4: widened
    assert(out("id").getBoolean(9))
    // added/removed rows carry NULL drift metrics
    assert(out("tag").isNullAt(8) && out("flag").isNullAt(8))
  }

  test("tCloseness: hand-computed TVD, absent-value tail, NULL value") {
    import spark.implicits._
    // p: 3×x + 1×y, r: 2×x. Global: x 5/6, y 1/6.
    //   tvd(p) = ½(|3/4−5/6| + |1/4−1/6|) = 1/12
    //   tvd(r) = ½(|1−5/6| + 1/6)         = 1/6   (y absent from r)
    val df = Seq(("p", "x"), ("p", "x"), ("p", "x"), ("p", "y"),
      ("r", "x"), ("r", "x")).toDF("qi", "s")
    val out = Profile.tCloseness(df, Seq("qi"), "s", t = 0.1)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("p").getAs[Long]("group_size") == 4)
    assert(math.abs(out("p").getAs[Double]("tvd") - 1.0 / 12.0) < 1e-15)
    assert(!out("p").getAs[Boolean]("at_risk"))
    assert(out("r").getAs[Long]("group_size") == 2)
    assert(math.abs(out("r").getAs[Double]("tvd") - 1.0 / 6.0) < 1e-15)
    assert(out("r").getAs[Boolean]("at_risk"))
    // NULL is its own sensitive value and keeps its global count
    // through the null-safe join: both groups hold 1×x + 1×NULL,
    // mirroring the global (x ½, NULL ½) mix → tvd exactly 0; a
    // null-dropping join would lose the NULL rows and report ¼
    val dfn = Seq(("a", "x"), ("a", null), ("b", "x"), ("b", null))
      .toDF("qi", "s")
    val outN = Profile.tCloseness(dfn, Seq("qi"), "s", t = 0.1)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(outN("a").getAs[Double]("tvd") == 0.0)
    assert(outN("b").getAs[Double]("tvd") == 0.0)
    assert(outN("a").getAs[Long]("group_size") == 2)
  }

  test("tCloseness: a uniform group matches the global distribution") {
    import spark.implicits._
    // every group mirrors the global mix exactly → tvd 0, none at risk
    val df = Seq.tabulate(30) { i =>
      (s"g${i % 3}", if (i % 5 == 0) "a" else "b")
    }.toDF("qi", "s")
    val out = Profile.tCloseness(df, Seq("qi"), "s").collect()
    assert(out.length == 3)
    assert(out.forall(r => r.getAs[Double]("tvd") == 0.0))
    assert(out.forall(r => !r.getAs[Boolean]("at_risk")))
  }

  test("anonymizeGeneralize picks the smallest level that reaches k") {
    import spark.implicits._
    // 20 customers in 2 nations, balances spread so that level 0
    // (nation × 100-bucket) has singleton groups but level 1
    // (nation × 1000-bucket) reaches k=10: nation 0 all in [0,1000),
    // nation 7 all in [2000,3000), 100-buckets all distinct
    val df = (0 until 20).map { i =>
      val nat = if (i < 10) 0 else 7
      val bal = if (i < 10) i * 100.0 + 1 else 2000.0 + (i - 10) * 100 + 1
      (i.toLong, nat, bal)
    }.toDF("c_custkey", "c_nationkey", "c_acctbal")
    val out = Profile.anonymizeGeneralize(df, k = 10L).collect()
    assert(out.length == 20)
    assert(out.forall(_.getAs[Int]("gen_level") == 1))
    // level 1 keeps the exact nation and releases the 1000-bucket
    val r0 = out.find(_.getAs[Long]("c_custkey") == 0L).get
    assert(r0.getAs[String]("qi_nation") == "0" &&
      r0.getAs[String]("qi_acctbal") == "0")
    val r19 = out.find(_.getAs[Long]("c_custkey") == 19L).get
    assert(r19.getAs[String]("qi_nation") == "7" &&
      r19.getAs[String]("qi_acctbal") == "2000")
  }

  test("anonymizeGeneralize escalates to nation bands and suppression") {
    import spark.implicits._
    // nations 0..9, 1 customer each, balances in one 1000-bucket:
    // levels 0-1 are singletons; level 2 bands nations 0-4 / 5-9 into
    // groups of 5 — still < k=6 … level 3 same bands without balance
    // is the same 5s … level 4 suppresses everything
    val df = (0 until 10).map(i => (i.toLong, i, 500.0))
      .toDF("c_custkey", "c_nationkey", "c_acctbal")
    val out = Profile.anonymizeGeneralize(df, k = 6L).collect()
    assert(out.forall(_.getAs[Int]("gen_level") == 4))
    assert(out.forall(r => r.getAs[String]("qi_nation") == "*" &&
      r.getAs[String]("qi_acctbal") == "*"))
    // k=5 is satisfied at level 2: nation bands with the shared bucket
    val out5 = Profile.anonymizeGeneralize(df, k = 5L).collect()
    assert(out5.forall(_.getAs[Int]("gen_level") == 2))
    assert(out5.map(_.getAs[String]("qi_nation")).toSet ==
      Set("0-4", "5-9"))
    assert(out5.forall(_.getAs[String]("qi_acctbal") == "0"))
  }

  test("anonymizeGeneralize: negative balances keep exact bucket strings") {
    import spark.implicits._
    val df = (0 until 12).map(i => (i.toLong, 3, -994.28))
      .toDF("c_custkey", "c_nationkey", "c_acctbal")
    val out = Profile.anonymizeGeneralize(df, k = 10L).collect()
    // one nation, one 100-bucket → level 0 already holds 12 >= 10
    assert(out.forall(_.getAs[Int]("gen_level") == 0))
    assert(out.forall(_.getAs[String]("qi_acctbal") == "-1000"))
  }

  test("lDiversity flags homogeneous groups; NULL counts as a value") {
    import spark.implicits._
    // group a: 3 rows, 1 sensitive value → at risk even though big;
    // group b: 2 rows, 2 values → diverse; group c: value + NULL →
    // NULL is its own observable value → 2 values, not at risk
    val df = Seq(
      ("a", "x"), ("a", "x"), ("a", "x"),
      ("b", "x"), ("b", "y"),
      ("c", "x"), ("c", null)).toDF("qi", "s")
    val out = Profile.lDiversity(df, Seq("qi"), "s", l = 2L)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getAs[Long]("group_size") == 3 &&
      out("a").getAs[Long]("n_sensitive_values") == 1 &&
      out("a").getAs[Boolean]("at_risk"))
    assert(out("b").getAs[Long]("n_sensitive_values") == 2 &&
      !out("b").getAs[Boolean]("at_risk"))
    assert(out("c").getAs[Long]("group_size") == 2 &&
      out("c").getAs[Long]("n_sensitive_values") == 2 &&
      !out("c").getAs[Boolean]("at_risk"))
  }

  test("groupedMoments: hand-computed power sums, variance, and skew sign") {
    import spark.implicits._
    // group g: token counts 1, 2, 3 → n=3 s1=6 s2=14 s3=36,
    // var_num = 3·14 − 36 = 6, var = 6/9, third-moment num = 0
    val d = Seq((1L, "a", "g"), (2L, "a b", "g"), (3L, "a b c", "g"))
      .toDF("doc_id", "text", "source")
    val r = Profile.groupedMoments(d, "source").collect().head
    assert(r.getAs[Long]("n") == 3L && r.getAs[Long]("s1") == 6L &&
      r.getAs[Long]("s2") == 14L && r.getAs[Long]("s3") == 36L)
    // var_num ships as decimal(38,0) since r8 (long wrapped ~10^24)
    assert(r.getAs[java.math.BigDecimal]("var_num").longValueExact == 6L)
    assert(r.getAs[Double]("var_tokens") == 6.0 / 9.0)
    assert(r.getAs[Long]("skew_sign") == 0L)
  }

  test("datasetFingerprint: order-independent, row-sensitive, " +
    "duplicate-aware") {
    import spark.implicits._
    val docs = Seq((1L, "a b c", "s1"), (2L, "d e", "s1"),
      (3L, "f", "s2")).toDF("doc_id", "text", "source")
    def fp(df: org.apache.spark.sql.DataFrame) =
      Profile.datasetFingerprint(df).collect()
        .map(r => r.getAs[String]("source") ->
          ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
            r.getAs[java.math.BigDecimal]("content_sum"),
            r.getAs[Long]("n_distinct_rows")))).toMap
    val base = fp(docs)
    assert(base("s1")._1 == 2 && base("s1")._2 == 5)
    // any row order / partitioning re-derives the identical checksum
    val shuffled = fp(docs.orderBy(org.apache.spark.sql.functions
      .col("text").desc).repartition(7))
    assert(shuffled == base)
    // one changed row moves the checksum but not the counts
    val mutated = fp(Seq((1L, "a b x", "s1"), (2L, "d e", "s1"),
      (3L, "f", "s2")).toDF("doc_id", "text", "source"))
    assert(mutated("s1")._1 == base("s1")._1 &&
      mutated("s1")._3.compareTo(base("s1")._3) != 0)
    assert(mutated("s2") == base("s2"))
    // an exact duplicated row shows as n_docs > n_distinct_rows
    val dup = fp(docs.unionAll(Seq((1L, "a b c", "s1"))
      .toDF("doc_id", "text", "source")))
    assert(dup("s1")._1 == 3 && dup("s1")._4 == 2)
  }

  test("rawFingerprint shards merge to the one-shot fingerprint mass") {
    val docs = tables.documents
    val h1 = docs.filter(col("doc_id") % 2 === 0)
    val h2 = docs.filter(col("doc_id") % 2 =!= 0)
    val merged = Profile.mergeFingerprint(
      Profile.rawFingerprint(h1).unionByName(Profile.rawFingerprint(h2)))
    val direct = Profile.datasetFingerprint(docs)
      .select("source", "n_docs", "n_tokens", "content_sum")
    assert(merged.exceptAll(direct).isEmpty &&
      direct.exceptAll(merged).isEmpty)
  }

  test("deriveMoments survives numerators past the 63-bit wrap " +
    "(n~10^6 docs of ~100 tokens: n^2*s3 ~ 10^24)") {
    import spark.implicits._
    // skew numerator = 1.05e24 - 3.06e24 + 2e24 = -1e22 < 0; long
    // arithmetic wraps n^2*s3 alone and emits a garbage sign
    val sums = Seq(("g", 1000000L, 100000000L, 10200000000L,
      1050000000000L)).toDF("source", "n", "s1", "s2", "s3")
    val r = Profile.deriveMoments(sums, "source").collect().head
    assert(r.getAs[Long]("skew_sign") == -1L)
    assert(r.getAs[java.math.BigDecimal]("var_num")
      .compareTo(new java.math.BigDecimal("200000000000000")) == 0)
    assert(math.abs(r.getAs[Double]("var_tokens") - 2e14 / 1e12) < 1e-9)
  }

  test("groupedMoments: shard moments merge to the global answer") {
    val docs = tables.documents
    val half1 = docs.filter(col("doc_id") % 2 === 0)
    val half2 = docs.filter(col("doc_id") % 2 =!= 0)
    val merged = Profile.groupedMoments(half1, "source")
      .select("source", "n", "s1", "s2", "s3")
      .unionByName(Profile.groupedMoments(half2, "source")
        .select("source", "n", "s1", "s2", "s3"))
      .groupBy("source").agg(sum("n").as("n"), sum("s1").as("s1"),
        sum("s2").as("s2"), sum("s3").as("s3"))
    val direct = Profile.groupedMoments(docs, "source")
      .select("source", "n", "s1", "s2", "s3")
    assert(merged.exceptAll(direct).count() == 0 &&
      direct.exceptAll(merged).count() == 0)
  }

  test("histQuantiles: every bracket contains the true order statistic") {
    val ev = tables.events
    val got = Profile.histQuantiles(
      Profile.histShard(ev), "event_type").collect()
    // exact k-th order statistic per (type, q) by local sort
    val byType = ev.select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).map { case (t, vs) => t -> vs.map(_._2).sorted }
    assert(got.nonEmpty)
    for (r <- got) {
      val vs = byType(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n") == vs.length)
      val k = r.getAs[Long]("k").toInt
      val exact = vs(k - 1)
      val lo = r.getAs[Double]("bin_lo")
      assert(exact >= lo && exact < lo + 4.0,
        s"q=${r.getAs[Long]("q_ppm")}: exact $exact outside [$lo, ${lo + 4.0})")
    }
  }

  test("histShard: shards merge to the one-shot histogram on any split") {
    val ev = tables.events
    val parts = (0L until 3L).map(i =>
      Profile.histShard(ev.filter(col("event_id") % 3 === i)))
    val merged = Profile.mergeHist(
      parts.reduce(_ unionByName _), "event_type")
    val direct = Profile.histShard(ev)
    assert(merged.exceptAll(direct).count() == 0 &&
      direct.exceptAll(merged).count() == 0)
    // and the quantile readout off the merged shards is identical
    val qm = Profile.histQuantiles(merged, "event_type")
    val qd = Profile.histQuantiles(direct, "event_type")
    assert(qm.exceptAll(qd).count() == 0 && qd.exceptAll(qm).count() == 0)
  }

  test("histShard rejects a non-power-of-two width") {
    intercept[IllegalArgumentException] {
      Profile.histShard(tables.events, width = 3.0)
    }
    // q ladder bounds enforced
    intercept[IllegalArgumentException] {
      Profile.histQuantiles(Profile.histShard(tables.events),
        "event_type", qPpm = Seq(0L))
    }
  }

  test("histQuantiles: q_ppm = 1000000 lands in each group's last " +
    "occupied bin") {
    val ev = tables.events
    val got = Profile.histQuantiles(Profile.histShard(ev),
      "event_type", qPpm = Seq(1000000L)).collect()
    val maxBin = ev.select(col("event_type"),
      floor(col("value") / 4.0).cast("long").as("b"))
      .groupBy("event_type").agg(max("b").as("mb")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty)
    for (r <- got)
      assert(r.getAs[Long]("bin") == maxBin(r.getAs[String]("event_type")))
  }

  test("columnCorr: exact signs on planted linear relations, null on zero variance") {
    import spark.implicits._
    // y = 2x (corr +1), z = -x (corr -1), w constant (undefined)
    val d = Seq((1.0, 2.0, -1.0, 5.0), (2.0, 4.0, -2.0, 5.0),
        (3.0, 6.0, -3.0, 5.0), (4.0, 8.0, -4.0, 5.0))
      .toDF("x", "y", "z", "w")
    val out = Profile.columnCorr(d, Seq("x", "y", "z", "w")).collect()
      .map(r => (r.getAs[String]("col_x"), r.getAs[String]("col_y")) -> r)
      .toMap
    assert(out.size == 6, "C(4,2) pairs")
    assert(math.abs(out(("x", "y")).getAs[Double]("corr") - 1.0) < 1e-12)
    assert(math.abs(out(("x", "z")).getAs[Double]("corr") + 1.0) < 1e-12)
    assert(math.abs(out(("y", "z")).getAs[Double]("corr") + 1.0) < 1e-12)
    // zero-variance column: corr is honestly NULL, never NaN/Inf
    for (p <- Seq(("x", "w"), ("y", "w"), ("z", "w")))
      assert(out(p).isNullAt(out(p).fieldIndex("corr")))
  }

  test("columnCorr fixes values to exact cents before summing") {
    import spark.implicits._
    // 0.07 and 0.1 are classic float-unrepresentable decimals: the
    // cents fixing must land on integer cents, not float neighbors
    val d = Seq((0.07, 0.1), (0.07, 0.2), (0.14, 0.3))
      .toDF("a", "b")
    val r = Profile.columnCorr(d, Seq("a", "b")).collect().head
    assert(r.getAs[Long]("n") == 3L)
    assert(r.getAs[java.math.BigDecimal]("sum_x").longValueExact == 28L,
      "7 + 7 + 14 cents")
    assert(r.getAs[java.math.BigDecimal]("sum_y").longValueExact == 60L)
    assert(r.getAs[java.math.BigDecimal]("sum_x2").longValueExact ==
      49L + 49L + 196L)
    assert(r.getAs[java.math.BigDecimal]("sum_xy").longValueExact ==
      70L + 140L + 420L)
  }
}
