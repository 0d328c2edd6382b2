package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

class MixtureSpec extends SparkSpec {

  /** Synthetic corpus: `n` docs per source of `tokensPerDoc` tokens
    * each — source masses are exactly n·tokensPerDoc. */
  private def corpus(sources: Seq[(String, Int, Int)]): DataFrame = {
    import spark.implicits._
    sources.flatMap { case (src, nDocs, tokensPerDoc) =>
      (0 until nDocs).map { i =>
        (s"$src-$i".hashCode.toLong.abs * 100000L + i,
          Seq.fill(tokensPerDoc)("tok").mkString(" "), src)
      }
    }.toDF("doc_id", "text", "source")
  }

  private def fitMap(df: DataFrame): Map[String, (Long, Long, Long)] =
    df.collect().map(r => r.getAs[String]("source") ->
      ((r.getAs[Long]("m_tokens"), r.getAs[Long]("cap_tokens"),
        r.getAs[Long]("alloc_tokens")))).toMap

  test("fit: uncapped waterline splits the budget by floor-sqrt weight") {
    // masses 400/100 → weights 20/10; budget 90 → λ = 3
    val d = corpus(Seq(("big", 4, 100), ("small", 1, 100)))
    val f = fitMap(Mixture.tokenBudgetFit(d, budgetTokens = 90L,
      maxEpochsPct = 400L))
    assert(f("big") == ((400L, 1600L, 60L)))
    assert(f("small") == ((100L, 400L, 30L)))
  }

  test("fit: a saturated source's surplus is redistributed") {
    // masses 400/16 → weights 20/4, caps (100%) 400/16.
    // r: small = 4, big = 20. Budget 120: λ₁ = 120/24 = 5 ≥ 4 →
    // small saturates at its FULL mass 16; remaining 104 → λ = 5.2
    // → big gets 104 (not the unconstrained 100) — surplus moved.
    val d = corpus(Seq(("big", 4, 100), ("small", 1, 16)))
    val f = fitMap(Mixture.tokenBudgetFit(d, budgetTokens = 120L,
      maxEpochsPct = 100L))
    assert(f("small") == ((16L, 16L, 16L)), "small source saturates")
    assert(f("big") == ((400L, 400L, 104L)),
      "surplus from the capped source flows to the uncapped one")
  }

  test("fit: budget beyond every cap saturates everything (null waterline)") {
    val d = corpus(Seq(("a", 2, 50), ("b", 1, 30)))
    val f = fitMap(Mixture.tokenBudgetFit(d, budgetTokens = 1000000L,
      maxEpochsPct = 200L))
    assert(f("a") == ((100L, 200L, 200L)))
    assert(f("b") == ((30L, 60L, 60L)))
  }

  test("fit: zero budget allocates zero") {
    val d = corpus(Seq(("a", 2, 50), ("b", 1, 30)))
    val f = fitMap(Mixture.tokenBudgetFit(d, 0L, 100L))
    assert(f.values.forall(_._3 == 0L))
  }

  test("fit: feasible allocation lands within |sources| of the budget") {
    val d = tables.documents
    val budget = 10000L
    val f = Mixture.tokenBudgetFit(d, budget, maxEpochsPct = 100L)
    val total = f.agg(sum("alloc_tokens")).collect()(0).getLong(0)
    val n = f.count()
    assert(total <= budget && total > budget - n,
      s"sum alloc $total must sit in (budget - $n, budget]")
  }

  test("budgetSample: realized mass overshoots each allocation by " +
    "less than one document") {
    val d = corpus(Seq(("a", 30, 10), ("b", 20, 7), ("c", 5, 50)))
    val fit = fitMap(Mixture.tokenBudgetFit(d, 300L, 100L))
    val got = Mixture.budgetSample(d, 300L)
      .groupBy("source").agg(sum("n_tokens").as("got"))
      .collect().map(r => r.getAs[String]("source") ->
        r.getAs[Long]("got")).toMap
    for ((src, (_, _, alloc)) <- fit) {
      val g = got.getOrElse(src, 0L)
      val perDoc = Map("a" -> 10L, "b" -> 7L, "c" -> 50L)(src)
      assert(g < alloc + perDoc && (g >= alloc || g == fit(src)._1),
        s"$src: realized $g vs alloc $alloc (doc size $perDoc)")
    }
  }

  test("budgetSample: bucket refinement reproduces the direct " +
    "per-source window cumsum at every bucket width") {
    val d = tables.documents
    val budget = 3000L
    val wide = Mixture.budgetSample(d, budget, bucketBits = 12)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // 2 bits → 4 buckets: boundary bucket holds ~1/4 of each source,
    // the refinement window does real work; 1 bit → 2 buckets
    for (bits <- Seq(1, 2, 6)) {
      val narrow = Mixture.budgetSample(d, budget, bucketBits = bits)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(narrow == wide,
        s"bucketBits=$bits must select the identical document set")
    }
  }

  test("mixtureCurve: every rung equals the single-budget fit, and " +
    "the saturated flag is exact") {
    val d = tables.documents
    val budgets = Seq(2000L, 8000L, 1000000L)
    val curve = Mixture.mixtureCurve(d, budgets, maxEpochsPct = 200L)
      .collect()
    val alloc = curve.map(r => (r.getAs[Long]("budget_tokens"),
      r.getAs[String]("source")) -> r.getAs[Long]("alloc_tokens")).toMap
    for (b <- budgets) {
      val fit = fitMap(Mixture.tokenBudgetFit(d, b, 200L))
      for ((src, (_, _, a)) <- fit)
        assert(alloc((b, src)) == a, s"budget $b source $src")
    }
    // beyond-every-cap rung (NULL waterline): everything saturated
    assert(curve.filter(_.getAs[Long]("budget_tokens") == 1000000L)
      .forall(_.getAs[Boolean]("saturated")))
    assert(curve.filter(_.getAs[Long]("budget_tokens") == 2000L)
      .exists(!_.getAs[Boolean]("saturated")))
  }

  test("epochExpand: full copies + fractional prefix hit the allocation " +
    "within one boundary document per source") {
    val d = corpus(Seq(("a", 4, 10), ("b", 3, 20)))
    // masses 40/60; generous caps so the waterline splits by weight
    val fit = fitMap(Mixture.tokenBudgetFit(d, 150L, 400L))
    val got = Mixture.epochExpand(d, 150L, 400L)
    val bySrc = got.groupBy("source").agg(sum("n_tokens").as("mass"))
      .collect().map(r => r.getAs[String]("source") ->
        r.getAs[Long]("mass")).toMap
    val perDoc = Map("a" -> 10L, "b" -> 20L)
    for ((src, (_, _, alloc)) <- fit) {
      val m = bySrc.getOrElse(src, 0L)
      assert(m >= alloc && m < alloc + perDoc(src),
        s"$src: realized $m vs alloc $alloc")
    }
    // every doc appears exactly full or full+1 times, epochs 0-based
    // contiguous
    val counts = got.groupBy("doc_id", "source").count()
      .join(got.groupBy("doc_id").agg(max("epoch").as("maxe"),
        min("epoch").as("mine")), "doc_id")
      .collect()
    for (r <- counts) {
      val n = r.getAs[Long]("count")
      assert(r.getAs[Long]("mine") == 0L)
      assert(r.getAs[Long]("maxe") == n - 1, "epochs are 0..n-1")
      val (mTok, _, alloc) = fit(r.getAs[String]("source"))
      val full = alloc / mTok
      assert(n == full || n == full + 1,
        s"doc ${r.getAs[Long]("doc_id")} appears $n times, full=$full")
    }
  }

  test("epochExpand at 100% epoch cap degenerates to budgetSample " +
    "with every epoch zero") {
    val d = tables.documents
    val budget = 3000L
    val exp = Mixture.epochExpand(d, budget, maxEpochsPct = 100L)
    assert(exp.agg(max("epoch")).collect()(0).getLong(0) == 0L)
    val expIds = exp.select("doc_id").collect().map(_.getLong(0)).toSet
    val sampIds = Mixture.budgetSample(d, budget)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(expIds == sampIds,
      "sub-epoch expansion selects exactly the budgetSample document set")
  }

  test("mixtureManifest: offsets tile the token stream exactly and " +
    "seq ids follow the context-window arithmetic") {
    val d = tables.documents
    // budget ~1.9× the sf0.001 corpus mass: most sources carry a
    // full epoch plus a fractional one — repeats guaranteed
    val man = Mixture.mixtureManifest(d, budgetTokens = 50000L,
      maxEpochsPct = 300L, seqTokens = 512L).collect()
      .sortBy(_.getAs[Long]("token_start"))
    assert(man.nonEmpty)
    assert(man.head.getAs[Long]("token_start") == 0L)
    man.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("token_start") ==
        a.getAs[Long]("token_start") + a.getAs[Long]("n_tokens"),
        "offsets are gap-free and overlap-free — an exact tiling")
      case _ => ()
    }
    assert(man.forall(r => r.getAs[Long]("seq_id") ==
      r.getAs[Long]("token_start") / 512L))
    // repeats of the same doc are decorrelated in the stream: some
    // doc's later epoch lands EARLIER than another doc's epoch 0
    val byDoc = man.groupBy(r => r.getAs[Long]("doc_id"))
    val multi = byDoc.values.filter(_.length > 1)
    assert(multi.nonEmpty, "the 20k/300% budget must upsample someone")
    val e0max = man.filter(_.getAs[Long]("epoch") == 0L)
      .map(_.getAs[Long]("token_start")).max
    val e1min = man.filter(_.getAs[Long]("epoch") > 0L)
      .map(_.getAs[Long]("token_start")).min
    assert(e1min < e0max, "epochs interleave rather than concatenate")
  }

  test("writeManifestShards: shard read is partition-pruned and " +
    "content-exact vs the in-memory manifest") {
    val d = tables.documents
    val path = java.nio.file.Files
      .createTempDirectory("graft_mshards").toFile.getPath + "/m"
    Mixture.writeManifestShards(d, path, budgetTokens = 50000L,
      maxEpochsPct = 300L, seqTokens = 2048L, seqsPerShard = 8L)
    val read = spark.read.parquet(path).filter(col("shard") === 1)
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("shard"),
      "one-shard read must prune at the partition level")
    val expect = Mixture.mixtureManifest(d, 50000L, 300L, 2048L)
      .filter(expr("seq_id div 8") === 1)
      .select("doc_id", "epoch", "token_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = read.select("doc_id", "epoch", "token_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect && got.nonEmpty,
      "layout prunes but never changes content")
  }

  test("budgetSample: kept set is append-stable under corpus growth " +
    "for untouched allocations") {
    // fixing the allocation fixes the kept set prefix: growing a
    // DIFFERENT source does not disturb a source whose allocation
    // is unchanged — here both runs allocate everything (budget ≥
    // total), so every original doc stays kept
    val small = corpus(Seq(("a", 10, 10), ("b", 10, 10)))
    val grown = corpus(Seq(("a", 10, 10), ("b", 10, 10), ("c", 10, 10)))
    val keptSmall = Mixture.budgetSample(small, 100000L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val keptGrown = Mixture.budgetSample(grown, 100000L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptSmall.subsetOf(keptGrown))
  }

  test("contextLenFit: hand-computed fit/chunk/truncation ledger") {
    import spark.implicits._
    // docs of 3, 5 and 8 whitespace tokens
    val docs = Seq((1L, "a b c", "s"), (2L, "a b c d e", "s"),
        (3L, "a b c d e f g h", "s"))
      .toDF("doc_id", "text", "source")
    val out = Mixture.contextLenFit(docs, ctxLens = Seq(4, 8)).collect()
      .map(r => r.getAs[Long]("ctx_len") -> r).toMap
    val at4 = out(4L)
    assert(at4.getAs[Long]("n_docs") == 3L)
    assert(at4.getAs[Long]("n_fit") == 1L, "only the 3-token doc fits")
    assert(at4.getAs[Long]("fit_ppm") == 333333L)
    // chunks: ceil(3/4)+ceil(5/4)+ceil(8/4) = 1+2+2
    assert(at4.getAs[Long]("n_chunks") == 5L)
    assert(at4.getAs[Long]("tokens_total") == 16L)
    // truncation keeps min(tok,4): 3+4+4
    assert(at4.getAs[Long]("tokens_kept_trunc") == 11L)
    assert(at4.getAs[Long]("trunc_loss_ppm") == 312500L)
    val at8 = out(8L)
    assert(at8.getAs[Long]("n_fit") == 3L &&
      at8.getAs[Long]("fit_ppm") == 1000000L)
    assert(at8.getAs[Long]("n_chunks") == 3L)
    assert(at8.getAs[Long]("trunc_loss_ppm") == 0L)
  }
}
