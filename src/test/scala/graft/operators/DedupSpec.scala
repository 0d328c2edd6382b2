package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  private def docsWithCopies = {
    val docs = tables.documents
    // duplicate the first 20 docs under shifted ids
    docs.unionByName(docs.filter(col("doc_id") < 20)
      .withColumn("doc_id", col("doc_id") + 10000))
  }

  test("exact dedup groups identical texts and keeps the min doc_id") {
    val out = Dedup.exact(docsWithCopies)
    val dups = out.filter(col("n_copies") >= 2)
    // at least the 20 injected copies group (identical text may also
    // occur naturally)
    assert(dups.count() >= 20)
    assert(dups.filter(col("keep_doc_id") >= 10000).count() == 0)
  }

  test("minhash LSH finds injected exact duplicates with jaccard 1.0") {
    val pairs = Dedup.minhashLsh(docsWithCopies, threshold = 0.9)
      .filter(col("id_b") >= 10000 && col("id_a") === col("id_b") - 10000)
    assert(pairs.count() == 20)
    assert(pairs.filter(col("jaccard") =!= 1.0).count() == 0)
  }

  test("minhash signature is deterministic and numPerm wide") {
    val sig = tables.documents.limit(5).select(
      Dedup.minhashSignature(Dedup.shingles(col("text"), 3), 64).as("sig"))
    val a = sig.collect().map(_.getSeq[Long](0))
    val b = sig.collect().map(_.getSeq[Long](0))
    assert(a.zip(b).forall { case (x, y) => x == y })
    assert(a.forall(_.length == 64))
  }

  test("simhash pairs include injected duplicates at hamming 0") {
    val pairs = Dedup.simhashPairs(docsWithCopies, maxHamming = 0)
      .filter(col("id_b") >= 10000 && col("id_a") === col("id_b") - 10000)
    assert(pairs.count() == 20)
  }

  test("embedding near-dup emits symmetric-free ordered pairs above threshold") {
    val out = Dedup.embeddingNearDup(tables.embeddings, threshold = 0.3)
    assert(out.filter(col("id_a") >= col("id_b")).count() == 0)
    assert(out.filter(col("cosine") < 0.3).count() == 0)
  }

  test("contamination flags injected benchmark copies at full coverage") {
    val docs = tables.documents
    val bench = docs.filter(col("doc_id") < 5)
    // train corpus contains exact copies of the benchmark under new ids
    val train = docs.unionByName(
      bench.withColumn("doc_id", col("doc_id") + 50000))
    val out = Dedup.contamination(train, bench)
    val copies = out.filter(col("train_doc") >= 50000 &&
      col("train_doc") === col("bench_doc") + 50000).collect()
    assert(copies.length == 5)
    assert(copies.forall(_.getAs[Double]("contamination") == 1.0))
    // self-pairs are excluded; fractions are in (0, 1]
    assert(out.filter(col("train_doc") === col("bench_doc")).count() == 0)
    assert(out.filter(col("contamination") > 1.0 ||
      col("contamination") <= 0.0).count() == 0)
  }

  test("quantizer-blocked near-dup is sound and finds injected duplicates") {
    val emb = tables.embeddings
    // inject exact duplicates of the first 10 vectors under offset ids
    val withDups = emb.unionByName(emb.filter(col("vec_id") < 10)
      .withColumn("vec_id", col("vec_id") + 100000))
    val blocked = Dedup.embeddingNearDupQuantized(withDups, threshold = 0.3)
    // identical vectors quantize to the same cell — every injected
    // duplicate pair MUST be found (the blocking guarantee that
    // matters for dedup: true near-dups co-locate)
    val injected = blocked
      .filter(col("id_b") >= 100000 && col("id_a") === col("id_b") - 100000)
    assert(injected.count() == 10)
    // no false positives: every emitted pair really has cosine >= t
    assert(blocked.filter(col("cosine") < 0.3).count() == 0)
    assert(blocked.filter(col("id_a") >= col("id_b")).count() == 0)
    // and every emitted pair is in the brute-force truth set (the
    // blocked set prunes, never invents)
    val a = withDups.select(col("vec_id").as("id_a"), col("embedding").as("ea"))
    val b = withDups.select(col("vec_id").as("id_b"), col("embedding").as("eb"))
    val truth = a.join(b, col("id_a") < col("id_b"))
      .withColumn("c", graft.functions.VectorFunctions.cosine(col("ea"), col("eb")))
      .filter(col("c") >= 0.3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = blocked.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSet.subsetOf(truth))
    // deterministic (sampled training + decimal means)
    val again = Dedup.embeddingNearDupQuantized(withDups, threshold = 0.3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.sorted.toSeq == again.sorted.toSeq)
  }

  test("ngramContainment: exact duplicates score 1.0 both ways") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "zeta eta theta iota kappa")).toDF("doc_id", "text")
    val out = Dedup.ngramContainment(docs).collect()
    // identical texts → identical signatures → guaranteed candidate
    val dup = out.find(r => r.getAs[Long]("id_a") == 1L &&
      r.getAs[Long]("id_b") == 2L)
    assert(dup.isDefined)
    assert(dup.get.getAs[Double]("containment_a") == 1.0)
    assert(dup.get.getAs[Double]("containment_b") == 1.0)
    // containment is bounded and consistent with the shared count
    out.foreach { r =>
      assert(r.getAs[Double]("containment_a") > 0.0 &&
        r.getAs[Double]("containment_a") <= 1.0)
      assert(r.getAs[Double]("containment_b") > 0.0 &&
        r.getAs[Double]("containment_b") <= 1.0)
    }
  }

  test("semdedupKeep: drops exactly the ids with a lower-id in-cell neighbor") {
    val out = Dedup.semdedupKeep(tables.embeddings, threshold = 0.35)
    val pairs = Dedup.embeddingNearDupQuantized(tables.embeddings,
      threshold = 0.35)
    val expectDropped = pairs.select(col("id_b")).distinct()
      .collect().map(_.getLong(0)).toSet
    val dropped = out.filter(!col("kept"))
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(dropped == expectDropped)
    // every vector appears exactly once, cluster carried through
    assert(out.count() == tables.embeddings.count())
    assert(out.select("vec_id").distinct().count() == out.count())
  }

  test("incremental index: delta dedups against base, append extends the index") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_lshidx").toString
    val base = tables.documents.filter(col("doc_id") < 400)
    // delta1 copies two base docs under new ids; delta2 copies a
    // delta1 doc — only findable AFTER delta1 is appended
    val delta1 = tables.documents.filter(col("doc_id").isin(0L, 1L))
      .withColumn("doc_id", col("doc_id") + 20000)
    val delta2 = tables.documents.filter(col("doc_id") === 0L)
      .withColumn("doc_id", col("doc_id") + 30000)

    Dedup.buildLshIndex(base, dir)
    val hits1 = Dedup.dedupAgainstIndex(delta1, dir, threshold = 0.9)
    val exact1 = hits1.filter(col("est_jaccard") === 1.0)
      .select("base_id", "delta_id").as[(Long, Long)].collect().toSet
    assert(exact1.contains((0L, 20000L)) && exact1.contains((1L, 20001L)))

    // before append: delta2's twin (20000) is not indexed
    assert(Dedup.dedupAgainstIndex(delta2, dir, threshold = 0.9)
      .filter(col("base_id") === 20000L).count() == 0)
    Dedup.buildLshIndex(delta1, dir, append = true)
    val hits2 = Dedup.dedupAgainstIndex(delta2, dir, threshold = 0.9)
    assert(hits2.filter(col("base_id") === 20000L &&
      col("delta_id") === 30000L).count() == 1)
    // estimate is a valid equal-fraction in [0, 1]
    hits2.collect().foreach { r =>
      val e = r.getAs[Double]("est_jaccard")
      assert(e >= 0.9 && e <= 1.0)
    }
  }

  test("semdedupRate aggregates the keep flags exactly") {
    val keep = Dedup.semdedupKeep(tables.embeddings,
      cacheKey = Some("rate-spec"))
    val rate = Dedup.semdedupRate(tables.embeddings,
      cacheKey = Some("rate-spec"))
    val tot = rate.agg(sum("n_vectors"), sum("n_kept")).head
    assert(tot.getLong(0) === tables.embeddings.count())
    assert(tot.getLong(1) === keep.filter(col("kept")).count())
    assert(rate.filter(col("pruned_frac") < 0.0 ||
      col("pruned_frac") > 1.0 ||
      col("n_kept") + col("n_pruned") =!= col("n_vectors")).count() === 0)
  }

  test("incremental index: re-appending indexed ids is a no-op") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_lshidx_guard").toString
    val base = tables.documents.filter(col("doc_id") < 100)
    val delta = tables.documents.filter(col("doc_id") === 0L)
      .withColumn("doc_id", col("doc_id") + 20000)
    Dedup.buildLshIndex(base, dir)
    Dedup.buildLshIndex(delta, dir, append = true)
    val sigs1 = spark.read.parquet(s"$dir/sigs").count()
    val bands1 = spark.read.parquet(s"$dir/bands").count()
    // a retried/duplicate append of already-indexed ids must not
    // duplicate signature or band rows (probes would double-count)
    Dedup.buildLshIndex(delta, dir, append = true)
    assert(spark.read.parquet(s"$dir/sigs").count() === sigs1)
    assert(spark.read.parquet(s"$dir/bands").count() === bands1)
    // and the probe surface stays exact: one hit, once
    val probe = tables.documents.filter(col("doc_id") === 0L)
      .withColumn("doc_id", col("doc_id") + 30000)
    assert(Dedup.dedupAgainstIndex(probe, dir, threshold = 0.9)
      .filter(col("base_id") === 20000L).count() === 1)
  }

  test("index probe reads only the delta's band buckets (partition pruning)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_lshidx_prune").toString
    Dedup.buildLshIndex(tables.documents.filter(col("doc_id") < 400), dir)
    val delta = tables.documents.filter(col("doc_id") === 0L)
      .withColumn("doc_id", col("doc_id") + 20000)
    val plan = Dedup.dedupAgainstIndex(delta, dir)
      .queryExecution.executedPlan.toString
    val bandScan = plan.linesIterator.find(l =>
      l.contains("PartitionFilters") && l.contains("bucket"))
    assert(bandScan.isDefined, s"band scan not partition-pruned:\n$plan")
  }

  test("hot LSH buckets are skipped before the collect, not after") {
    import spark.implicits._
    // 200 identical docs (one degenerate bucket per band) + one
    // honest near-dup pair; cap=50 must drop ONLY the hot family
    val degenerate = (0L until 200L).map(i => (i, "w1 w2 w3 w4 w5 w6 w7 w8"))
    val honest = Seq(
      (1000L, "alpha beta gamma delta epsilon zeta eta theta"),
      (1001L, "alpha beta gamma delta epsilon zeta eta iota"))
    val docs = (degenerate ++ honest).toDF("doc_id", "text")
    val signed = docs.select(col("doc_id"),
      Dedup.minhashSignature(Dedup.shingles(col("text"), 3), 64).as("sig"))
    val banded = Dedup.lshBands(signed, "doc_id", "sig", 16, 4)
    val capped = Dedup.lshCandidates(banded, "doc_id", maxBucket = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((1000L, 1001L)),
      s"expected only the honest pair, got ${capped.size} pairs")
    // default cap doesn't bind on honest buckets
    val uncapped = Dedup.lshCandidates(banded, "doc_id")
      .filter(col("id_a") === 1000L).count()
    assert(uncapped == 1)
  }

  test("duplicateSpans merges shared k-gram runs into maximal spans") {
    import spark.implicits._
    // docs 1 and 2 share tokens s0..s7 (an 8-token run); with k=3 that
    // is positions 0..5 in doc 1 → one island, span 0..7
    val shared = "s0 s1 s2 s3 s4 s5 s6 s7"
    val docs = Seq(
      (1L, shared + " u1 u2 u3 u4"),
      (2L, "v1 v2 " + shared),
      (3L, "w1 w2 w3 w4 w5 w6 w7 w8 w9"))
      .toDF("doc_id", "text")
    val out = Dedup.duplicateSpans(docs, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // doc 1: island at gram positions 0..5 → tokens 0..7, 8 tokens
    assert(out.contains((1L, 0L, 7L, 8L, 6L)))
    // doc 2: same run shifted by its 2-token prefix
    assert(out.contains((2L, 2L, 9L, 8L, 6L)))
    // doc 3 shares nothing — no span rows
    assert(!out.exists(_._1 == 3L))
    assert(out.length == 2)
  }

  test("duplicateSpans: whole-doc fallback spans cap at the doc's last token") {
    import spark.implicits._
    // 3-token docs with k=6 → whole-doc fallback shingle at pos 0;
    // the reported span must stay inside the doc (0..2, 3 tokens),
    // not the uncapped 0..k-1
    val docs = Seq((1L, "a b c"), (2L, "a b c")).toDF("doc_id", "text")
    val out = Dedup.duplicateSpans(docs, k = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSet == Set((1L, 0L, 2L, 3L), (2L, 0L, 2L, 3L)))
    // and the cut cleans them fully without phantom positions
    val cleaned = Dedup.spanClean(docs, k = 6).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(3))).toMap
    assert(cleaned(1L) == (("", 0L)) && cleaned(2L) == (("", 0L)))
  }

  test("duplicateSpans: intra-doc repetition alone is not a duplicate span") {
    import spark.implicits._
    // the repeated phrase lives in ONE doc only — countDistinct(doc)
    // is 1, so substring dedup must not flag it (that's
    // text_repetition's job)
    val docs = Seq(
      (1L, "p q r p q r p q r"),
      (2L, "x y z x2 y2 z2")).toDF("doc_id", "text")
    assert(Dedup.duplicateSpans(docs, k = 3).count() == 0)
  }

  test("duplicateSpans reports disjoint islands separately") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a1 a2 a3 mid1 mid2 mid3 b1 b2 b3"),
      (2L, "a1 a2 a3 other1 other2 other3 b1 b2 b3"))
      .toDF("doc_id", "text")
    val d1 = Dedup.duplicateSpans(docs, k = 3)
      .filter(col("doc_id") === 1L).orderBy("span_start").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(d1.toSeq == Seq((0L, 2L), (6L, 8L)))
  }

  test("spanClean cuts exactly the duplicated spans and keeps the rest in order") {
    import spark.implicits._
    val shared = "s0 s1 s2 s3 s4 s5 s6 s7"
    val docs = Seq(
      (1L, shared + " u1 u2 u3 u4"),
      (2L, "v1 v2 " + shared),
      (3L, "w1 w2 w3 w4")).toDF("doc_id", "text")
    val out = Dedup.spanClean(docs, k = 3).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out(1L) == (("u1 u2 u3 u4", 12L, 4L)))
    assert(out(2L) == (("v1 v2", 10L, 2L)))
    // untouched docs come back whole
    assert(out(3L) == (("w1 w2 w3 w4", 4L, 4L)))
  }

  test("spanClean: a fully-duplicated doc survives as an empty row") {
    import spark.implicits._
    val t = "a b c d e f"
    val docs = Seq((1L, t), (2L, t)).toDF("doc_id", "text")
    val out = Dedup.spanClean(docs, k = 3).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(3))).toMap
    assert(out.size == 2)
    assert(out(1L) == (("", 0L)) && out(2L) == (("", 0L)))
  }

  test("contaminationFuzzy flags near-copies of benchmark docs, not clean docs") {
    import spark.implicits._
    val bench = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      1L -> bench,                                   // benchmark
      2L -> "lorem ipsum dolor sit amet consectetur",// benchmark, unrelated
      10L -> bench,                                  // verbatim leak
      11L -> (bench + " extra"),                     // lightly edited leak
      12L -> "totally different words here nothing shared at all")
      .toDF("doc_id", "text")
    val out = Dedup.contaminationFuzzy(docs, col("doc_id") < 10L,
      threshold = 0.5)
    val byId = out.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(byId(10L)._1 == 1L && byId(10L)._2 == 1.0) // exact copy: est 1.0
    assert(byId.contains(11L) && byId(11L)._2 >= 0.5)
    assert(!byId.contains(12L))
    // benchmark docs are never reported on the train side
    assert(!byId.contains(1L) && !byId.contains(2L))
  }

  test("contaminationFuzzy counts multiple benchmark hits per train doc") {
    import spark.implicits._
    val t = "one two three four five six seven eight nine ten"
    val docs = Seq(1L -> t, 2L -> t, 10L -> t).toDF("doc_id", "text")
    val out = Dedup.contaminationFuzzy(docs, col("doc_id") < 10L,
      threshold = 0.5).collect()
    assert(out.length == 1)
    assert(out.head.getLong(0) == 10L && out.head.getLong(1) == 2L)
  }

  test("paramSweep: one row per config, dup pairs bounded by candidates, " +
       "finer banding never loses candidates") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_sweep_spec").toString
    val rows = Dedup.paramSweep(docsWithCopies, dir)
      .collect().map(r => r.getInt(0) ->
        (r.getInt(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows.keySet == Set(8, 16, 32))
    rows.foreach { case (b, (r, cand, dups)) =>
      assert(r == 64 / b)
      assert(dups <= cand)
      // the 20 injected verbatim copies collide in EVERY band of any
      // config (identical signatures), so each config reports ≥20
      // surviving pairs
      assert(dups >= 20L, s"config bands=$b found only $dups dup pairs")
    }
    // more, narrower bands = higher collision probability per pair:
    // the candidate set can only grow 8 → 16 → 32 on the SAME corpus
    // (a pair colliding on an 8-row band also collides on both its
    // 4-row halves, and so on down)
    assert(rows(8)._2 <= rows(16)._2 && rows(16)._2 <= rows(32)._2)
  }

  test("thresholdCurve: exact-copy pairs land in the top bin and the " +
       "cumulative column is the suffix sum") {
    val out = Dedup.thresholdCurve(docsWithCopies)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(-_._1)
    // 20 verbatim copies → ≥20 pairs at est_jaccard = 1.0 (ppm 10⁶)
    assert(out.head._1 == 1000000L && out.head._2 >= 20L)
    // n_pairs_at_or_above is the running sum from the top bin down,
    // and the bottom row's cumulative equals the total pair count
    val running = out.scanLeft(0L)(_ + _._2).tail
    out.zip(running).foreach { case ((ppm, _, atOrAbove), cum) =>
      assert(atOrAbove == cum, s"cumulative mismatch at ppm=$ppm")
    }
  }

  test("bloomIngestDedup equals the plain anti-join and drops known copies") {
    val docs = tables.documents
    val base = docs.filter(col("doc_id") % 3 =!= 0)
    // incoming: the real stripe plus verbatim copies of 10 base docs
    // under fresh ids — those MUST be identified as already-present
    val copies = base.filter(col("doc_id") < 30)
      .withColumn("doc_id", col("doc_id") + 20000)
    val incoming = docs.filter(col("doc_id") % 3 === 0).unionByName(copies)
    val out = Dedup.bloomIngestDedup(base, incoming)
    // exactness: identical row set to the unfiltered anti-join
    val sha = (c: org.apache.spark.sql.Column) =>
      org.apache.spark.sql.graft.GraftBridge.column(
        graft.functions.expressions.Sha60(
          org.apache.spark.sql.graft.GraftBridge.expression(c)))
    val expected = incoming
      .select(col("doc_id"), sha(col("text")).as("content_hash"))
      .join(base.select(sha(col("text")).as("content_hash")),
        Seq("content_hash"), "left_anti")
      .select("doc_id", "content_hash")
    assert(out.exceptAll(expected).count() == 0 &&
      expected.exceptAll(out).count() == 0)
    // every injected copy is recognized as a duplicate of the base
    assert(out.filter(col("doc_id") >= 20000).count() == 0)
    // and genuinely new texts survive
    assert(out.count() > 0)
  }

  test("splitLeakageAudit: injected cross-split near-dups are counted " +
    "as leaks") {
    import spark.implicits._
    // find two ids landing in different splits, give them near-dup
    // texts; a third pair within one split must NOT flag
    val split = TextAnalysis.trainValTestSplit(tables.documents)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split"))
    val train = split.filter(_._2 == "train").map(_._1)
    val test = split.filter(_._2 == "test").map(_._1)
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val docs = Seq(
      (train(0), base), (test(0), base + " phi"), // cross-split near-dup
      (train(1), "one two three four five six seven eight nine ten " +
        "eleven twelve thirteen fourteen fifteen sixteen"),
      (train(2), "one two three four five six seven eight nine ten " +
        "eleven twelve thirteen fourteen fifteen seventeen") // intra-train
    ).toDF("doc_id", "text")
    val out = Dedup.splitLeakageAudit(docs)
      .collect().map(r => (r.getAs[String]("split_lo"),
        r.getAs[String]("split_hi")) -> r).toMap
    assert(out(("test", "train")).getAs[Long]("n_pairs") >= 1L &&
      out(("test", "train")).getAs[Boolean]("is_leak"))
    assert(out(("train", "train")).getAs[Long]("n_pairs") >= 1L &&
      !out(("train", "train")).getAs[Boolean]("is_leak"))
  }

  test("splitLeakageFix: kept subset re-audits clean; train never dropped") {
    val docs = tables.documents
    val fixed = Dedup.splitLeakageFix(docs)
    // training docs are never the dropped side
    assert(fixed.filter(col("split") === "train" && !col("kept"))
      .count() == 0)
    // the kept subset has zero cross-split near-dup mass
    val keptDocs = docs.join(fixed.filter(col("kept")).select("doc_id"),
      Seq("doc_id"), "left_semi")
    val reaudit = Dedup.splitLeakageAudit(keptDocs)
      .filter(col("is_leak")).agg(sum("n_pairs")).collect().head
    assert(reaudit.isNullAt(0) || reaudit.getLong(0) == 0L,
      s"cross-split pairs survive the fix: $reaudit")
  }

  test("semdedupCurve: monotone in the cutoff, agrees with semdedupKeep") {
    val curve = Dedup.semdedupCurve(tables.embeddings,
      thresholds = Seq(0.35, 0.5, 0.7, 0.9))
      .collect().map(r => r.getAs[Double]("threshold") -> r).toMap
    // tighter cutoffs fire fewer pairs and drop less
    assert(curve(0.35).getAs[Long]("n_dropped") >=
      curve(0.5).getAs[Long]("n_dropped"))
    assert(curve(0.5).getAs[Long]("n_dropped") >=
      curve(0.9).getAs[Long]("n_dropped"))
    // each point equals the single-threshold keep pass
    val dropAt35 = Dedup.semdedupKeep(tables.embeddings, threshold = 0.35)
      .filter(!org.apache.spark.sql.functions.col("kept")).count()
    assert(curve(0.35).getAs[Long]("n_dropped") == dropAt35)
    assert(curve(0.35).getAs[Long]("n_survivors") ==
      tables.embeddings.count() - dropAt35)
  }

  test("semdedupComponentDrop: pairwise <= component, both within the " +
    "pair graph; clique equality and star strict gap hand-checked") {
    val r = Dedup.semdedupComponentDrop(tables.embeddings, threshold = 0.5)
      .collect().head
    val n = tables.embeddings.count()
    assert(r.getAs[Long]("n_vectors") == n)
    val comp = r.getAs[Long]("n_dropped_component")
    val pw = r.getAs[Long]("n_dropped_pairwise")
    // per component of size k the pairwise rule drops <= k-1 (the
    // component minimum never has a lower-id neighbor), so pairwise
    // <= component always
    assert(pw <= comp, s"pairwise $pw above component $comp")
    assert(comp == r.getAs[Long]("n_in_pairs") -
      r.getAs[Long]("n_components"))
    assert(comp <= r.getAs[Long]("n_in_pairs"))
    assert(r.getAs[Long]("n_survivors_component") == n - comp)
    import spark.implicits._
    // clique {1,2,3} + singleton 4: both semantics drop exactly 2
    val clique = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 0.0f)),
      (3L, Array(1.0f, 0.0f)), (4L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val c = Dedup.semdedupComponentDrop(clique, threshold = 0.9,
      nlist = 1, iters = 1, sampleBudget = 4).collect().head
    assert(c.getAs[Long]("n_dropped_component") == 2L)
    assert(c.getAs[Long]("n_dropped_pairwise") == 2L)
    assert(c.getAs[Long]("n_components") == 1L)
    assert(c.getAs[Long]("n_survivors_component") == 2L)
    // star 1-3, 2-3 WITHOUT 1-2 (leaves orthogonal, center at 45°):
    // pairwise drops only {3} (1 and 2 have no lower-id neighbor),
    // the component prune drops 2 of {1,2,3} — strict gap
    val s2 = (math.sqrt(2.0) / 2).toFloat
    val star = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)),
      (3L, Array(s2, s2)))
      .toDF("vec_id", "embedding")
    val st = Dedup.semdedupComponentDrop(star, threshold = 0.6,
      nlist = 1, iters = 1, sampleBudget = 4).collect().head
    assert(st.getAs[Long]("n_dropped_pairwise") == 1L)
    assert(st.getAs[Long]("n_dropped_component") == 2L)
    assert(st.getAs[Long]("n_components") == 1L)
  }

  test("bloomFppAudit: exact split sizes and the fp contract hold") {
    val r = Dedup.bloomFppAudit(tables.documents).collect().head
    val n = tables.documents.count()
    assert(r.getAs[Long]("n_base") + r.getAs[Long]("n_probes") == n)
    assert(r.getAs[Long]("fpp_configured_ppm") == 30000L)
    assert(r.getAs[Boolean]("fpp_ok"))
  }

  test("nearDupDegrees: twins score degree 1, the loner scores 0") {
    import spark.implicits._
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta", "s"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta", "s"),
      (3L, "one completely different document about nothing else", "s"))
      .toDF("doc_id", "text", "source")
    val out = Dedup.nearDupDegrees(d).collect()
      .map(r => r.getAs[Long]("degree") -> r.getAs[Long]("n_docs")).toMap
    assert(out == Map(1L -> 2L, 0L -> 1L))
  }

  test("nearDupDegrees: handshake identity and full doc mass on real data") {
    val docs = tables.documents.limit(500)
    val hist = Dedup.nearDupDegrees(docs).collect()
    val nDocs = docs.count()
    val nPairs = Dedup.minhashLsh(docs).count()
    assert(hist.map(_.getAs[Long]("n_docs")).sum == nDocs,
      "every document lands in exactly one degree bucket")
    assert(hist.map(r => r.getAs[Long]("degree") *
        r.getAs[Long]("n_docs")).sum == 2L * nPairs,
      "sum of degrees must be twice the pair count (handshake lemma)")
  }
}
