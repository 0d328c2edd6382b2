package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {

  test("tokenCount: ws tokens and bpe tokens consistent with text") {
    val out = TextAnalysis.tokenCount(tables.documents)
    assert(out.count() == 500)
    // texts are space-separated words: ws tokens == bpe tokens (letters only)
    val bad = out.filter(col("n_ws_tokens") =!= col("n_bpe_tokens"))
    assert(bad.count() == 0)
    assert(out.filter(col("n_ws_tokens") <= 0).count() == 0)
  }

  test("quality ratios are within [0,1] and score bounded") {
    val out = TextAnalysis.quality(tables.documents)
    assert(out.filter(col("punct_ratio") < 0 || col("punct_ratio") > 1).count() == 0)
    assert(out.filter(col("stopword_ratio") < 0 || col("stopword_ratio") > 1).count() == 0)
    assert(out.filter(col("quality_score") < 0 || col("quality_score") > 1).count() == 0)
  }

  test("gopherRules: each rule trips on its crafted violator and " +
    "passes on a clean doc") {
    import spark.implicits._
    val good = (Seq("the", "with") ++ Seq.fill(60)("alpha")).mkString(" ")
    val docs = Seq(
      1L -> good,                                  // passes everything
      2L -> "the with short doc",                  // < 50 words
      3L -> (Seq("the", "with") ++                 // mean word len > 10
        Seq.fill(60)("supercalifragilistic")).mkString(" "),
      4L -> (good + " " + Seq.fill(10)("#").mkString(" ")), // symbols
      5L -> (Seq("the", "with") ++                 // 40% numeric words
        Seq.fill(36)("alpha") ++ Seq.fill(26)("123")).mkString(" "),
      6L -> Seq.fill(60)("alpha").mkString(" "),   // no stopwords
      7L -> (good + "\n" + Seq.fill(9)("x...").mkString("\n")), // ellipsis
      8L -> (good + "\n" + Seq.fill(30)("- item").mkString("\n")) // bullets
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Boolean]("pass"))
    def failsOnly(id: Long, rule: String): Unit = {
      assert(!out(id).getAs[Boolean](rule), s"doc $id should fail $rule")
      assert(!out(id).getAs[Boolean]("pass"))
    }
    failsOnly(2L, "r_word_count")
    failsOnly(3L, "r_mean_word_len")
    failsOnly(4L, "r_symbol_ratio")
    failsOnly(5L, "r_alpha_words")
    failsOnly(6L, "r_stopwords")
    failsOnly(7L, "r_ellipsis_lines")
    failsOnly(8L, "r_bullet_lines")
    // the clean doc's counters: 62 words, all alphabetic, 2 stop hits
    assert(out(1L).getAs[Long]("n_words") == 62L &&
      out(1L).getAs[Long]("n_alpha_words") == 62L &&
      out(1L).getAs[Long]("n_stop_hits") == 2L)
  }

  test("packEfficiency: hand-computed boundary crossings and exact " +
    "fill accounting") {
    import spark.implicits._
    // docs of 5, 4, 3 tokens packed at seqTokens=6: starts 0, 5, 9 —
    // doc 2 crosses the seq0/seq1 boundary
    val docs = Seq(
      (1L, "a b c d e"), (2L, "f g h i"), (3L, "j k l"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.packEfficiency(docs, seqTokens = 6L)
      .collect().map(r => r.getAs[Long]("seq_id") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_docs_starting"),
         r.getAs[Long]("n_carried_in"), r.getAs[Long]("tokens_filled")))
      .toMap
    assert(out == Map(
      0L -> ((2L, 2L, 0L, 6L)),
      1L -> ((2L, 1L, 1L, 6L))))
    // conservation on the real corpus: fills sum to the token total,
    // and every non-final sequence is exactly full
    val real = TextAnalysis.packEfficiency(tables.documents).collect()
    val total = TextAnalysis.tokenCount(tables.documents)
      .agg(sum("n_ws_tokens")).head.getLong(0)
    assert(real.map(_.getAs[Long]("tokens_filled")).sum == total)
    val lastSeq = real.map(_.getAs[Long]("seq_id")).max
    assert(real.filter(_.getAs[Long]("seq_id") != lastSeq)
      .forall(_.getAs[Long]("tokens_filled") == 2048L))
  }

  test("qualityCalibration: duplicate pairs and repetitive docs land " +
    "in their score bins with exact floor-ppm rates") {
    import spark.implicits._
    val normal = (Seq("the", "a", "of") ++
      (1 to 60).map(i => s"w$i")).mkString(" ")
    val docs = Seq(
      1L -> normal,                                   // unique, varied
      2L -> "the a of repeated words twice over",     // duplicate pair
      3L -> "the a of repeated words twice over",
      4L -> Seq.fill(80)("spam").mkString(" ")        // repetitive
    ).toDF("doc_id", "text")
    val out = TextAnalysis.qualityCalibration(docs).collect()
    assert(out.map(_.getAs[Long]("n_docs")).sum == 4L)
    assert(out.map(_.getAs[Long]("n_dup")).sum == 2L)
    assert(out.map(_.getAs[Long]("n_repetitive")).sum == 1L)
    // ppm columns are exactly the integer floor of the bin rates
    out.foreach { r =>
      assert(r.getAs[Long]("dup_ppm") ==
        1000000L * r.getAs[Long]("n_dup") / r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("repetitive_ppm") ==
        1000000L * r.getAs[Long]("n_repetitive") / r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("score_bin") >= 0L &&
        r.getAs[Long]("score_bin") <= 9L)
    }
  }

  test("langId predicts a language from the marker set deterministically") {
    val out = TextAnalysis.langId(tables.documents)
    assert(out.count() == 500)
    val langs = out.select("predicted_lang").distinct()
      .collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(TextAnalysis.LangMarkers.map(_._1).toSet))
    // deterministic across runs
    val again = TextAnalysis.langId(tables.documents)
      .select("doc_id", "predicted_lang").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.select("doc_id", "predicted_lang").collect()
      .foreach(r => assert(again(r.getLong(0)) == r.getString(1)))
  }

  test("trainValTestSplit is exhaustive, hash-stable, and near the target ratios") {
    val docs = tables.documents
    val split = TextAnalysis.trainValTestSplit(docs)
    // every document assigned exactly once
    assert(split.count() == docs.count())
    val byCat = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byCat.keySet.subsetOf(Set("train", "val", "test")))
    // the hash is uniform enough that train lands near 80%
    val trainFrac = byCat.getOrElse("train", 0L).toDouble / docs.count()
    assert(trainFrac > 0.6 && trainFrac < 0.95, s"train frac $trainFrac")
    // assignment is a pure function of doc_id — identical across runs
    val again = TextAnalysis.trainValTestSplit(docs)
    assert(split.exceptAll(again).count() == 0)
  }

  test("fingerprints: shared long substrings share a fingerprint") {
    val docs = tables.documents.limit(10)
    val shifted = docs.withColumn("doc_id", col("doc_id") + 5000)
    val fps = TextAnalysis.fingerprints(docs.unionByName(shifted))
    // identical text under two ids → identical fingerprint sets → join hits
    val a = fps.filter(col("doc_id") < 5000).withColumnRenamed("doc_id", "ida")
    val b = fps.filter(col("doc_id") >= 5000).withColumnRenamed("doc_id", "idb")
    val shared = a.join(b, a("fingerprint") === b("fingerprint") &&
      a("ida") === b("idb") - 5000)
    assert(shared.select("ida").distinct().count() == 10)
  }

  test("repetition fractions match hand-computed values") {
    import spark.implicits._
    // "a a a b": 4 words / 2 distinct → dup_word 0.5;
    // bigrams [a a, a a, a b] → 1 dup of 3; trigrams [a a a, a a b] → 0
    val docs = Seq((1L, "a a a b"), (2L, "x y z w")).toDF("doc_id", "text")
    val out = TextAnalysis.repetition(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_tokens") == 4)
    assert(out(1L).getAs[Double]("dup_word_frac") == 0.5)
    assert(out(1L).getAs[Double]("dup_bigram_frac") == 1.0 / 3.0)
    assert(out(1L).getAs[Double]("dup_trigram_frac") == 0.0)
    assert(out(1L).getAs[Boolean]("is_repetitive"))
    assert(out(2L).getAs[Double]("dup_word_frac") == 0.0)
    assert(!out(2L).getAs[Boolean]("is_repetitive"))
  }

  test("heavyHitters finds exact counts via bounded-memory candidates") {
    import spark.implicits._
    // capacity 2 forces Misra-Gries decrements; 'a' (freq 10 of 23 >
    // n/(k+1)) must survive any processing order; 'b' (5) is below the
    // threshold so the exact-verify filter drops it either way
    val text = (Seq.fill(10)("a") ++ Seq.fill(5)("b") ++
      (1 to 8).map(i => s"u$i")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text").repartition(1)
    val out = TextAnalysis.heavyHitters(docs, minCount = 6,
      mgCapacity = 2).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("word") == "a")
    assert(out.head.getAs[Long]("n_occurrences") == 10)
    // counts are exact (not the sketch's residual estimates)
    val multi = TextAnalysis.heavyHitters(
      docs.unionByName(docs.withColumn("doc_id", lit(2L))).repartition(3),
      minCount = 12, mgCapacity = 2).collect()
    assert(multi.map(r => (r.getAs[String]("word"),
      r.getAs[Long]("n_occurrences"))).toSeq == Seq(("a", 20L)))
  }

  test("sequencePack assigns serial concat-and-chunk offsets across buckets") {
    import spark.implicits._
    // doc 1001 lands in bucket 1: its offset must continue after
    // bucket 0's 9 tokens — the two-phase prefix sum must equal the
    // serial cumsum
    val docs = Seq((0L, "a b c"), (1L, "d e"), (2L, "f g h i"),
      (1001L, "j k")).toDF("doc_id", "text")
    val out = TextAnalysis.sequencePack(docs, seqTokens = 4,
      bucketWidth = 1000).orderBy("doc_id").collect()
    assert(out.map(_.getAs[Long]("token_start")).toSeq ==
      Seq(0L, 3L, 5L, 9L))
    assert(out.map(_.getAs[Long]("seq_id")).toSeq == Seq(0L, 0L, 1L, 2L))
    assert(out.map(_.getAs[Long]("seq_offset")).toSeq ==
      Seq(0L, 3L, 1L, 1L))
  }

  test("stratifiedSample keeps per-stratum rates deterministically") {
    val docs = tables.documents
    val a = TextAnalysis.stratifiedSample(docs, "lang",
      Map("en" -> 50), defaultPct = 10)
    val b = TextAnalysis.stratifiedSample(docs, "lang",
      Map("en" -> 50), defaultPct = 10)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // rates land near targets (hash-uniform; generous tolerance)
    val en = docs.filter(col("lang") === "en").count().toDouble
    val enKept = a.filter(col("lang") === "en").count().toDouble
    assert(enKept / en > 0.3 && enKept / en < 0.7,
      s"en rate ${enKept / en}")
    val rest = docs.filter(col("lang") =!= "en").count().toDouble
    val restKept = a.filter(col("lang") =!= "en").count().toDouble
    assert(restKept / rest < 0.25, s"default rate ${restKept / rest}")
    // 0/100 are exact bounds
    assert(TextAnalysis.stratifiedSample(docs, "lang", Map.empty, 0)
      .count() == 0)
    assert(TextAnalysis.stratifiedSample(docs, "lang", Map.empty, 100)
      .count() == docs.count())
  }

  test("piiScrub redacts emails, IPs and phone shapes with counts") {
    import spark.implicits._
    val docs = Seq(
      (1L, "mail a.b@x.org or 10.1.2.3 call 555-1234 twice 555-9999"),
      (2L, "clean words only")).toDF("doc_id", "text")
    val out = TextAnalysis.piiScrub(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[String]("clean_text") ==
      "mail <EMAIL> or <IP> call <PHONE> twice <PHONE>")
    assert(out(1L).getAs[Long]("n_emails") == 1)
    assert(out(1L).getAs[Long]("n_ips") == 1)
    assert(out(1L).getAs[Long]("n_phones") == 2)
    assert(out(2L).getAs[String]("clean_text") == "clean words only")
    assert(out(2L).getAs[Long]("n_emails") == 0)
  }

  test("piiPseudonymize: one token per address everywhere, raw values " +
    "gone, map inverts") {
    import spark.implicits._
    val docs = Seq(
      (1L, "write bob@x.org and sue@y.net today"),
      (2L, "ping bob@x.org again bob@x.org"),
      (3L, "clean words only")).toDF("doc_id", "text")
    val out = TextAnalysis.piiPseudonymize(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // no raw address survives
    assert(!out.values.exists(_.getAs[String]("pseudo_text").contains("@")))
    // the SAME address yields the SAME token in both docs
    val tokenRe = "<EMAIL_[0-9a-f]{8}>".r
    val t1 = tokenRe.findAllIn(out(1L).getAs[String]("pseudo_text")).toSeq
    val t2 = tokenRe.findAllIn(out(2L).getAs[String]("pseudo_text")).toSeq
    assert(t1.size == 2 && t1.distinct.size == 2)  // bob + sue differ
    assert(t2.size == 2 && t2.distinct.size == 1)  // bob twice, one token
    assert(t2.head == t1.head)                     // bob's token is global
    assert(out(1L).getAs[Long]("n_entities") == 2 &&
      out(1L).getAs[Long]("n_distinct_entities") == 2)
    assert(out(2L).getAs[Long]("n_entities") == 2 &&
      out(2L).getAs[Long]("n_distinct_entities") == 1)
    assert(out(3L).getAs[String]("pseudo_text") == "clean words only")
    // the lookup table: one row per distinct address, tokens match the
    // in-text rewrite (authorized re-identification closes the loop)
    val map = TextAnalysis.piiPseudonymMap(docs).collect()
      .map(r => r.getAs[String]("entity") -> r.getAs[String]("token"))
      .toMap
    assert(map.keySet == Set("bob@x.org", "sue@y.net"))
    assert(map("bob@x.org") == t1.head && map("sue@y.net") == t1(1))
  }

  test("tfidfTopTerms ranks rare terms above common ones") {
    import spark.implicits._
    // "rare" appears in 1 of 3 docs, "common" in all 3: within doc 1
    // (tf 1 each) rare scores 3/1, common 3/3 → rare ranks first
    val docs = Seq((1L, "rare common filler"), (2L, "common stuff"),
      (3L, "common other")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopTerms(docs, topN = 2)
    val d1 = out.filter(col("doc_id") === 1).orderBy("term_rank").collect()
    assert(d1.length == 2)
    assert(d1(0).getAs[String]("word") == "rare" ||
      d1(0).getAs[String]("word") == "filler") // both df=1, tie → word asc
    assert(d1(0).getAs[Double]("score") == 3.0)
    assert(d1.map(_.getAs[String]("word")).toSet == Set("rare", "filler"))
    // common never outranks a unique term in any doc
    assert(out.filter(col("word") === "common" &&
      col("term_rank") === 1).count() == 0)
    // per-doc output is capped at topN
    assert(out.groupBy("doc_id").count().collect()
      .forall(_.getAs[Long]("count") <= 2))
  }

  test("qualityClassifier: integer raw score, mean-weight bounds, stable") {
    val out = TextAnalysis.qualityClassifier(tables.documents)
    val rows = out.collect()
    assert(rows.length == tables.documents.count())
    rows.foreach { r =>
      val n = r.getAs[Long]("n_tokens")
      val raw = r.getAs[Long]("score_raw")
      val score = r.getAs[Double]("clf_score")
      // each token contributes a weight in [-1000, 1000]
      assert(math.abs(raw) <= n * 1000L)
      assert(score == raw.toDouble / (n * 1000.0))
      assert(r.getAs[Boolean]("clf_keep") == (score > 0.0))
    }
    // deterministic across runs
    val again = TextAnalysis.qualityClassifier(tables.documents).collect()
    assert(rows.map(_.getAs[Long]("score_raw")).sorted.toSeq ==
      again.map(_.getAs[Long]("score_raw")).sorted.toSeq)
  }

  test("domainMix: rates upsample small domains, budget approximately held") {
    import spark.implicits._
    // skewed corpus: big source has 9× the token mass of small
    val docs = (0L until 200L).map { i =>
      val src = if (i < 180) "big" else "small"
      (i, Seq.fill(10)(s"w$i").mkString(" "), src)
    }.toDF("doc_id", "text", "source")
    val out = TextAnalysis.domainMix(docs, budgetPpm = 500000L)
    val rates = out.select("source", "mix_rate_ppm").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // sqrt temperature: small domain's keep RATE must exceed big's
    assert(rates("small") > rates("big"))
    // rates are valid probabilities in ppm
    assert(rates.values.forall(r => r >= 0 && r <= 1000000L))
    // deterministic membership: same call → same kept set
    val again = TextAnalysis.domainMix(docs, budgetPpm = 500000L)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      == again)
  }

  test("wordPmi: counts and lift match the hand computation") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val out = TextAnalysis.wordPmi(docs, minPairCount = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    // tokens: 7 total, bigrams: 5 total; a:3 b:3 c:1
    assert(out(("a", "b")) == ((3L, 3L, 3L, ((3.0 * 7) * 7) / ((5.0 * 3) * 3))))
    assert(out(("b", "a"))._1 == 1L)
    assert(out(("b", "c"))._4 == ((1.0 * 7) * 7) / ((5.0 * 1) * 3))
    assert(!out.contains(("a", "c"))) // non-adjacent pair never counted
    // collocated pairs beat independence: lift("a","b") > 1
    assert(out(("a", "b"))._4 > 1.0)
  }

  test("wordPmi: minPairCount prunes rare pairs; single-word docs are inert") {
    import spark.implicits._
    val docs = Seq((1L, "x y x y x y"), (2L, "z"), (3L, "q r"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.wordPmi(docs, minPairCount = 2)
    val pairs = out.select("word_a", "word_b").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs == Set(("x", "y"), ("y", "x")))
  }

  test("qualityGate: per-rule flags match the operators they compose") {
    import spark.implicits._
    val docs = tables.documents
    val out = TextAnalysis.qualityGate(docs).cache()
    assert(out.count() == 500)
    // keep is exactly the conjunction of the rule columns
    val bad = out.filter(col("keep") =!=
      (col("rule_length") && col("rule_punct") && col("rule_stopword") &&
        col("rule_repetition") && col("rule_classifier")))
    assert(bad.count() == 0)
    // each rule agrees with its source operator
    val clf = TextAnalysis.qualityClassifier(docs)
      .select(col("doc_id"), col("clf_keep"))
    assert(out.join(clf, "doc_id")
      .filter(col("rule_classifier") =!= col("clf_keep")).count() == 0)
    val rep = TextAnalysis.repetition(docs)
      .select(col("doc_id"), (!col("is_repetitive")).as("nr"))
    assert(out.join(rep, "doc_id")
      .filter(col("rule_repetition") =!= col("nr")).count() == 0)
    // a pathological doc fails the right rules
    val junk = Seq((1L, "x! y! x! y! x! y! x! y! x! y! x! y!"))
      .toDF("doc_id", "text")
    val row = TextAnalysis.qualityGate(junk).collect().head
    assert(!row.getBoolean(2) && !row.getBoolean(3) && !row.getBoolean(4))
    assert(!row.getBoolean(6)) // keep = false
    out.unpersist()
  }

  test("mlmMask: deterministic positions, rate near target, labels recoverable") {
    val out = TextAnalysis.mlmMask(tables.documents).cache()
    assert(out.count() == 500)
    // mask rate lands near 15% corpus-wide
    val r = out.agg(sum("n_masked").cast("double") / sum("n_tokens"))
      .collect().head.getDouble(0)
    assert(r > 0.10 && r < 0.20, s"mask rate $r")
    // n_masked equals the [MASK] occurrences in the rewritten text
    val bad = out.filter(
      size(filter(split(col("masked_text"), " "), t => t === "[MASK]"))
        .cast("long") =!= col("n_masked"))
    assert(bad.count() == 0)
    // pure function of (salt, doc, pos): identical across runs,
    // different salt → different pattern
    val again = TextAnalysis.mlmMask(tables.documents)
    assert(out.exceptAll(again).count() == 0)
    val other = TextAnalysis.mlmMask(tables.documents, salt = "epoch2")
      .select("doc_id", "masked_text")
    assert(out.select("doc_id", "masked_text").exceptAll(other).count() > 0)
    out.unpersist()
  }

  test("invertedIndex: df/cf and tf-ranked postings from hand counts") {
    import spark.implicits._
    val docs = Seq((1L, "a a b"), (2L, "a c"), (3L, "b b b")).toDF("doc_id", "text")
    val out = TextAnalysis.invertedIndex(docs, maxPostings = 2).collect()
      .map(r => (r.getString(0), r.getLong(3)) ->
        (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5))).toMap
    // a: df=2 cf=3; postings ranked (doc1 tf2), (doc2 tf1)
    assert(out(("a", 1L)) == ((2L, 3L, 1L, 2L)))
    assert(out(("a", 2L)) == ((2L, 3L, 2L, 1L)))
    // b: df=2 cf=4; doc3 (tf3) outranks doc1 (tf1)
    assert(out(("b", 1L)) == ((2L, 4L, 3L, 3L)))
    assert(out(("b", 2L)) == ((2L, 4L, 1L, 1L)))
    assert(out(("c", 1L)) == ((1L, 1L, 2L, 1L)))
  }

  test("invertedIndex: maxPostings truncates hot terms, stats unaffected") {
    val out = TextAnalysis.invertedIndex(tables.documents, maxPostings = 3)
    assert(out.filter(col("posting_rank") > 3).count() == 0)
    // df can exceed the posting cap — stats count ALL docs, not kept ones
    assert(out.filter(col("df") > 3).count() > 0)
    // rank sequence per word is dense from 1
    val bad = out.groupBy("word")
      .agg(count(lit(1)).as("n"), max("posting_rank").as("m"))
      .filter(col("n") =!= col("m"))
    assert(bad.count() == 0)
  }

  test("docChunk: windows cover every token and overlap by chunk-stride") {
    import spark.implicits._
    // 10 tokens, 4-token windows every 3 → starts 0,3,6,9
    val docs = Seq((1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), (2L, "a b"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.docChunk(docs, chunkTokens = 4, stride = 3)
      .orderBy("doc_id", "chunk_id").collect()
    val d1 = out.filter(_.getLong(0) == 1L)
    assert(d1.map(_.getLong(2)).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(d1.map(_.getLong(3)).toSeq == Seq(0L, 3L, 6L, 9L))
    assert(d1.map(_.getString(5)).toSeq == Seq(
      "t0 t1 t2 t3", "t3 t4 t5 t6", "t6 t7 t8 t9", "t9"))
    assert(d1.map(_.getLong(4)).toSeq == Seq(4L, 4L, 4L, 1L))
    // a doc shorter than one window still yields its single chunk
    val d2 = out.filter(_.getLong(0) == 2L)
    assert(d2.length == 1 && d2.head.getString(5) == "a b" &&
      d2.head.getLong(4) == 2L)
    // every token position is inside at least one window
    val covered = d1.flatMap(r => r.getLong(3) until
      (r.getLong(3) + r.getLong(4))).toSet
    assert(covered == (0L until 10L).toSet)
  }

  test("docChunk: contiguous (stride == chunkTokens) partitions the stream") {
    val out = TextAnalysis.docChunk(tables.documents,
      chunkTokens = 32, stride = 32)
    // no overlap → chunk token counts sum back to the doc token count
    val bad = out.groupBy("doc_id")
      .agg(sum("n_chunk_tokens").as("s"), first("n_tokens").as("n"))
      .filter(col("s") =!= col("n"))
    assert(bad.count() == 0)
  }

  test("domainMix: full budget on a single-source corpus keeps everything") {
    // with one source the rate is exactly T·w/(W·m) = 1 — temperature
    // has nothing to redistribute; on a MULTI-source corpus a full
    // budget still downsamples dominant domains (that is the point)
    val docs = tables.documents.withColumn("source", lit("only"))
    val out = TextAnalysis.domainMix(docs, budgetPpm = 1000000L)
    assert(out.count() == tables.documents.count())
    assert(out.select("mix_rate_ppm").distinct().collect()
      .head.getLong(0) == 1000000L)
  }

  test("exactStratifiedSample: exactly k per stratum, ranks dense, hash-stable") {
    val out = TextAnalysis.exactStratifiedSample(tables.documents, "lang", 25)
    val perLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // every stratum in this corpus has >= 25 docs → exact counts
    assert(perLang.values.forall(_ == 25L), s"per-stratum counts: $perLang")
    // ranks are dense 1..k within each stratum
    val ranks = out.groupBy("lang")
      .agg(min("sample_rank").as("lo"), max("sample_rank").as("hi"),
        countDistinct("sample_rank").as("d")).collect()
    ranks.foreach(r => assert(r.getLong(1) == 1L && r.getLong(2) == 25L &&
      r.getLong(3) == 25L))
    // a stratum smaller than k yields the whole stratum
    val tiny = TextAnalysis.exactStratifiedSample(
      tables.documents.filter(col("doc_id") < 3), "lang", 25)
    assert(tiny.count() == tables.documents.filter(col("doc_id") < 3).count())
    // pure function of the salt+doc_id — identical across runs
    val again = TextAnalysis.exactStratifiedSample(tables.documents, "lang", 25)
    assert(out.exceptAll(again).count() == 0)
  }

  test("textNormalize: dirty input restores to canonical bytes") {
    import spark.implicits._
    val dirty = Seq(
      (1L, "  Hello\t WORLD \r\n"),
      (2L, "already clean"),
      (3L, "\u0000ctrl\u0001bytes\u001fhere"),
      (4L, "A  B   C")).toDF("doc_id", "text")
    val out = TextAnalysis.textNormalize(dirty).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "hello world")
    assert(out(2L) == "already clean")
    assert(out(3L) == "ctrl bytes here")
    assert(out(4L) == "a b c")
    // n_chars_norm measures the normalized text, and the hash keys it
    val full = TextAnalysis.textNormalize(dirty).collect()
    full.foreach(r => assert(r.getLong(2) == r.getString(1).length))
    // idempotent: normalizing normalized text is the identity
    val renorm = TextAnalysis.textNormalize(
      TextAnalysis.textNormalize(dirty)
        .select(col("doc_id"), col("norm_text").as("text")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(renorm == out)
  }

  test("qualityResample: rate proportional to score, bounded, stable") {
    val docs = tables.documents
    val out = TextAnalysis.qualityResample(docs)
    // rates are valid ppm and the kept fraction is plausible for
    // scores centered near zero (≈50% ± spread)
    assert(out.filter(col("keep_ppm") < 0 || col("keep_ppm") > 1000000L)
      .count() == 0)
    val frac = out.count().toDouble / docs.count()
    assert(frac > 0.15 && frac < 0.85, s"kept fraction $frac")
    // pure function of (salt, doc): identical across runs
    val again = TextAnalysis.qualityResample(docs)
    assert(out.exceptAll(again).count() == 0)
    // monotone: the kept set's mean score must exceed the corpus mean
    // (that is the point of proportional sampling)
    val scored = TextAnalysis.qualityClassifier(docs)
      .select(col("doc_id"), col("clf_score"))
    val keptMean = scored.join(out, "doc_id")
      .agg(avg("clf_score")).head.getDouble(0)
    val allMean = scored.agg(avg("clf_score")).head.getDouble(0)
    assert(keptMean > allMean,
      s"kept mean $keptMean not above corpus mean $allMean")
  }

  test("curriculumOrder: dense global permutation, bands ordered best-first") {
    val docs = tables.documents
    val out = TextAnalysis.curriculumOrder(docs)
    val n = docs.count()
    assert(out.count() == n)
    // ranks are a dense 0-based permutation
    assert(out.select(countDistinct("curriculum_rank")).head.getLong(0) == n)
    assert(out.agg(min("curriculum_rank"), max("curriculum_rank")).head ==
      org.apache.spark.sql.Row(0L, n - 1))
    // band ordering: every doc in a better band ranks before every
    // doc in a worse band
    val bandRanges = out.groupBy("band")
      .agg(min("curriculum_rank").as("lo"), max("curriculum_rank").as("hi"))
      .orderBy(col("band").desc).collect()
    bandRanges.sliding(2).foreach {
      case Array(hiBand, loBand) =>
        assert(hiBand.getLong(2) < loBand.getLong(1),
          s"band ranges interleave: $hiBand vs $loBand")
      case _ =>
    }
    // matches the serial single-window definition exactly
    import org.apache.spark.sql.expressions.Window
    val sha60 = org.apache.spark.sql.graft.GraftBridge.column(
      graft.functions.expressions.Sha60(
        org.apache.spark.sql.graft.GraftBridge.expression(
          concat(lit("curriculum:"), col("doc_id").cast("string")))))
    val serial = out.withColumn("serial_rank",
      row_number().over(Window.orderBy(col("band").desc, sha60,
        col("doc_id"))).cast("long") - 1)
    assert(serial.filter(col("serial_rank") =!= col("curriculum_rank"))
      .count() == 0)
  }

  test("scriptMix counts per-script chars and picks the dominant script") {
    import spark.implicits._
    val docs = Seq(
      (0L, "hello world 42"),          // latin + digits
      (1L, "привет мир"),              // cyrillic
      (2L, "你好世界"),                 // han
      (3L, "abc жжж 中中中中"),         // mixed, han wins
      (4L, ""))                        // empty → tie → latin
      .toDF("doc_id", "text")
    val m = TextAnalysis.scriptMix(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(m(0L).getAs[Long]("n_latin") == 10 &&
      m(0L).getAs[Long]("n_digit") == 2 &&
      m(0L).getAs[String]("main_script") == "latin")
    assert(m(1L).getAs[Long]("n_cyrillic") == 9 &&
      m(1L).getAs[String]("main_script") == "cyrillic")
    assert(m(2L).getAs[Long]("n_han") == 4 &&
      m(2L).getAs[Long]("n_latin") == 0 &&
      m(2L).getAs[String]("main_script") == "han")
    assert(m(3L).getAs[Long]("n_latin") == 3 &&
      m(3L).getAs[Long]("n_cyrillic") == 3 &&
      m(3L).getAs[Long]("n_han") == 4 &&
      m(3L).getAs[String]("main_script") == "han")
    // all-zero counts fall through the >= chain to latin — the fixed
    // tie order the oracle mirrors
    assert(m(4L).getAs[String]("main_script") == "latin")
  }

  test("piiReport aggregates exactly what piiScrub counts per doc") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a", "mail me x@y.example.com or z@w.example.org"),
      (1L, "a", "server 10.0.0.1 and 192.168.1.1 up"),
      (2L, "b", "call 555-0142 now"),
      (3L, "b", "nothing sensitive here at all"))
      .toDF("doc_id", "source", "text")
    val byClass = TextAnalysis.piiReport(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = byClass("a")
    assert(a.getAs[Long]("n_docs") == 2 &&
      a.getAs[Long]("n_docs_with_pii") == 2 &&
      a.getAs[Long]("n_emails") == 2 && a.getAs[Long]("n_ips") == 2 &&
      a.getAs[Long]("n_phones") == 0)
    val b = byClass("b")
    assert(b.getAs[Long]("n_docs") == 2 &&
      b.getAs[Long]("n_docs_with_pii") == 1 &&
      b.getAs[Long]("n_emails") == 0 && b.getAs[Long]("n_ips") == 0 &&
      b.getAs[Long]("n_phones") == 1)
    // the regression direction: scrubbed text reports zero PII
    val clean = TextAnalysis.piiScrub(docs)
      .join(docs.select("doc_id", "source"), "doc_id")
      .select(col("source"), col("clean_text").as("text"))
    val after = TextAnalysis.piiReport(clean).collect()
    assert(after.forall(_.getAs[Long]("n_docs_with_pii") == 0L))
  }

  test("stratifiedKFold assigns every doc, stable under corpus growth") {
    import spark.implicits._
    val docs = tables.documents
    val out = TextAnalysis.stratifiedKFold(docs, "lang", k = 5)
    assert(out.count() == 500)
    // folds cover [0, 5) and are non-degenerate
    val folds = out.groupBy("fold").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(folds.keySet.subsetOf((0L until 5L).toSet) && folds.size == 5)
    // append stability — THE property a rate sample can't give:
    // re-running on corpus ∪ new docs never moves an old doc's fold
    val before = out.select("doc_id", "fold").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val grown = docs.unionByName(
      Seq((1000001L, "brand new text", "en", "web", 14L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    TextAnalysis.stratifiedKFold(grown, "lang", k = 5)
      .filter(col("doc_id") <= 1000000L)
      .select("doc_id", "fold").collect()
      .foreach(r => assert(before(r.getLong(0)) == r.getLong(1)))
    // fold_rank is dense 1..n within each (stratum, fold)
    val ranks = out.filter(col("lang") === "en" && col("fold") === 0L)
      .select("fold_rank").collect().map(_.getLong(0)).sorted
    assert(ranks.toSeq == (1L to ranks.length).toSeq)
  }

  test("ngramNovelty credits first owners and halves on a half-copy") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c", "en", "web", 5L),      // bigrams: "a b", "b c"
      (2L, "a b d", "en", "web", 5L),      // "a b" seen, "b d" novel
      (3L, "a b c", "en", "web", 5L),      // exact copy: zero novel
      (4L, "x x x x", "en", "web", 7L))    // one DISTINCT bigram, novel
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.ngramNovelty(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n_distinct_bigrams") == 2 &&
      out(1L).getAs[Long]("novelty_ppm") == 1000000L)
    assert(out(2L).getAs[Long]("n_novel") == 1 &&
      out(2L).getAs[Long]("novelty_ppm") == 500000L)
    assert(out(3L).getAs[Long]("n_novel") == 0 &&
      out(3L).getAs[Long]("novelty_ppm") == 0L)
    // intra-doc repetition counts once (distinct bigrams)
    assert(out(4L).getAs[Long]("n_distinct_bigrams") == 1 &&
      out(4L).getAs[Long]("novelty_ppm") == 1000000L)
  }

  test("doclenHistogram: integer log2 buckets, exact power-of-two edges") {
    import spark.implicits._
    // 8 tokens must land in bucket 3 [8,15] — the case float log2
    // mis-buckets (ln8/ln2 = 2.9999…96 → floor 2)
    val docs = Seq(
      (1L, "a b c d e f g h", "en", "web", 15L),       // 8 tok → b3
      (2L, "a b c d e f g", "en", "web", 13L),         // 7 tok → b2
      (3L, "a", "en", "web", 1L),                      // 1 tok → b0
      (4L, "a b", "de", "web", 3L))                    // 2 tok → b1
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.doclenHistogram(docs).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    assert(out(("en", 3L)).getAs[Long]("n_docs") == 1)
    assert(out(("en", 3L)).getAs[Long]("lo_tokens") == 8 &&
      out(("en", 3L)).getAs[Long]("hi_tokens") == 15)
    assert(out(("en", 2L)).getAs[Long]("n_docs") == 1)
    assert(out(("en", 0L)).getAs[Long]("share_ppm") == 333333L)
    assert(out(("de", 1L)).getAs[Long]("share_ppm") == 1000000L)
    // buckets partition each language: shares sum to ~1e6 (floor loss)
    val enShare = out.collect { case (("en", _), r) =>
      r.getAs[Long]("share_ppm") }.sum
    assert(enShare > 999900L && enShare <= 1000000L)
  }

  test("mixDrift: identical snapshots drift zero; vanished and newborn cells surface") {
    val docs = tables.documents
    val same = TextAnalysis.mixDrift(docs, docs)
    assert(same.filter(col("drift_ppm") =!= 0L).count() == 0)
    // drop one source entirely and invent another: both must appear
    // as full-outer cells with a zero side
    val cur = docs.withColumn("source",
      when(col("source") === "src0", lit("web-v2")).otherwise(col("source")))
    val out = TextAnalysis.mixDrift(docs, cur)
    val vanished = out.filter(col("source") === "src0" && col("n_cur") === 0L)
    val newborn = out.filter(col("source") === "web-v2" && col("n_prev") === 0L)
    assert(vanished.count() > 0 && newborn.count() > 0)
    // counts conserve: total prev == total cur (pure relabel)
    val sums = out.agg(sum("n_prev"), sum("n_cur")).collect()(0)
    assert(sums.getLong(0) == sums.getLong(1))
  }

  test("ksDrift: identical ≤1ppm, disjoint ≈1e6, detects a truncation stripe") {
    import spark.implicits._
    val a = (1L to 100L).map(i => (i % 50) + 10).toDF("v")
    val same = TextAnalysis.ksDrift(a, a, "v").collect()(0)
    assert(same.getAs[Long]("ks_ppm") <= 1L)
    // disjoint supports: the gap reaches the full CDF separation
    val b = (1L to 100L).map(i => (i % 50) + 1000).toDF("v")
    val disj = TextAnalysis.ksDrift(a, b, "v").collect()(0)
    assert(disj.getAs[Long]("ks_ppm") >= 999999L)
    assert(disj.getAs[Long]("n_prev") == 100L && disj.getAs[Long]("n_cur") == 100L)
    // a truncation stripe (25% of values clamped to 5) must move the
    // KS stat by about that mass, peaking at the clamp value
    val c = (1L to 100L).map(i => if (i % 4 == 0) 5L else (i % 50) + 10).toDF("v")
    val trunc = TextAnalysis.ksDrift(a, c, "v").collect()(0)
    assert(trunc.getAs[Long]("ks_ppm") >= 200000L &&
      trunc.getAs[Long]("at_value") >= 5L)
  }

  test("ksDrift: partitioned two-phase cumsum is bit-identical to the " +
       "single-window path") {
    import spark.implicits._
    // skewed, gappy long domain so the range buckets are uneven
    val a = (1L to 500L).map(i => i * i % 9973).toDF("v")
    val b = (1L to 400L).map(i => (i * 31) % 7919 + 50).toDF("v")
    def run() = TextAnalysis.ksDrift(a, b, "v").collect()(0)
    val single = run()
    // force every census past the threshold onto the two-phase path —
    // the 100 TB shape where one partition must not hold the whole CDF
    spark.conf.set("spark.graft.ksDrift.partitionedCumsumMinRows", "1")
    val partitioned = try run()
      finally spark.conf
        .unset("spark.graft.ksDrift.partitionedCumsumMinRows")
    assert(partitioned == single)
  }

  test("bm25Search: tf saturation, idf ordering, and length penalty") {
    import spark.implicits._
    val docs = Seq(
      (0L, "rare common"),                // the query doc
      (1L, "rare x x x"),                 // rare once, short
      (2L, "common x x x"),               // common once, short
      (3L, "rare rare x x"),              // rare twice
      (4L, "rare x x x x x x x"),         // rare once, LONG
      (5L, "common y z w"), (6L, "common y z w"),
      (7L, "common y z w"), (8L, "common y z w"))
      .map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.bm25Search(docs, _ === 0L, k = 10)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("bm25"), r.getAs[Long]("rank"))).toMap
    // higher tf wins (but saturates: < 2x)
    assert(out(3L)._1 > out(1L)._1 && out(3L)._1 < 2 * out(1L)._1)
    // rarer term out-scores the common one at equal tf and dl
    assert(out(1L)._1 > out(2L)._1)
    // longer doc with the same tf is penalized
    assert(out(1L)._1 > out(4L)._1)
    // rank order follows the scores with doc_id tie-break
    val byRank = out.toSeq.sortBy(_._2._2).map(_._2._1)
    assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    // self is never scored
    assert(!out.contains(0L))
  }

  test("tokenGini: zero on uniform lengths, hand-checked on a skewed pair") {
    import spark.implicits._
    def doc(id: Long, nTok: Int, lang: String) =
      (id, Seq.fill(nTok)("w").mkString(" "), lang, "web", nTok.toLong)
    // uniform: every doc 5 tokens → gini exactly 0
    val uniform = (1L to 10L).map(doc(_, 5, "en"))
    // skewed: (1, 99) → G = (2·(1·1+2·99) − 3·100)/(2·100) = 0.49
    val skewed = Seq(doc(100L, 1, "de"), doc(101L, 99, "de"))
    val out = TextAnalysis.tokenGini(
      (uniform ++ skewed).toDF("doc_id", "text", "lang", "source", "n_chars"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("en").getAs[Double]("gini") == 0.0)
    assert(out("en").getAs[Long]("total_tokens") == 50L)
    assert(out("de").getAs[Double]("gini") == 0.49)
    assert(out("de").getAs[Long]("n_docs") == 2L)
  }

  test("shardAssign: two-phase rank equals the global sort; token mass balances") {
    val docs = tables.documents
    val out = TextAnalysis.shardAssign(docs, nShards = 8)
    assert(out.count() == docs.count())
    // the banded two-phase rank must EQUAL row_number over the global
    // (n_tok desc, doc_id) order
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("n_tok").desc, col("doc_id"))
    val expected = docs
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .withColumn("size_rank", row_number().over(w).cast("long") - 1)
    assert(out.select("doc_id", "size_rank")
      .exceptAll(expected.select("doc_id", "size_rank")).count() == 0)
    // round-robin LPT: shard token masses within one max-doc of each other
    val masses = out.groupBy("shard").agg(sum("n_tok").as("m"))
      .collect().map(_.getLong(1))
    val maxDoc = out.agg(max("n_tok")).collect()(0).getLong(0)
    assert(masses.length == 8 && masses.max - masses.min <= maxDoc)
  }

  test("vocabCoverage: rare-word languages show higher OOV against a " +
    "small vocab; a full vocab covers everything") {
    import spark.implicits._
    // "common" appears 8×; lang B's words appear once each → with
    // k=1 the vocab is exactly {common}
    val d = (
      (1L to 4L).map(i => (i, "common common", "A")) ++
      Seq((5L, "rare1 rare2", "B"), (6L, "rare3 rare4", "B"))).toDF(
      "doc_id", "text", "lang")
    val small = TextAnalysis.vocabCoverage(d, k = 1)
      .collect().map(r => r.getAs[String]("lang") -> r).toMap
    assert(small("A").getAs[Long]("oov_ppm") == 0L)
    assert(small("B").getAs[Long]("oov_ppm") == 1000000L)
    assert(small("A").getAs[Long]("n_tokens") == 8L &&
      small("A").getAs[Long]("n_in_vocab") == 8L)
    val full = TextAnalysis.vocabCoverage(d, k = 100)
      .agg(sum(col("n_tokens") - col("n_in_vocab"))).collect().head
    assert(full.getLong(0) == 0L)
  }

  test("langIdConfusion: shares sum to 1e6 per true language, " +
    "diagonal flagged correct") {
    val out = TextAnalysis.langIdConfusion(tables.documents).collect()
    val byLang = out.groupBy(_.getAs[String]("lang"))
    byLang.foreach { case (_, rows) =>
      // integer-div shares can undershoot 1e6 by at most #cells
      val s = rows.map(_.getAs[Long]("share_of_true_ppm")).sum
      assert(s <= 1000000L && s > 1000000L - rows.length)
    }
    out.foreach { r =>
      assert(r.getAs[Boolean]("is_correct") ==
        (r.getAs[String]("lang") == r.getAs[String]("predicted_lang")))
    }
    // marker-bearing English text routes to the en cell
    import spark.implicits._
    val d = Seq((1L, "the cat and the dog is here", "en"))
      .toDF("doc_id", "text", "lang")
    val one = TextAnalysis.langIdConfusion(d).collect().head
    assert(one.getAs[String]("predicted_lang") == "en" &&
      one.getAs[Long]("share_of_true_ppm") == 1000000L)
  }

  test("vocabCoverage: vocab boundary tie-breaks deterministically " +
    "(count desc, word asc)") {
    import spark.implicits._
    // x and y both appear twice; k=2 must keep {x, top} not {y, top}
    val d = Seq((1L, "top top top x y", "A"), (2L, "x y", "A"))
      .toDF("doc_id", "text", "lang")
    val r = TextAnalysis.vocabCoverage(d, k = 2).collect().head
    // in-vocab mass: top×3 + x×2 = 5 of 7 tokens
    assert(r.getAs[Long]("n_in_vocab") == 5L)
  }

  test("lexiconFilter: ratio gate, not mere presence") {
    import spark.implicits._
    val d = Seq(
      // 1 hit in 21 tokens (4.7%) — an incidental mention survives
      (1L, ("bad " + Seq.fill(20)("ok").mkString(" ")).trim, "a"),
      // 2 hits in 10 tokens (20%) — flagged
      (2L, "bad bad ok ok ok ok ok ok ok ok", "a"),
      (3L, "clean text only", "b"))
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.lexiconFilter(d, Seq("bad"), maxHitPct = 5)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(out("a").getAs[Long]("n_docs") == 2L)
    assert(out("a").getAs[Long]("n_flagged") == 1L)
    assert(out("a").getAs[Long]("flagged_ppm") == 500000L)
    assert(out("a").getAs[Long]("tokens_dropped") == 10L)
    assert(out("b").getAs[Long]("n_flagged") == 0L &&
      out("b").getAs[Long]("tokens_dropped") == 0L)
  }

  test("phraseSearch: adjacency required, overlaps counted, order respected") {
    import spark.implicits._
    val d = Seq(
      (1L, "big table scan now", "s"),          // one match at pos 1
      (2L, "table x scan", "s"),                // words present, apart
      (3L, "scan table", "s"),                  // reversed order
      (4L, "table scan table scan", "s"),       // two matches
      (5L, "nothing here", "s"))
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.phraseSearch(d, Seq("table", "scan"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_matches"), r.getAs[Long]("first_pos"))).toMap
    assert(out == Map(1L -> (1L, 1L), 4L -> (2L, 0L)))
  }

  test("phraseSearch: a three-word phrase chains the position joins") {
    import spark.implicits._
    val d = Seq((1L, "a b c d", "s"), (2L, "a b x c", "s"))
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.phraseSearch(d, Seq("a", "b", "c")).collect()
    assert(out.length == 1 && out.head.getAs[Long]("doc_id") == 1L &&
      out.head.getAs[Long]("first_pos") == 0L)
  }

  test("countMinAudit: exact truths, one-sided estimates, missing-word probe") {
    import spark.implicits._
    val d = Seq((1L, "a a a b c", "s"), (2L, "a b b d e f", "s"))
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.countMinAudit(d, width = 64, depth = 4,
      probes = Seq("a", "b", "nope")).collect()
      .map(r => r.getAs[String]("word") -> r).toMap
    assert(out.size == 3)
    assert(out("a").getAs[Long]("true_count") == 4L)
    assert(out("b").getAs[Long]("true_count") == 3L)
    assert(out("nope").getAs[Long]("true_count") == 0L)
    // the CMS one-sided guarantee: estimates never undercount, and
    // the total overcount is bounded by the corpus mass
    for ((_, r) <- out) {
      assert(r.getAs[Boolean]("never_undercounts"))
      assert(r.getAs[Long]("cm_estimate") >= r.getAs[Long]("true_count"))
      assert(r.getAs[Long]("overcount") <= 11L,
        "a cell can never exceed the total token count")
    }
  }

  test("countMinAudit counters merge: split corpus sketches sum to the whole") {
    import org.apache.spark.sql.functions._
    // associativity of the counter fold: sketch(all) estimates equal
    // those from summing per-half counters — proven here end-to-end
    // by estimates being identical when the corpus arrives in any
    // partition layout (1 vs 32 partitions)
    val docs = tables.documents.limit(200)
    val a = TextAnalysis.countMinAudit(docs.repartition(1),
      probes = Seq("the", "table")).orderBy("word").collect()
    val b = TextAnalysis.countMinAudit(docs.repartition(32),
      probes = Seq("the", "table")).orderBy("word").collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }
}
