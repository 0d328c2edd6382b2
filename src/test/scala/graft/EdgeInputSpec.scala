package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators._

/** Degenerate-input robustness: a pipeline stage at 100 TB WILL see
  * an empty partition, an empty delta, or a one-document stratum
  * (a filter that matched nothing, a quiet ingest window). Operators
  * must return empty/degenerate RESULTS, never throw — a nightly run
  * that dies on an empty delta is an operational bug even though no
  * data was wrong.
  */
class EdgeInputSpec extends SparkSpec {

  import spark.implicits._

  private def emptyDocs: DataFrame =
    Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  private def oneDoc: DataFrame =
    Seq((1L, "the only document here", "en", "web", 22L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("text operators return empty results on an empty corpus") {
    assert(TextAnalysis.tokenCount(emptyDocs).count() == 0)
    assert(TextAnalysis.qualityClassifier(emptyDocs).count() == 0)
    assert(TextAnalysis.qualityResample(emptyDocs).count() == 0)
    assert(TextAnalysis.curriculumOrder(emptyDocs).count() == 0)
    assert(TextAnalysis.corpusShuffle(emptyDocs).count() == 0)
    assert(TextAnalysis.exactStratifiedSample(emptyDocs, "lang", 5)
      .count() == 0)
    assert(TextAnalysis.textNormalize(emptyDocs).count() == 0)
    assert(TextAnalysis.vocabulary(emptyDocs).count() == 0)
    assert(TextAnalysis.invertedIndex(emptyDocs).count() == 0)
    assert(TextAnalysis.sequencePack(emptyDocs).count() == 0)
    assert(TextAnalysis.domainMix(emptyDocs).count() == 0)
  }

  test("dedup operators return no pairs/clusters on an empty corpus") {
    assert(Dedup.exact(emptyDocs).count() == 0)
    assert(Dedup.minhashLsh(emptyDocs).count() == 0)
    assert(Dedup.simhashPairs(emptyDocs).count() == 0)
    val clusters = Clusters.duplicateClusters(emptyDocs,
      Dedup.minhashLsh(emptyDocs))
    assert(clusters.count() == 0)
    assert(Clusters.clusterStats(clusters).count() == 0)
  }

  test("a single-document corpus is inert everywhere it should be") {
    // no pair-generating operator may emit anything from one doc
    assert(Dedup.minhashLsh(oneDoc).count() == 0)
    assert(Dedup.simhashPairs(oneDoc).count() == 0)
    // rank/order operators emit exactly the one row, rank 0/1
    val order = TextAnalysis.curriculumOrder(oneDoc).collect()
    assert(order.length == 1 &&
      order.head.getAs[Long]("curriculum_rank") == 0L)
    val shuffle = TextAnalysis.corpusShuffle(oneDoc).collect()
    assert(shuffle.length == 1 &&
      shuffle.head.getAs[Long]("shuffle_rank") == 0L)
    val sampled = TextAnalysis.exactStratifiedSample(oneDoc, "lang", 5)
      .collect()
    assert(sampled.length == 1 &&
      sampled.head.getAs[Long]("sample_rank") == 1L)
    // the cluster layer labels the singleton canonical
    val c = Clusters.duplicateClusters(oneDoc, Dedup.minhashLsh(oneDoc))
      .collect()
    assert(c.length == 1 && c.head.getAs[Boolean]("is_canonical") &&
      c.head.getAs[Long]("cluster_size") == 1L)
  }

  test("ANN search over an empty corpus returns no neighbors") {
    val emptyEmb = Seq.empty[(Long, Array[Float], Int)]
      .toDF("vec_id", "embedding", "label")
    val queries = tables.embeddings.filter(col("vec_id") < 2)
      .select("vec_id", "embedding", "label")
    assert(Similarity.annBruteForce(emptyEmb, queries).count() == 0)
    // empty QUERY side against a real corpus is also inert
    val emptyQ = emptyEmb
    assert(Similarity.annBruteForce(tables.embeddings, emptyQ)
      .count() == 0)
  }

  test("bigram LM scoring: empty eval is inert; empty train floors every transition") {
    val emptyDocsLm = emptyDocs
    // empty eval side → no rows
    assert(NgramLm.scoreDocs(oneDoc, emptyDocsLm).count() == 0)
    // empty TRAIN side: every eval transition must fall back to the
    // smoothing floor, never divide by a null count or throw
    val floored = NgramLm.scoreDocs(emptyDocsLm, oneDoc)
    assert(floored.count() == 1)
  }

  test("corpus cleaning passes an empty corpus through") {
    assert(CorpusClean.paragraphDedup(emptyDocs).count() == 0)
    assert(CorpusClean.paragraphDedup(emptyDocs,
      path = CorpusClean.BannedSetPath.AntiJoin).count() == 0)
    assert(CorpusClean.intraDocDedup(emptyDocs).count() == 0)
  }

  test("skew and governance audits behave on empty and trivial keys") {
    val emptyKeys = Seq.empty[(Long, String)].toDF("user_id", "k")
    assert(Skew.skewReport(emptyKeys, "user_id").count() == 0)
    assert(Profile.kAnonymity(oneDoc, Seq("lang")).count() == 1)
    val ld = Profile.lDiversity(oneDoc, Seq("lang"), "source").collect()
    assert(ld.length == 1 && ld.head.getAs[Long]("n_sensitive_values") == 1L)
  }

  test("fifth-wave operators are inert on empty and singleton inputs") {
    // graph family: no edges, no vertices, no throw
    assert(Triangles.wordTriangles(emptyDocs).count() == 0)
    assert(TextRank.textRank(emptyDocs).count() == 0)
    // a one-doc corpus has a graph but no pairs anywhere
    assert(SetJoin.similarityJoinExact(oneDoc).count() == 0)
    val audit = SetJoin.lshRecallAudit(oneDoc).collect().head
    assert(audit.getAs[Long]("n_exact") == 0 &&
      audit.isNullAt(audit.fieldIndex("recall")))
    // ED join: empty and singleton produce no pairs
    val emptyNames = Seq.empty[(Long, String)].toDF("id", "s")
    assert(EditDistance.edJoin(emptyNames, "id", "s").count() == 0)
    assert(EditDistance.edJoin(Seq((1L, "x")).toDF("id", "s"),
      "id", "s").count() == 0)
    // basket mining: empty lineitem, single-item baskets → no pairs
    val emptyLi = Seq.empty[(Long, Long)].toDF("l_orderkey", "l_partkey")
    assert(Basket.marketBasket(emptyLi).count() == 0)
    assert(Basket.marketBasket(
      Seq((1L, 10L), (2L, 20L)).toDF("l_orderkey", "l_partkey"))
      .count() == 0)
  }

  test("value repair operators keep empty/degenerate groups intact") {
    val emptyEv = Seq.empty[(Long, String, Long, Double)]
      .toDF("event_id", "event_type", "ts", "value")
    assert(Gold.winsorize(emptyEv, "event_type", "value", 0.05, 0.95,
      2.0).count() == 0)
    assert(Gold.equiDepthHistogram(emptyEv, "event_type", "value", 4,
      2.0).count() == 0)
    assert(TimeSeries.interpolate(emptyEv).count() == 0)
    // a single-row group: every fence is the value itself — the row
    // survives unclipped in bucket 0
    val one = Seq((1L, "t", 0L, 42.0))
      .toDF("event_id", "event_type", "ts", "value")
    val w = Gold.winsorize(one, "event_type", "value", 0.05, 0.95, 2.0)
      .collect().head
    assert(w.getAs[Double]("value_w") == 42.0 &&
      !w.getAs[Boolean]("clipped"))
    val h = Gold.equiDepthHistogram(one, "event_type", "value", 4, 2.0)
      .collect().head
    assert(h.getAs[Long]("bucket") == 0L && h.getAs[Long]("n") == 1L)
  }

  test("round-7 operators are inert on empty and singleton inputs") {
    // the sweeps: an empty corpus still reports one row per config,
    // all counts zero (a sweep that dies on a quiet ingest window is
    // an operational bug); a one-doc corpus likewise has no pairs
    val dir = java.nio.file.Files
      .createTempDirectory("graft_edge_sweep").toString
    val sweepEmpty = Dedup.paramSweep(emptyDocs, s"$dir/pe").collect()
    assert(sweepEmpty.length == 3 &&
      sweepEmpty.forall(r => r.getAs[Long]("n_candidates") == 0L &&
        r.getAs[Long]("n_dup_pairs") == 0L))
    assert(Dedup.thresholdCurve(emptyDocs).count() == 0)
    val recOne = SetJoin.sweepRecall(oneDoc, s"$dir/r1").collect()
    assert(recOne.length == 3 &&
      recOne.forall(r => r.getAs[Long]("n_exact") == 0L &&
        r.isNullAt(r.fieldIndex("recall"))))
    // map-only text reports pass empties through
    assert(TextAnalysis.scriptMix(emptyDocs).count() == 0)
    assert(TextAnalysis.piiReport(emptyDocs).count() == 0)
    // a one-vector index: the audit is one cell holding everything
    val oneEmb = tables.embeddings.filter(col("vec_id") === 0L)
    val cs = Similarity.cellStats(oneEmb).collect()
    assert(cs.length == 1 && cs.head.getAs[Long]("n_vectors") == 1L &&
      cs.head.getAs[Long]("share_ppm") == 1000000L)
  }

  test("wave-10 operators are inert on empty and singleton inputs") {
    val emptyEvents = Seq.empty[(Long, Long, Long, String, Double, String)]
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    assert(TimeSeries.changepoint(emptyEvents).count() == 0)
    assert(TimeSeries.decayedPopularity(emptyEvents).count() == 0)
    assert(TextAnalysis.stratifiedKFold(emptyDocs, "lang", 5).count() == 0)
    assert(TextAnalysis.ngramNovelty(emptyDocs).count() == 0)
    assert(CorpusClean.boilerplatePerSource(emptyDocs).count() == 0)
    val emptyEmb = Seq.empty[(Long, Seq[Float], Int)]
      .toDF("vec_id", "embedding", "label")
    assert(Similarity.centroidOutliers(emptyEmb).count() == 0)
    // a one-doc corpus: every bigram is novel; no chunk can be
    // cross-document template; the single doc owns fold_rank 1
    val nov = TextAnalysis.ngramNovelty(oneDoc).collect()
    assert(nov.length == 1 &&
      nov.head.getAs[Long]("novelty_ppm") == 1000000L)
    val bp = CorpusClean.boilerplatePerSource(oneDoc).collect()
    assert(bp.length == 1 &&
      bp.head.getAs[String]("text_clean") == "the only document here")
    val kf = TextAnalysis.stratifiedKFold(oneDoc, "lang", 5).collect()
    assert(kf.length == 1 && kf.head.getAs[Long]("fold_rank") == 1L)
    // a sub-bigram doc drops from novelty (no bigrams), not throws
    val tiny = Seq((7L, "word", "en", "web", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(TextAnalysis.ngramNovelty(tiny).count() == 0)
    // single-event series: one hour, cusum 0, no after-side mean
    val oneEvent = Seq((1L, 3600000005L, 1L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val cp = TimeSeries.changepoint(oneEvent).collect()
    assert(cp.length == 1 && cp.head.getAs[Double]("cusum") == 0.0 &&
      cp.head.isNullAt(cp.head.fieldIndex("mean_after")))
    val dp = TimeSeries.decayedPopularity(oneEvent).collect()
    assert(dp.length == 1 &&
      dp.head.getAs[Long]("decayed_mass") == 1000000L &&
      dp.head.getAs[Long]("decayed_share_ppm") == 1000000L)
  }

  test("wave-17/18 operators are inert on empty and degenerate inputs") {
    import org.apache.spark.sql.functions.col
    assert(Importance.dsirResample(emptyDocs).count() == 0)
    assert(TextAnalysis.vocabCoverage(emptyDocs).count() == 0)
    assert(Profile.groupedMoments(emptyDocs).count() == 0)
    val emptyEvents = Seq.empty[(Long, Long, Long, String, Double, String)]
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    assert(TimeSeries.lateArrivalAudit(emptyEvents, 10L,
      col("event_id")).count() == 0)
    // a one-doc corpus: every bigram is self-typical → full keep prob
    val d1 = Importance.dsirResample(oneDoc).collect()
    assert(d1.length == 1 &&
      d1.head.getAs[Long]("keep_prob_ppm") == 1000000L)
    // a degenerate single-arm population reports NULL rates and z²,
    // never a division error
    val oneUser = Seq((1L, "purchase")).toDF("user_id", "event_type")
    val ab = Experiment.abTest(oneUser, "purchase", minCount = 1L)
      .collect().head
    assert(ab.getAs[Long]("n_control") + ab.getAs[Long]("n_treat") == 1L)
    assert(ab.isNullAt(ab.fieldIndex("lift_ppm")) &&
      ab.isNullAt(ab.fieldIndex("z_squared")))
    // one doc, one source: zero variance, centered skew
    val m1 = Profile.groupedMoments(oneDoc).collect().head
    assert(m1.getAs[java.math.BigDecimal]("var_num").longValueExact == 0L &&
      m1.getAs[Double]("var_tokens") == 0.0 &&
      m1.getAs[Long]("skew_sign") == 0L)
    // a single arrival is never late
    val oneEv = Seq((1L, 100L, 1L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val la = TimeSeries.lateArrivalAudit(oneEv, 10L,
      col("event_id")).collect().head
    assert(la.getAs[Long]("n_late") == 0L)
    // IVM over empty base and delta publishes an empty view
    val t = tables
    assert(Ivm.maintain(t.lineitem.limit(0), t.lineitem.limit(0),
      t.orders, t.customer, t.nation).count() == 0)
  }

  test("late-wave operators are inert on empty and degenerate inputs") {
    // the SemDeDup curve still reports one all-zero row per cutoff
    // on an empty corpus (a sweep must survive a quiet window)
    val emptyEmb = Seq.empty[(Long, Seq[Float], Int)]
      .toDF("vec_id", "embedding", "label")
    val curve = Dedup.semdedupCurve(emptyEmb,
      thresholds = Seq(0.5, 0.9)).collect()
    assert(curve.length == 2 && curve.forall(r =>
      r.getAs[Long]("n_pairs") == 0L &&
        r.getAs[Long]("n_survivors") == 0L))
    // the component-vs-pairwise calibration row survives an empty
    // corpus as one all-zero row (no pairs, no components)
    val cd = Dedup.semdedupComponentDrop(emptyEmb).collect()
    assert(cd.length == 1 &&
      cd.head.getAs[Long]("n_dropped_component") == 0L &&
      cd.head.getAs[Long]("n_dropped_pairwise") == 0L &&
      cd.head.getAs[Long]("n_survivors_component") == 0L)
    // cluster folding: an empty history + empty delta is empty, and a
    // cold start (no labels yet, everything is delta) equals scratch
    val emptyIds = Seq.empty[Long].toDF("id")
    val emptyPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(operators.Clusters.incrementalClusters(
      emptyIds.withColumn("label", col("id")), emptyPairs,
      emptyIds).count() == 0)
    val cold = operators.Clusters.incrementalClusters(
      emptyIds.withColumn("label", col("id")),
      Seq((1L, 2L)).toDF("id_a", "id_b"), Seq(1L, 2L, 3L).toDF("id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cold == Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
    // leakage audit/fix on an empty corpus: no pairs, no rows / all kept
    assert(Dedup.splitLeakageAudit(emptyDocs).count() == 0)
    assert(Dedup.splitLeakageFix(emptyDocs).count() == 0)
    // a single doc can't leak and is kept
    val fx = Dedup.splitLeakageFix(oneDoc).collect()
    assert(fx.length == 1 && fx.head.getAs[Boolean]("kept"))
    // mix report and source report are empty-safe
    assert(Importance.dsirMixReport(emptyDocs).count() == 0)
    val one = graft.Queries.queries("source_dedup_report")
    assert(TimeSeries.lateArrivalAudit(
      Seq.empty[(Long, Long, String)].toDF("event_id", "ts", "event_type"),
      10L, org.apache.spark.sql.functions.col("event_id")).count() == 0)
    // compaction plan over an empty table is an empty work list
    val emptyEvents = Seq.empty[(Long, Long)].toDF("event_id", "ts")
    assert(Maintenance.compactionPlan(emptyEvents).count() == 0)
    assert(one != null)
  }

  test("XML round-trip survives markup-hostile text exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_xml").toString
    val hostile = Seq(
      (1L, "a <tag> & \"quoted\" 'text' with ]]> inside", "en", "web", 40L),
      (2L, "line one\nline two\ttabbed", "en", "web", 24L),
      (3L, "unicode: … • ß 中文", "zh", "web", 15L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val back = graft.sources.Ingest.roundTrip(spark, hostile, "xml",
      s"$dir/t")
    assert(back.exceptAll(hostile).isEmpty &&
      hostile.exceptAll(back).isEmpty,
      "escaped markup must round-trip byte-exactly")
  }
}
