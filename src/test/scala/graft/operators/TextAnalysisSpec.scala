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
}
