package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NgramLmSpec extends SparkSpec {

  import spark.implicits._

  // unigrams a:3 b:2 (V=2); bigrams (a,b):1 (b,a):2
  private def corpus = Seq((1L, "a b a"), (2L, "b a")).toDF("doc_id", "text")

  test("train: add-1 smoothed p_ppb from hand-computed counts") {
    val m = NgramLm.train(corpus).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // (a,b): (1+1)·1e9 div (3+1·2) = 400000000
    assert(m(("a", "b")) == ((1L, 3L, 400000000L)))
    // (b,a): (2+1)·1e9 div (2+1·2) = 750000000
    assert(m(("b", "a")) == ((2L, 2L, 750000000L)))
    assert(m.size == 2)
  }

  test("scoreDocs: per-doc integer ppb sums and mean transition prob") {
    val out = NgramLm.scoreDocs(corpus, corpus).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    // doc 1: (a,b)+(b,a) = 400000000 + 750000000
    assert(out(1L) == ((2L, 1150000000L, 575000000.0)))
    assert(out(2L) == ((1L, 750000000L, 750000000.0)))
  }

  test("scoreDocs: docs under two tokens score NULL, not a crash") {
    val eval = Seq((10L, "solo")).toDF("doc_id", "text")
    val row = NgramLm.scoreDocs(corpus, eval).collect().head
    assert(row.getLong(2) == 0L && row.getLong(3) == 0L && row.isNullAt(4))
  }

  test("scoreDocs: unseen words fall back to the smoothing floor") {
    val train = Seq((1L, "a b")).toDF("doc_id", "text") // V=2
    val eval = Seq((2L, "c c")).toDF("doc_id", "text")
    val row = NgramLm.scoreDocs(train, eval).collect().head
    // c unseen: (0+1)·1e9 div (0+1·2) = 500000000
    assert(row.getLong(2) == 1L && row.getLong(3) == 500000000L)
  }

  test("train: minPairCount prunes rare bigram types") {
    val m = NgramLm.train(corpus, minPairCount = 2L)
    assert(m.select("word_a", "word_b").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq == Seq(("b", "a")))
  }

  test("lm_score orders repetitive text above incoherent text") {
    // the quality-filter property: predictable transitions score higher
    val docs = Seq(
      (1L, "x y x y x y x y x y"),
      (2L, "q w e r t z u i o p")).toDF("doc_id", "text")
    val s = NgramLm.scoreDocs(docs, docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(s(1L) > s(2L))
  }
}
