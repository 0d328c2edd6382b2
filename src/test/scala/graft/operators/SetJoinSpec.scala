package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SetJoinSpec extends SparkSpec {

  private def shingleSet(text: String, k: Int = 3): Set[String] = {
    val toks = text.split(" ")
    if (toks.length >= k) toks.sliding(k).map(_.mkString(" ")).toSet
    else Set(toks.mkString(" "))
  }

  private def naive(rows: Seq[(Long, String)], k: Int,
                    tNum: Int, tDen: Int): Set[(Long, Long, Long, Long)] =
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows
      if ia < ib
      inter = (shingleSet(sa, k) & shingleSet(sb, k)).size.toLong
      uni = (shingleSet(sa, k) | shingleSet(sb, k)).size.toLong
      if inter * tDen >= uni * tNum
    } yield (ia, ib, inter, uni)).toSet

  private def run(rows: Seq[(Long, String)], k: Int = 3,
                  tNum: Int = 1, tDen: Int = 2): Set[(Long, Long, Long, Long)] = {
    import spark.implicits._
    val df = rows.toDF("doc_id", "text")
    SetJoin.similarityJoinExact(df, k, tNum, tDen).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
  }

  private val corpus = Seq(
    1L -> "the quick brown fox jumps over the lazy dog",
    2L -> "the quick brown fox jumps over the lazy cat",
    3L -> "the quick brown fox leaps over the lazy dog",
    4L -> "an entirely different document about spark engines",
    5L -> "an entirely different document about spark planes",
    6L -> "the quick brown fox jumps over the lazy dog",
    7L -> "short doc",
    8L -> "short doc",
    9L -> "tiny")

  test("prefix-filter join equals the naive all-pairs join at t=0.5") {
    assert(run(corpus) == naive(corpus, 3, 1, 2))
  }

  test("complete at a low and a high threshold") {
    assert(run(corpus, tNum = 3, tDen = 10) == naive(corpus, 3, 3, 10))
    assert(run(corpus, tNum = 9, tDen = 10) == naive(corpus, 3, 9, 10))
  }

  test("identical docs pair at jaccard exactly 1.0") {
    import spark.implicits._
    val out = SetJoin.similarityJoinExact(
      corpus.toDF("doc_id", "text"), 3, 1, 2)
    val dup = out.filter(col("a_id") === 1 && col("b_id") === 6)
      .collect()
    assert(dup.length == 1 && dup.head.getAs[Double]("jaccard") == 1.0)
    // sub-k docs fall back to the whole-doc shingle: 7/8 are equal
    // single-element sets, 9 shares nothing
    assert(out.filter(col("a_id") === 7 && col("b_id") === 8).count() == 1)
    assert(out.filter(col("a_id") === 9 || col("b_id") === 9).count() == 0)
  }

  test("exact join is the LSH recall ground truth: LSH pairs are a subset") {
    val exact = SetJoin.similarityJoinExact(tables.documents, 3, 1, 2)
      .select(col("a_id"), col("b_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLsh(tables.documents, shingleK = 3,
      numPerm = 64, bands = 16, threshold = 0.5)
      .select(least(col("id_a"), col("id_b")),
        greatest(col("id_a"), col("id_b"))).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact),
      s"LSH emitted pairs the exact join rejects: ${lsh.diff(exact)}")
    // on this corpus the banded sketch achieves full recall — the
    // audit this operator exists to measure
    assert(exact == lsh)
  }
}
