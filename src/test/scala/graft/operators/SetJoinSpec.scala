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

  test("lshRecallAudit reports full recall on the test corpus") {
    val r = SetJoin.lshRecallAudit(tables.documents).collect().head
    val (ne, nl, nc) = (r.getAs[Long]("n_exact"), r.getAs[Long]("n_lsh"),
      r.getAs[Long]("n_common"))
    assert(ne > 0 && ne == nl && nl == nc)
    assert(r.getAs[Double]("recall") == 1.0)
  }

  test("lshRecallAudit measures a real miss under a starved sketch") {
    import spark.implicits._
    // two docs sharing ~5/9 shingles (J ≈ 0.56 ≥ 0.5): ONE band of 16
    // rows matches with probability J^16 — this sketch misses the pair
    // while the exact join finds it; recall is the number that says so
    val df = Seq(
      1L -> "a b c d e f g h i j k",
      2L -> "a b c d e f g h i x y").toDF("doc_id", "text")
    val starved = SetJoin.lshRecallAudit(df, shingleK = 3, numPerm = 16,
      bands = 1, tNum = 1, tDen = 2).collect().head
    assert(starved.getAs[Long]("n_exact") == 1)
    assert(starved.getAs[Long]("n_common") == 0)
    assert(starved.getAs[Double]("recall") == 0.0)
    // the shipped configuration (16 bands of 4) catches the same pair
    val healthy = SetJoin.lshRecallAudit(df, shingleK = 3, numPerm = 64,
      bands = 16, tNum = 1, tDen = 2).collect().head
    assert(healthy.getAs[Double]("recall") == 1.0)
  }

  test("empty corpus: recall is NULL, counts are zero") {
    import spark.implicits._
    val r = SetJoin.lshRecallAudit(
      Seq.empty[(Long, String)].toDF("doc_id", "text")).collect().head
    assert(r.getAs[Long]("n_exact") == 0 && r.getAs[Long]("n_lsh") == 0)
    assert(r.isNullAt(r.fieldIndex("recall")))
  }

  test("sweepRecall: verified pairs are a ground-truth subset per config, " +
       "recall rises with finer banding, shipped config matches the audit") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_sweeprec").toString
    val docs = tables.documents
    val rows = SetJoin.sweepRecall(docs, dir).collect()
      .map(r => r.getAs[Int]("bands") -> r).toMap
    assert(rows.keySet == Set(8, 16, 32))
    val nExact = rows(8).getAs[Long]("n_exact")
    rows.values.foreach { r =>
      // LSH verifies TRUE Jaccard at the same threshold, so its pair
      // set is a subset of the exact ground truth: common == lsh
      assert(r.getAs[Long]("n_common") == r.getAs[Long]("n_lsh"))
      assert(r.getAs[Long]("n_exact") == nExact)
      if (nExact > 0)
        assert(r.getAs[Double]("recall") ==
          r.getAs[Long]("n_common").toDouble / nExact)
    }
    // finer banding can only ADD candidates → verified recall is
    // monotone non-decreasing 8 → 16 → 32
    if (nExact > 0) {
      val rec = Seq(8, 16, 32).map(b => rows(b).getAs[Double]("recall"))
      assert(rec(0) <= rec(1) && rec(1) <= rec(2), s"recall not monotone: $rec")
    }
    // the 16-band row IS lshRecallAudit's summary
    val audit = SetJoin.lshRecallAudit(docs).collect().head
    assert(rows(16).getAs[Long]("n_lsh") == audit.getAs[Long]("n_lsh"))
    assert(rows(16).getAs[Long]("n_common") == audit.getAs[Long]("n_common"))
  }
}
