package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusCleanSpec extends SparkSpec {

  import spark.implicits._

  test("chunked splits into fixed-width token chunks, short tail kept") {
    val docs = Seq((1L, "a b c d e f g"), (2L, "x y")).toDF("doc_id", "text")
    val out = CorpusClean.chunked(docs, 3).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L) == Seq("a b c", "d e f", "g"))
    assert(out(2L) == Seq("x y"))
  }

  test("chunk reassembly round-trips the original text") {
    val out = CorpusClean.intraDocDedup(tables.documents, chunkTokens = 7)
      .join(tables.documents, "doc_id")
      .filter(col("n_chunks") === col("n_chunks_kept") &&
        col("text_clean") =!= col("text"))
    // no natural intra-doc chunk repeats in this corpus → text_clean
    // must equal text for every fully-kept doc
    assert(out.count() == 0)
  }

  private val bothPaths = Seq(
    "broadcast" -> CorpusClean.BannedSetPath.Broadcast,
    "antijoin" -> CorpusClean.BannedSetPath.AntiJoin)

  for ((label, path) <- bothPaths) {
    test(s"paragraphDedup [$label] strips corpus-repeated chunks from every doc") {
      val docs = Seq(
        (1L, "common header tokens here unique body one two three"),
        (2L, "common header tokens here another body four five six"),
        (3L, "totally different text with no shared paragraph at all"))
        .toDF("doc_id", "text")
      val out = CorpusClean.paragraphDedup(docs, chunkTokens = 4,
        maxFreq = 1, path = path)
        .collect().map(r => r.getLong(0) ->
          (r.getString(1), r.getLong(2), r.getLong(3))).toMap
      // the 4-token chunk "common header tokens here" occurs in docs 1+2
      assert(out(1L)._1 == "unique body one two three")
      assert(out(2L)._1 == "another body four five six")
      assert(out(3L)._1 == "totally different text with no shared paragraph at all")
      assert(out(1L)._2 == 3 && out(1L)._3 == 2)
    }

    test(s"paragraphDedup [$label] keeps a doc row even when every chunk is banned") {
      val docs = Seq(
        (1L, "all banned text"), (2L, "all banned text"))
        .toDF("doc_id", "text")
      val out = CorpusClean.paragraphDedup(docs, chunkTokens = 3,
        maxFreq = 1, path = path)
        .orderBy("doc_id").collect()
      assert(out.length == 2)
      assert(out.forall(r => r.getString(1) == "" && r.getLong(3) == 0L))
    }
  }

  test("paragraphDedup physical paths agree row-for-row on the test corpus") {
    val broadcast = CorpusClean.paragraphDedup(tables.documents,
      path = CorpusClean.BannedSetPath.Broadcast)
    val antijoin = CorpusClean.paragraphDedup(tables.documents,
      path = CorpusClean.BannedSetPath.AntiJoin)
    assert(broadcast.exceptAll(antijoin).count() == 0)
    assert(antijoin.exceptAll(broadcast).count() == 0)
  }

  test("paragraphDedup Auto picks by banned-set size") {
    // limit 0 forces the anti-join arm; a huge limit forces broadcast —
    // both must agree with each other (Auto is a pure dispatcher)
    val viaTiny = CorpusClean.paragraphDedup(tables.documents,
      path = CorpusClean.BannedSetPath.Auto(broadcastLimit = 0))
    val viaHuge = CorpusClean.paragraphDedup(tables.documents,
      path = CorpusClean.BannedSetPath.Auto(broadcastLimit = Long.MaxValue))
    assert(viaTiny.exceptAll(viaHuge).count() == 0)
  }

  test("intraDocDedup keeps first occurrence, preserves order") {
    val docs = Seq(
      (1L, "a b a b c d a b"), // chunks of 2: [a b][a b][c d][a b]
      (2L, "x y z w"))
      .toDF("doc_id", "text")
    val out = CorpusClean.intraDocDedup(docs, chunkTokens = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == (("a b c d", 4L, 2L)))
    assert(out(2L) == (("x y z w", 2L, 2L)))
  }

  test("paragraphDedup affects the near-dup families in the test corpus") {
    val out = CorpusClean.paragraphDedup(tables.documents,
      chunkTokens = 20, maxFreq = 1)
    assert(out.filter(col("n_chunks_kept") < col("n_chunks")).count() > 0)
  }

  test("boilerplatePerSource bans within a source, never across sources") {
    val docs = Seq(
      // site1's cookie banner appears in 3 of its docs (> maxDocs=2)
      (1L, "accept all cookies body one two", "site1"),
      (2L, "accept all cookies body three four", "site1"),
      (3L, "accept all cookies body five six", "site1"),
      // the SAME chunk on site2 is below site2's own threshold → kept
      (4L, "accept all cookies body seven eight", "site2"))
      .map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = CorpusClean.boilerplatePerSource(docs, chunkTokens = 3,
        maxDocs = 2).collect()
      .map(r => r.getLong(0) -> r).toMap
    // site1 docs lose exactly the banner chunk ("accept all cookies")
    Seq(1L, 2L, 3L).foreach { id =>
      val r = out(id)
      assert(r.getAs[Long]("n_chunks") == 2 &&
        r.getAs[Long]("n_chunks_kept") == 1)
      assert(!r.getAs[String]("text_clean").contains("accept"))
    }
    // site2's copy survives untouched
    assert(out(4L).getAs[String]("text_clean") ==
      "accept all cookies body seven eight")
    assert(out(4L).getAs[Long]("n_chunks_kept") == 2)
  }

  test("boilerplatePerSource counts DISTINCT docs, not raw occurrences") {
    // one doc repeating a chunk 3× is NOT cross-document template
    val docs = Seq(
      (1L, "la la la la la la", "site1"),  // chunk "la la" × 3, 1 doc
      (2L, "other words entirely here now", "site1"))
      .map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = CorpusClean.boilerplatePerSource(docs, chunkTokens = 2,
        maxDocs = 1).collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n_chunks_kept") == 3 &&
      out(1L).getAs[String]("text_clean") == "la la la la la la")
  }
}
