package graft.operators

import graft.SparkSpec
import graft.functions.expressions.BpeKernel
import org.apache.spark.sql.functions._

/** BPE trainer + frozen-table encoder (Bpe.scala,
  * BpeExpressions.scala): merge-selection determinism and
  * tie-breaking, the left-to-right non-overlapping merge pass, the
  * shipped DefaultMerges table, and codegen/interpreted parity of the
  * native kernel. */
class BpeSpec extends SparkSpec {

  private def enc(word: String, merges: Seq[(String, String)]): String =
    BpeKernel.encodeWord(word,
      merges.map(_._1).toArray, merges.map(_._2).toArray).mkString("|")

  test("encodeWord is a left-to-right non-overlapping fold per pass") {
    // one pass of (a,a) on "aaaa": positions 0+1 merge, 2+3 merge —
    // the merged tail "aa" does not re-merge with the next single 'a'
    assert(enc("aaaa", Seq("a" -> "a")) === "aa|aa")
    assert(enc("aaa", Seq("a" -> "a")) === "aa|a")
    // rank order matters: later rules see earlier rules' pieces
    assert(enc("abc", Seq("a" -> "b", "ab" -> "c")) === "abc")
    assert(enc("abc", Seq("b" -> "c", "a" -> "b")) === "a|bc")
    // single-char and empty words pass through untouched
    assert(enc("x", Seq("a" -> "b")) === "x")
    assert(enc("", Seq("a" -> "b")) === "")
  }

  test("train is deterministic and breaks count ties lexicographically") {
    import spark.implicits._
    // "ab" x2 and "cd" x2 tie at count 2 → ("a","b") < ("c","d") wins
    // first; doc_ids 0 and 5 both satisfy doc_id % 5 == 0
    val docs = Seq((0L, "ab cd ab cd"), (5L, "ef"))
      .toDF("doc_id", "text")
    val m1 = Bpe.train(docs, numMerges = 2, sampleMod = 5)
    val m2 = Bpe.train(docs, numMerges = 2, sampleMod = 5)
    assert(m1 === m2)
    assert(m1.head === ("a" -> "b"))
    assert(m1(1) === ("c" -> "d"))
  }

  test("train stops early when no pair repeats and respects the sample") {
    import spark.implicits._
    val docs = Seq((0L, "ab"), (1L, "zz zz zz")).toDF("doc_id", "text")
    // doc 1 is outside the doc_id % 5 == 0 sample: its repeated "zz"
    // must not contribute; doc 0 alone has no repeated pair
    assert(Bpe.train(docs, numMerges = 4, sampleMod = 5).isEmpty)
    // widening the sample to every doc picks up ("z","z")
    assert(Bpe.train(docs, numMerges = 4, sampleMod = 1).head === ("z" -> "z"))
  }

  test("train on the test corpus reproduces a frozen prefix deterministically") {
    val m = Bpe.train(tables.documents, numMerges = 4, sampleMod = 5)
    assert(m.length === 4)
    assert(m === Bpe.train(tables.documents, numMerges = 4, sampleMod = 5))
  }

  test("train's driver dictionary is capped at dictBudget words (top-K by count)") {
    import spark.implicits._
    // "aa" repeats 3×, "zz" 2×, plus a distinct-word tail. With
    // dictBudget = 1 only "aa" survives the distributed top-K, so the
    // (z, z) pair — which the full dictionary WOULD merge — must not
    // appear: proof the trainer never saw the words beyond the budget.
    val docs = Seq((0L, "aa aa aa zz zz q r s t u v w"))
      .toDF("doc_id", "text")
    val full = Bpe.train(docs, numMerges = 4, sampleMod = 1)
    assert(full.contains(("a", "a")) && full.contains(("z", "z")))
    val capped = Bpe.train(docs, numMerges = 4, sampleMod = 1, dictBudget = 1)
    assert(capped === Seq(("a", "a")))
    // the budget is a cap, not a quota: a corpus smaller than the
    // budget trains identically to the unbounded default
    assert(Bpe.train(docs, numMerges = 4, sampleMod = 1,
      dictBudget = 1 << 20) === full)
  }

  test("trainDistributed equals the driver trainer on an uncapped dictionary") {
    import spark.implicits._
    val docs = Seq((0L, "low lower lowest low low"),
      (5L, "new newer newest new low"), (7L, "outside the sample"))
      .toDF("doc_id", "text")
    val drv = Bpe.train(docs, numMerges = 6, sampleMod = 5,
      dictBudget = 1 << 20)
    val dist = Bpe.trainDistributed(docs, numMerges = 6, sampleMod = 5)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(dist === drv)
    // early stop: a sample with no repeated pair yields an empty table
    val none = Seq((0L, "ab")).toDF("doc_id", "text")
    assert(Bpe.trainDistributed(none, numMerges = 3, sampleMod = 1)
      .count() === 0L)
  }

  test("trainDistributed on the test corpus matches the driver trainer") {
    // same selection rule, same fold — the distributed rounds must
    // reproduce the driver loop verbatim when the driver dictionary
    // is uncapped (pair counts are identical multisets)
    val drv = Bpe.train(tables.documents, numMerges = 6, sampleMod = 5,
      dictBudget = 1 << 20)
    val dist = Bpe.trainDistributed(tables.documents, numMerges = 6,
      sampleMod = 5)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(dist === drv)
  }

  test("encode output is consistent: piece counts re-derivable from text") {
    val out = Bpe.encode(tables.documents).cache()
    try {
      assert(out.count() === tables.documents.count())
      // every piece count equals the split of the encoded text, and
      // merging can only shrink the piece count from the char count
      val bad = out
        .join(tables.documents.select(col("doc_id"), col("text")), "doc_id")
        .filter(
          size(split(col("encoded_text"), "[ |]")).cast("long") =!= col("n_pieces") ||
          col("n_pieces") > length(regexp_replace(col("text"), " ", "")) ||
          col("n_pieces") < col("n_words"))
      assert(bad.count() === 0)
    } finally out.unpersist()
  }

  test("fertility aggregates encode's piece counts per language") {
    import org.apache.spark.sql.functions._
    val out = Bpe.fertility(tables.documents).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // cross-check against the per-doc encode joined with lang
    val expected = Bpe.encode(tables.documents)
      .join(tables.documents.select("doc_id", "lang"), "doc_id")
      .groupBy("lang")
      .agg(count(lit(1)).as("d"), sum("n_words").as("w"),
        sum("n_pieces").as("p"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out.keySet == expected.keySet)
    out.foreach { case (lang, (d, w, p, f)) =>
      assert(expected(lang) == ((d, w, p)))
      // each word is at least one piece
      assert(f >= 1.0 && f == p.toDouble / w)
    }
  }

  test("bpe encode survives codegen and interpreted paths identically") {
    val df = Bpe.encode(tables.documents.limit(20))
    val withCodegen = df.collect().toSeq
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interpreted = Bpe.encode(tables.documents.limit(20)).collect().toSeq
      assert(withCodegen.zip(interpreted).forall { case (a, b) => a == b })
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }
}
