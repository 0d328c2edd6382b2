package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextRankSpec extends SparkSpec {

  private def ranks(docs: Seq[String], iters: Int = 3): Map[String, (Long, Long)] = {
    import spark.implicits._
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    TextRank.textRank(df, iters).collect()
      .map(r => r.getAs[String]("word") ->
        (r.getAs[Long]("deg"), r.getAs[Long]("rank_ppb"))).toMap
  }

  test("hand-computed integer fixpoint on the 3-word path graph") {
    // "a b" + "b c" → symmetric edges a-b, b-c; deg a=1 b=2 c=1; N=3
    //   rank0 = 1e9 div 3 = 333333333, base = 15e7 div 3 = 50000000
    //   iter1: s_a = 333333333 div 2 = 166666666
    //          s_b = 333333333 + 333333333 = 666666666
    //   r_a = 5e7 + (85·166666666) div 100 = 191666666
    //   r_b = 5e7 + (85·666666666) div 100 = 616666666
    val out = ranks(Seq("a b", "b c"), iters = 1)
    assert(out("a") == (1L, 191666666L))
    assert(out("b") == (2L, 616666666L))
    assert(out("c") == (1L, 191666666L))
  }

  test("hub outranks leaves; structural symmetry is exact") {
    // star: h adjacent to 4 distinct leaves — the hub accumulates all
    // leaf mass while each leaf gets back only a quarter of the hub's
    val out = ranks(Seq("h l1", "h l2", "h l3", "h l4"))
    val hub = out("h")._2
    val leaves = Seq("l1", "l2", "l3", "l4").map(out(_)._2)
    assert(leaves.forall(_ < hub))
    // identical structural position → bit-identical integer score
    assert(leaves.distinct.size == 1)
  }

  test("structure beats raw frequency") {
    // "x" is frequent but only ever adjacent to itself-free repetition
    // of one partner; "k" is rare but adjacent to three distinct hub
    // words that each carry mass from elsewhere
    val out = ranks(Seq(
      "x y", "x y", "x y", "x y",
      "k a", "k b", "k c",
      "a m", "b m", "c m"))
    assert(out("k")._1 == 3 && out("x")._1 == 1)
    assert(out("k")._2 > out("x")._2)
  }

  test("self-pairs drop, short docs contribute no edges, deg-0 words keep base rank") {
    val out = ranks(Seq("a a a", "b", "c d"))
    // "a a a" yields only self-pairs → a has no edges; "b" is a
    // 1-token doc → no pairs; both stay vertices at degree 0
    assert(out("a")._1 == 0 && out("b")._1 == 0)
    assert(out("c")._1 == 1 && out("d")._1 == 1)
    // N=4: base = 150000000 div 4; a deg-0 word never receives mass,
    // so after any iteration count its rank is exactly the base
    assert(out("a")._2 == 37500000L)
    assert(out("a")._2 == out("b")._2)
  }

  test("empty corpus returns an empty frame with the contract schema") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val out = TextRank.textRank(empty)
    assert(out.columns.toSeq == Seq("word", "deg", "rank_ppb"))
    assert(out.count() == 0)
  }

  test("fixed iteration count is bit-reproducible across runs") {
    val a = ranks(Seq("p q", "q r", "r s", "s p", "p r"))
    val b = ranks(Seq("p q", "q r", "r s", "s p", "p r"))
    assert(a == b)
  }
}
