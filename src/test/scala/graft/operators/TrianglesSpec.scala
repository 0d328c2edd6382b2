package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TrianglesSpec extends SparkSpec {

  private def run(docs: Seq[String]): Map[String, (Long, Long, Double)] = {
    import spark.implicits._
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    Triangles.wordTriangles(df).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("deg"), r.getAs[Long]("n_tri"),
          r.getAs[Double]("clustering"))).toMap
  }

  test("one triangle plus a pendant vertex, hand-computed") {
    // edges a-b, b-c, c-a (triangle) and c-d (pendant)
    val out = run(Seq("a b c a", "c d"))
    assert(out("a") == (2L, 1L, 1.0))
    assert(out("b") == (2L, 1L, 1.0))
    assert(out("c") == (3L, 1L, 1.0 / 3.0))
    assert(out("d") == (1L, 0L, 0.0))
  }

  test("every triangle of K4 is found exactly once per member") {
    // complete graph on 4 vertices: C(4,3)=4 triangles, each vertex
    // in 3 of them; deg 3 each → clustering 1.0
    val out = run(Seq("p q", "p r", "p s", "q r", "q s", "r s"))
    assert(out.size == 4)
    assert(out.values.forall(_ == (3L, 3L, 1.0)))
  }

  test("a skewed hub double-counts nothing under orientation") {
    // hub h with 6 leaves; leaves l1-l2 and l3-l4 connected: exactly
    // two triangles through the hub, no phantom wedge closures
    val out = run(Seq("h l1", "h l2", "h l3", "h l4", "h l5", "h l6",
      "l1 l2", "l3 l4"))
    assert(out("h") == (6L, 2L, 2.0 * 2.0 / (6.0 * 5.0)))
    assert(out("l1") == (2L, 1L, 1.0) && out("l4") == (2L, 1L, 1.0))
    assert(out("l5") == (1L, 0L, 0.0))
  }

  test("matches a naive in-process count on the real corpus") {
    val docs = tables.documents.select("text").collect()
      .map(_.getString(0)).toSeq
    val edges = docs.flatMap { t =>
      val w = t.split(" ")
      w.sliding(2).filter(p => p.length == 2 && p(0) != p(1))
        .map(p => (Seq(p(0), p(1)).min, Seq(p(0), p(1)).max))
    }.toSet
    val adj = edges.toSeq.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val naiveTri = adj.map { case (v, ns) =>
      v -> ns.toSeq.combinations(2)
        .count(p => edges.contains((p.min, p.max)))
    }
    val out = run(docs)
    assert(out.nonEmpty)
    out.foreach { case (w, (deg, ntri, _)) =>
      assert(deg == adj(w).size.toLong, s"deg mismatch at $w")
      assert(ntri == naiveTri(w).toLong, s"tri mismatch at $w")
    }
  }
}
