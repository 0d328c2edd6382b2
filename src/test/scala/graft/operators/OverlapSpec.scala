package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class OverlapSpec extends SparkSpec {

  /** Three sources with a planted overlap structure: a∩b = 2 docs of
    * a 6-doc union, c disjoint; a also carries an internal exact dup
    * that must NOT inflate its mass. */
  private def corpus: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "shared one", "a"), (2L, "shared two", "a"),
      (3L, "only a", "a"), (4L, "only a too", "a"),
      (5L, "only a too", "a"), // exact dup inside a
      (6L, "shared one", "b"), (7L, "shared two", "b"),
      (8L, "only b", "b"), (9L, "second b", "b"),
      (10L, "c alone", "c")
    ).toDF("doc_id", "text", "source")
  }

  test("sourceOverlap: planted intersection, internal dups collapsed, " +
    "disjoint pair reports zero") {
    val out = Overlap.sourceOverlap(corpus, k = 128).collect()
      .map(r => (r.getAs[String]("source_a"),
        r.getAs[String]("source_b")) -> r).toMap
    assert(out.size == 3)
    val ab = out(("a", "b"))
    assert(ab.getAs[Long]("n_a") == 4L, "dup inside a collapses")
    assert(ab.getAs[Long]("n_b") == 4L)
    assert(ab.getAs[Long]("n_inter") == 2L)
    assert(ab.getAs[Long]("jaccard_ppm") == 2000000L / 6L)
    val ac = out(("a", "c"))
    assert(ac.getAs[Long]("n_inter") == 0L &&
      ac.getAs[Long]("jaccard_ppm") == 0L)
  }

  test("sourceOverlap: k >= union size makes the KMV estimate exact") {
    val out = Overlap.sourceOverlap(corpus, k = 128).collect()
    for (r <- out) {
      assert(r.getAs[Long]("kmv_est_ppm") == r.getAs[Long]("jaccard_ppm"),
        s"${r.getAs[String]("source_a")}-${r.getAs[String]("source_b")}: " +
          "with the whole universe in the signature the coincidence " +
          "estimator degenerates to the exact Jaccard")
      assert(r.getAs[Long]("kmv_err_ppm") == 0L)
    }
  }

  test("kminShard merge is EXACT: shards from any split fold to the " +
    "one-shot signatures and the same estimate") {
    val d = tables.documents
    val k = 16
    val parts = (0L until 3L).map(i =>
      Overlap.kminShard(d.filter(col("doc_id") % 3 === i), k))
    val merged = Overlap.kmvEstimateFromShards(
      parts.reduce(_ unionByName _), k).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("m"), r.getAs[Long]("m_both"),
          r.getAs[Long]("kmv_est_ppm")))).toMap
    val direct = Overlap.kmvEstimateFromShards(Overlap.kminShard(d, k), k)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("m"), r.getAs[Long]("m_both"),
          r.getAs[Long]("kmv_est_ppm")))).toMap
    assert(merged.nonEmpty)
    assert(merged == direct,
      "k-min is an order statistic — the shard merge must be exact")
  }

  test("sourceOverlap: small-k estimate stays a valid ppm and the " +
    "error column is consistent on the real corpus") {
    val out = Overlap.sourceOverlap(tables.documents, k = 16).collect()
    assert(out.nonEmpty)
    for (r <- out) {
      val est = r.getAs[Long]("kmv_est_ppm")
      val exact = r.getAs[Long]("jaccard_ppm")
      assert(est >= 0L && est <= 1000000L)
      assert(r.getAs[Long]("kmv_err_ppm") == math.abs(est - exact))
      val (na, nb, ni) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
        r.getAs[Long]("n_inter"))
      assert(ni <= math.min(na, nb))
      assert(exact == ni * 1000000L / (na + nb - ni))
    }
  }
}
