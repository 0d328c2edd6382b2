package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ImportanceSpec extends SparkSpec {

  private def docs(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang")
  }

  test("dsir: target-typical docs out-score off-target docs") {
    // target (en) docs share the bigram vocabulary "alpha beta ...";
    // the zz docs live in a disjoint bigram space
    val d = docs(
      (0L until 6L).map(i => (i, "alpha beta gamma delta", "en")) ++
      (6L until 12L).map(i => (i, "zig zag zip zap", "zz")))
    val out = Importance.dsirResample(d, "lang", "en", buckets = 1024,
      salt = "t").collect().map(r =>
        r.getAs[Long]("doc_id") -> r.getAs[Long]("keep_prob_ppm")).toMap
    val enMin = (0L until 6L).map(out).min
    val zzMax = (6L until 12L).map(out).max
    assert(enMin > zzMax,
      s"target docs must out-score off-target: en min $enMin vs zz max $zzMax")
    // a purely-target-exclusive doc saturates the cap
    assert(enMin <= 1000000L && (0L until 6L).map(out).max == 1000000L)
  }

  test("dsir: sub-bigram docs get zero features and are never kept") {
    val d = docs(Seq((1L, "one", "en"), (2L, "", "en"),
      (3L, "a b c", "en")))
    val rows = Importance.dsirResample(d, "lang", "en")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    Seq(1L, 2L).foreach { id =>
      assert(rows(id).getAs[Long]("n_feats") == 0L)
      assert(rows(id).getAs[Long]("keep_prob_ppm") == 0L)
      assert(!rows(id).getAs[Boolean]("kept"))
    }
    assert(rows(3L).getAs[Long]("n_feats") == 2L)
  }

  test("dsirMixReport: a distinct target vocabulary pulls the mix " +
    "toward the target; no signal → no skew") {
    // constructed corpus with a REAL distributional difference
    val d = docs(
      (0L until 6L).map(i => (i, "alpha beta gamma delta", "en")) ++
      (6L until 18L).map(i => (i, "zig zag zip zap", "zz")))
    val rep = Importance.dsirMixReport(d, "lang", "en", 1024, "t")
      .collect().map(r => r.getAs[String]("lang") -> r).toMap
    assert(rep("en").getAs[Long]("share_after_ppm") >
      rep("en").getAs[Long]("share_before_ppm"),
      s"target share must rise on separable data: $rep")
    // shares are ppm partitions (integer-div undershoot ≤ #langs)
    val after = rep.values.map(_.getAs[Long]("share_after_ppm")).sum
    assert(after > 1000000L - rep.size && after <= 1000000L)
    // the driver-synthesized corpus shares ONE word pool across langs
    // — no distributional signal, so DSIR must NOT manufacture skew:
    // target share stays within noise of its input share
    val real = Importance.dsirMixReport(tables.documents)
      .collect().map(r => r.getAs[String]("lang") -> r).toMap
    val en = real("en")
    assert(en.getAs[Long]("share_after_ppm") >=
      en.getAs[Long]("share_before_ppm") - 20000L,
      s"no-signal corpus must not lose target mass: $en")
    assert(real.values.forall(r =>
      r.getAs[Long]("n_kept") <= r.getAs[Long]("n_docs")))
  }

  test("dsir: every doc emits exactly one row and probs stay in [0, 1e6]") {
    val out = Importance.dsirResample(tables.documents)
    assert(out.count() == tables.documents.count())
    assert(out.filter(col("keep_prob_ppm") < 0 ||
      col("keep_prob_ppm") > 1000000L).count() == 0)
    // kept ≡ the salted-hash Bernoulli below keep_prob (re-derivable)
    assert(out.filter(col("kept") && col("keep_prob_ppm") === 0L)
      .count() == 0)
  }
}
