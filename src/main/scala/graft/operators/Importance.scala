package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-STYLE importance resampling (after Xie et al. 2023): weight
  * every raw document by how target-like its hashed-n-gram profile
  * is, then keep each doc with probability proportional to that
  * weight — the standard recipe for skewing a 100 TB crawl toward a
  * curated target domain without training a classifier.
  *
  * NOT the paper's estimator, deliberately: DSIR proper scores a doc
  * by the PRODUCT of per-feature likelihood ratios between
  * separately-normalized target and raw bag-of-ngrams models (a
  * log-ratio SUM over occurrences), which rewards conjunctions of
  * target-typical features multiplicatively. This implementation
  * scores by the count-weighted arithmetic MEAN of per-bin smoothed
  * target-share ratios n_target/n_corpus — a mean-ratio variant
  * whose selection behavior differs materially on docs mixing very
  * target-typical and very atypical features (mean dampens what a
  * product amplifies). The trade is integer-exactness: the mean is
  * computable in pure 63-bit integer sums and reproduces bit-for-bit
  * in any engine, while a log-ratio sum needs a float log pipeline
  * whose rounding is engine-specific. Same monotone intent, different
  * estimator — cite accordingly.
  *
  * This implementation keeps the whole computation oracle-exact:
  * features are sha60-hashed bigram occurrences folded into
  * `buckets` counting bins; the per-bin importance ratio is
  * `(n_target+1) * 1e6 div (n_corpus+1)` (add-one smoothing, 63-bit
  * safe because n_target ≤ n_corpus); a doc's raw score is the
  * count-weighted mean ratio over its bigram occurrences (integer
  * sums — order-independent); and the keep probability normalizes
  * the raw score by the corpus-wide target share so a perfectly
  * target-typical doc sits at ppm 1e6. The keep decision itself is
  * the salted-hash Bernoulli used by corpus_sample — reproducible
  * in any engine, append-stable, no RNG state.
  *
  * Scale: one corpus scan builds (doc, bucket, cnt) via a map-side
  * combined groupBy; the bin table is ≤ `buckets` rows and
  * broadcasts back, so scoring is map-side; totals are a 1-row
  * broadcast cross join. Nothing driver-side, no all-pairs, and the
  * only wide exchange is keyed on (doc_id, bucket) — the same
  * cardinality the corpus itself has.
  */
object Importance {

  private def sha60(c: Column): Column =
    org.apache.spark.sql.graft.GraftBridge.column(
      graft.functions.expressions.Sha60(
        org.apache.spark.sql.graft.GraftBridge.expression(c)))

  /** DSIR-style importance resampling of `documents` toward the
    * sub-corpus where `targetCol = targetVal`. Emits one row per doc:
    * (doc_id, lang, n_feats, score_ppm, keep_prob_ppm, kept). */
  def dsirResample(documents: DataFrame, targetCol: String = "lang",
                   targetVal: String = "en", buckets: Int = 1024,
                   salt: String = "dsir"): DataFrame = {
    val isTarget = (col(targetCol) === lit(targetVal)).as("is_target")
    // hashed bigram OCCURRENCES (not distinct — DSIR weights by the
    // feature histogram): (doc, is_target, bucket) -> cnt
    val docBucket = documents
      .select(col("doc_id"), isTarget,
        split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("is_target"), explode(expr(
        """CASE WHEN size(toks) >= 2 THEN
             transform(sequence(1, size(toks) - 1),
               i -> concat(toks[i - 1], ' ', toks[i]))
           ELSE array() END""")).as("bg"))
      .select(col("doc_id"), col("is_target"),
        pmod(sha60(col("bg")), lit(buckets.toLong)).as("bucket"))
      .groupBy("doc_id", "is_target", "bucket")
      .agg(count(lit(1)).as("cnt"))
    // ≤ `buckets` rows: per-bin corpus and target occurrence mass
    val binStats = docBucket.groupBy("bucket")
      .agg(sum(col("cnt")).as("n_corpus"),
        sum(when(col("is_target"), col("cnt")).otherwise(0L))
          .as("n_target"))
      .withColumn("ratio_ppm",
        expr("(n_target + 1) * 1000000 div (n_corpus + 1)"))
    // corpus-wide target share (1 row, broadcast): the normalizer
    // that maps "exactly target-typical" to keep-prob 1e6
    val share = binStats
      .agg(sum(col("n_target")).as("t_mass"), sum(col("n_corpus")).as("s_mass"))
      .select(greatest(expr("t_mass * 1000000 div s_mass"), lit(1L))
        .as("share_ppm"))
    val scored = docBucket
      .join(broadcast(binStats.select("bucket", "ratio_ppm")), "bucket")
      .groupBy("doc_id")
      .agg(sum(col("cnt")).as("n_feats"),
        expr("sum(cnt * ratio_ppm)").as("mass"))
      .select(col("doc_id"), col("n_feats"),
        expr("mass div n_feats").as("score_ppm"))
    documents.select(col("doc_id"), col(targetCol))
      .join(scored, Seq("doc_id"), "left")
      .crossJoin(broadcast(share))
      .select(col("doc_id"), col(targetCol),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("score_ppm"), lit(0L)).as("score_ppm"),
        least(coalesce(expr("score_ppm * 1000000 div share_ppm"), lit(0L)),
          lit(1000000L)).as("keep_prob_ppm"))
      .withColumn("kept",
        pmod(sha60(concat(lit(s"$salt:"), col("doc_id").cast("string"))),
          lit(1000000L)) < col("keep_prob_ppm"))
  }

  /** The resampler's EFFECT, summarized: per language, corpus share
    * before vs after [[dsirResample]]'s keep decisions — the table
    * that shows how hard DSIR actually skewed the mix toward the
    * target (and what it did to every other language) before anyone
    * trains on the output. Exact integer ppm shares; totals are a
    * broadcast 1-row frame. */
  def dsirMixReport(documents: DataFrame, targetCol: String = "lang",
                    targetVal: String = "en", buckets: Int = 1024,
                    salt: String = "dsir"): DataFrame = {
    val scored = dsirResample(documents, targetCol, targetVal, buckets, salt)
    val perLang = scored.groupBy(targetCol)
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"))
    val totals = perLang.agg(sum(col("n_docs")).as("t_docs"),
      greatest(sum(col("n_kept")), lit(1L)).as("t_kept"))
    perLang.crossJoin(broadcast(totals))
      .select(col(targetCol), col("n_docs"), col("n_kept"),
        expr("n_kept * 1000000 div n_docs").as("kept_ppm"),
        expr("n_docs * 1000000 div t_docs").as("share_before_ppm"),
        expr("n_kept * 1000000 div t_kept").as("share_after_ppm"))
  }
}
