package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-based bigram language model for corpus quality scoring — the
  * classic "train a cheap LM on the corpus (or a trusted reference
  * corpus), score every document, filter the tail" pretraining-data
  * signal (CCNet/KenLM-style, with counts instead of a trained model).
  *
  * Determinism across engines (the repo-wide rule: no `ln`, no
  * order-dependent float sums): the smoothed transition probability is
  * materialized as an INTEGER parts-per-billion value
  * `p_ppb = ((c_ab + k) · 10⁹) div (c_a + k·V)` — integer arithmetic
  * end-to-end (widened through decimal so the multiply can't wrap),
  * so per-document sums are order-independent and the only IEEE step
  * is one final division. The resulting `lm_score` is the arithmetic
  * mean transition probability — a monotone quality signal like
  * perplexity's geometric mean, chosen because logs are not
  * bit-reproducible across engines while integer ratios are.
  *
  * Scale shape: unigram and bigram counts are vocabulary-keyed
  * shuffles with map-side partial aggregation (|vocab| and |bigram
  * types| rows — never corpus-sized); the vocab-size scalar rides as a
  * broadcast; scoring joins the exploded bigram stream against those
  * count frames on their natural keys (plain shuffle joins — at 100 TB
  * the bigram-type frame is too big to broadcast and co-partitions
  * with the stream instead). No collect, no all-pairs, no global sort.
  */
object NgramLm {

  private def toks(text: Column): Column = split(text, " ")

  /** Adjacent-pair stream `(word_a, word_b)` per doc (docs under two
    * tokens contribute nothing). */
  private def bigrams(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), toks(col("text")).as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(w) - 2), " +
          "i -> struct(w[i] as word_a, w[i+1] as word_b))")).as("p"))
      .select(col("doc_id"), col("p.word_a"), col("p.word_b"))

  private def uniCounts(documents: DataFrame): DataFrame =
    documents.select(explode(toks(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("c_w"))

  /** The add-k smoothed probability in integer ppb, computed over
    * named columns `num`/`den` staged by the callers. `num` is widened
    * to decimal(38,0) so a 100 TB-scale bigram count times 10⁹ cannot
    * wrap; `div` (integral divide) lands back in LONG. */
  private def numDen(cAb: Column, cA: Column, v: Column, addK: Long) = Seq(
    ((cAb + addK).cast("decimal(38,0)") * lit(1000000000L)).as("num"),
    (cA + lit(addK) * v).as("den"))

  /** Train the bigram model: one row per observed bigram with its
    * count, the left-word unigram count, and the smoothed `p_ppb`.
    * `minPairCount` prunes rare bigram types (model-size control at
    * scale — the full type table is Zipf-heavy-tailed). */
  def train(documents: DataFrame, addK: Long = 1L,
            minPairCount: Long = 1L): DataFrame = {
    require(addK >= 1, "add-k smoothing needs k >= 1")
    val uni = uniCounts(documents)
    val v = uni.agg(count(lit(1)).as("v"))
    bigrams(documents)
      .groupBy("word_a", "word_b").agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minPairCount)
      .join(uni.select(col("word").as("word_a"), col("c_w").as("c_a")),
        "word_a")
      .crossJoin(broadcast(v))
      .select(Seq(col("word_a"), col("word_b"), col("c_ab"), col("c_a")) ++
        numDen(col("c_ab"), col("c_a"), col("v"), addK): _*)
      .withColumn("p_ppb", expr("num div den"))
      .drop("num", "den")
  }

  /** Score `eval` documents under the model counted from `train`:
    * per-doc bigram count, integer sum of transition ppb, and the mean
    * transition probability `lm_score` (higher = more predictable
    * text; docs under two tokens score NULL). Left joins + coalesce
    * make unseen words/bigrams fall back to the smoothing floor, so
    * scoring a held-out corpus is well-defined. */
  def scoreDocs(train: DataFrame, eval: DataFrame,
                addK: Long = 1L): DataFrame = {
    require(addK >= 1, "add-k smoothing needs k >= 1")
    val uni = uniCounts(train)
    val v = uni.agg(count(lit(1)).as("v"))
    val bi = bigrams(train)
      .groupBy("word_a", "word_b").agg(count(lit(1)).as("c_ab"))
    val scored = bigrams(eval)
      .join(bi, Seq("word_a", "word_b"), "left")
      .join(uni.select(col("word").as("word_a"), col("c_w")), Seq("word_a"),
        "left")
      .crossJoin(broadcast(v))
      .select(col("doc_id") +: numDen(coalesce(col("c_ab"), lit(0L)),
        coalesce(col("c_w"), lit(0L)), col("v"), addK): _*)
      .select(col("doc_id"), expr("num div den").as("p"))
    val agg = scored.groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("p")).as("sum_p_ppb"))
    eval.select(col("doc_id"),
        size(toks(col("text"))).cast("long").as("n_tokens"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("sum_p_ppb"), lit(0L)).as("sum_p_ppb"))
      .withColumn("lm_score",
        when(col("n_bigrams") > 0,
          col("sum_p_ppb").cast("double") / col("n_bigrams")))
  }
}
