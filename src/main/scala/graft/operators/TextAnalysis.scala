package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.Materialize.Pinnable

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting.
  *
  * All map-only (no shuffle), all codegen'd `functions._` expressions
  * — at 100 TB these run at scan speed with filter/column pruning
  * reaching the parquet reader.
  */
object TextAnalysis {

  /** BPE-ish pre-tokenizer: letter runs | single digits | single
    * non-alnum. RE2-compatible (same semantics in the DuckDB oracle). */
  val BpePattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"

  private def wsTokens(text: Column): Column = split(text, " ")

  /** Whitespace + BPE-ish regex token counts per document. */
  def tokenCount(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"),
      size(wsTokens(col("text"))).cast("long").as("n_ws_tokens"),
      size(expr(s"regexp_extract_all(text, '$BpePattern', 0)"))
        .cast("long").as("n_bpe_tokens"),
      length(col("text")).cast("long").as("n_chars_measured"))

  /** Stopword list used by quality scoring + language ID. */
  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it")

  /** The Gopher rule battery's stopword set (Rae et al. 2021,
    * Appendix A): a doc must contain at least two of these. */
  val GopherStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-style quality rule battery (Rae et al. 2021, Appendix A —
    * the published heuristic filter set for web-scale pretraining
    * corpora): word-count bounds, mean-word-length bounds,
    * symbol-to-word ratio, alphabetic-word fraction, stopword
    * presence, ellipsis-line and bullet-line fractions. Every
    * threshold is applied by INTEGER cross-multiplication (3·n ≤ Σlen
    * instead of mean ≥ 3), so the booleans are bit-portable across
    * engines — no float division anywhere. One map-only projection;
    * the raw counters ship alongside the rules so a corpus report can
    * re-threshold without rescanning text. */
  def gopherRules(documents: DataFrame): DataFrame = {
    val counted = documents.select(col("doc_id"),
      expr("size(split(text, ' '))").cast("long").as("n_words"),
      expr("aggregate(transform(split(text, ' '), x -> length(x)), " +
        "0L, (a, x) -> a + x)").as("word_chars"),
      expr("""cast((length(text) - length(replace(text, '#'))) +
            (length(text) - length(replace(text, '…'))) +
            ((length(text) - length(replace(text, '...'))) div 3)
            as long)""").as("n_symbols"),
      expr("size(filter(split(text, ' '), x -> x rlike '[A-Za-z]'))")
        .cast("long").as("n_alpha_words"),
      GopherStops.map(w =>
          expr(s"cast(array_contains(split(text, ' '), '$w') as int)"))
        .reduce(_ + _).cast("long").as("n_stop_hits"),
      expr("size(split(text, '\\n'))").cast("long").as("n_lines"),
      expr("size(filter(split(text, '\\n'), x -> x like '%...'))")
        .cast("long").as("n_ellipsis_lines"),
      expr("size(filter(split(text, '\\n'), " +
        "x -> x like '- %' or x like '* %' or x like '• %'))")
        .cast("long").as("n_bullet_lines"))
    val rules = Seq(
      "r_word_count" ->
        (col("n_words") >= 50 && col("n_words") <= 100000),
      "r_mean_word_len" ->
        (lit(3) * col("n_words") <= col("word_chars") &&
          col("word_chars") <= lit(10) * col("n_words")),
      "r_symbol_ratio" -> (lit(10) * col("n_symbols") <= col("n_words")),
      "r_alpha_words" ->
        (lit(5) * col("n_alpha_words") >= lit(4) * col("n_words")),
      "r_stopwords" -> (col("n_stop_hits") >= 2),
      "r_ellipsis_lines" ->
        (lit(10) * col("n_ellipsis_lines") <= lit(3) * col("n_lines")),
      "r_bullet_lines" ->
        (lit(10) * col("n_bullet_lines") <= lit(9) * col("n_lines")))
    counted.select(
      (counted.columns.map(col) ++
        rules.map { case (n, c) => c.as(n) } :+
        rules.map(_._2).reduce(_ && _).as("pass")): _*)
  }

  /** Quality heuristics: length, punctuation ratio, stopword ratio,
    * mean token length, composite score. Single projection. */
  def quality(documents: DataFrame): DataFrame = {
    // stage 1 computes each counter ONCE (CollapseProject keeps
    // non-cheap expressions that are referenced multiple times in a
    // separate projection); stage 2 is pure arithmetic over them
    val counted = documents.select(col("doc_id"),
      length(col("text")).cast("double").as("n_chars_measured"),
      size(wsTokens(col("text"))).cast("double").as("n_tokens"),
      size(expr("regexp_extract_all(text, '[^A-Za-z0-9 ]', 0)"))
        .cast("double").as("n_punct"),
      org.apache.spark.sql.graft.GraftBridge.column(
        graft.functions.expressions.WordSetCount(
          org.apache.spark.sql.graft.GraftBridge.expression(
            wsTokens(col("text"))), Stopwords))
        .cast("double").as("n_stop"))
    val nTok = col("n_tokens")
    val nChars = col("n_chars_measured")
    val nPunct = col("n_punct")
    val nStop = col("n_stop")
    counted.select(col("doc_id"),
      nChars.as("n_chars_measured"),
      nTok.as("n_tokens"),
      (nPunct / nChars).as("punct_ratio"),
      (nStop / nTok).as("stopword_ratio"),
      ((nChars - nTok + 1) / nTok).as("mean_token_len"),
      // higher = better: long docs with few punct chars and a natural
      // stopword rate score high
      (least(nTok / 100.0, lit(1.0)) * (lit(1.0) - nPunct / nChars) *
        least(nStop / nTok * 4.0, lit(1.0))).as("quality_score"))
  }

  /** Calibration audit of the heuristic quality score against two
    * INDEPENDENT badness signals: do low-score buckets actually carry
    * more exact duplicates and more repetitive documents? Scores land
    * in 10 fixed-width bins (floor(score·10), capped at 9 — fixed
    * fences, so NO global sort, unlike rank deciles); per bin: doc
    * count, exact-duplicate members (content-hash group size > 1, the
    * dedup_exact grouping), repetitive members (the repetition gate's
    * own flag), and integer floor-ppm rates. A filter whose rates
    * don't fall as the score rises is mis-calibrated — this is the
    * evidence behind choosing quality_gate's threshold.
    *
    * Determinism: the score chain and the repetition flag are the
    * established bit-identical IEEE chains; binning is floor of
    * identical doubles; everything after is integer.
    * Scale: two map-only scorers joined doc_id-equi, one content-hash
    * groupBy (the dedup_exact shuffle), final ≤10-row aggregate. */
  def qualityCalibration(documents: DataFrame): DataFrame = {
    val bins = quality(documents).select(col("doc_id"),
      least(floor(col("quality_score") * lit(10.0)), lit(9L))
        .cast("long").as("score_bin"))
    val rep = repetition(documents).select(col("doc_id"),
      col("is_repetitive").cast("long").as("is_rep"))
    val hashes = documents.select(col("doc_id"),
      sha2(col("text"), 256).as("h"))
    val sizes = hashes.groupBy("h").agg(count(lit(1)).as("n_copies"))
    val dup = hashes.join(sizes, "h")
      .select(col("doc_id"), (col("n_copies") > 1).cast("long").as("is_dup"))
    bins.join(dup, "doc_id").join(rep, "doc_id")
      .groupBy("score_bin")
      .agg(count(lit(1)).as("n_docs"), sum("is_dup").as("n_dup"),
        sum("is_rep").as("n_repetitive"))
      .select(col("score_bin"), col("n_docs"), col("n_dup"),
        col("n_repetitive"),
        expr("(1000000 * n_dup) div n_docs").as("dup_ppm"),
        expr("(1000000 * n_repetitive) div n_docs").as("repetitive_ppm"))
  }

  /** Per-language marker profiles for the n-gram/stopword heuristic
    * language ID (deterministic, no model). */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is"),
    "de" -> Seq("der", "und", "die", "ist"),
    "es" -> Seq("el", "la", "de", "es"),
    "fr" -> Seq("le", "la", "et", "est"),
    "zh" -> Seq("de", "shi", "le", "bu"))

  /** Heuristic language ID: marker-hit counts per language, argmax
    * with lexicographic tie-break. Emits per-language scores too. */
  def langId(documents: DataFrame): DataFrame = {
    val scored = LangMarkers.foldLeft(
      documents.select(col("doc_id"), col("lang"), col("text"))) {
      case (df, (l, markers)) =>
        df.withColumn(s"score_$l",
          size(filter(wsTokens(col("text")), t => t.isInCollection(markers))))
    }
    val best = LangMarkers.map { case (l, _) =>
      struct(col(s"score_$l").as("s"), lit(l).as("l"))
    }
    scored.withColumn("predicted_lang",
      // argmax by (score, reverse-lexicographic lang) → greatest picks
      // highest score; ties resolve to lexicographically LAST lang —
      // deterministic either way
      greatest(best: _*).getField("l"))
      .drop("text")
  }

  /** Deterministic train/val/test assignment: the split is a pure
    * function of the document id's portable content hash, so it is
    * reproducible across runs, clusters, and engines — never
    * `df.sample` (partitioning-dependent). Boundaries are percentile
    * points of hash mod 100. Map-only. */
  def trainValTestSplit(documents: DataFrame, trainPct: Int = 80,
                        valPct: Int = 10): DataFrame = {
    require(trainPct + valPct < 100, "train+val must leave room for test")
    val sha60 = org.apache.spark.sql.graft.GraftBridge.column(
      graft.functions.expressions.Sha60(
        org.apache.spark.sql.graft.GraftBridge.expression(
          col("doc_id").cast("string"))))
    documents.select(col("doc_id"),
      pmod(sha60, lit(100)).as("bucket"))
      .select(col("doc_id"),
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test").as("split"))
  }

  /** Deterministic stratified sampling: keep `ratesPct(stratum)`% of
    * each stratum (e.g. per-language up/down-sampling when mixing a
    * training corpus), membership decided by the portable content hash
    * of a salted doc id — reproducible across runs, partitionings and
    * engines, unlike `df.sample`/RAND(). The salt decorrelates the
    * sample from other hash-derived assignments (train/val/test split
    * uses the unsalted id). Map-only. */
  def stratifiedSample(documents: DataFrame, strataCol: String,
                       ratesPct: Map[String, Int], defaultPct: Int,
                       salt: String = "sample"): DataFrame = {
    require((ratesPct.values ++ Seq(defaultPct)).forall(r => r >= 0 && r <= 100),
      "rates are percentages in [0, 100]")
    val sha60 = org.apache.spark.sql.graft.GraftBridge.column(
      graft.functions.expressions.Sha60(
        org.apache.spark.sql.graft.GraftBridge.expression(
          concat(lit(s"$salt:"), col("doc_id").cast("string")))))
    val rate = ratesPct.foldLeft(lit(defaultPct)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    documents.filter(pmod(sha60, lit(100)) < rate)
  }

  /** Concat-and-chunk sequence packing: concatenate documents in
    * doc_id order and chunk the token stream into fixed `seqTokens`
    * training sequences — each doc gets its global token offset, the
    * sequence its first token lands in, and the offset within it
    * (the standard LM-pretraining packing layout).
    *
    * Scale shape: a naive global-window cumsum serializes the corpus
    * through ONE task. Instead, a two-phase prefix sum: per-bucket
    * token totals (a tiny frame — |corpus| / bucketWidth rows) get
    * exclusive bucket offsets via a window over that tiny frame, then
    * broadcast back for a within-bucket cumsum — every task works on
    * its bucket only. Buckets are doc_id ranges, so (bucket, doc_id)
    * order ≡ global doc_id order and the result is identical to the
    * serial cumsum (the oracle computes exactly that). */
  def sequencePack(documents: DataFrame, seqTokens: Long = 2048,
                   bucketWidth: Long = 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(seqTokens > 0 && bucketWidth > 0,
      "seqTokens and bucketWidth must be positive")
    val toks = documents.select(col("doc_id"),
      size(wsTokens(col("text"))).cast("long").as("n_tokens"),
      floor(col("doc_id") / bucketWidth).cast("long").as("bucket"))
    val bucketTotals = toks.groupBy(col("bucket"))
      .agg(sum(col("n_tokens")).as("bucket_tokens"))
    val wb = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketTotals.withColumn("bucket_offset",
      coalesce(sum(col("bucket_tokens")).over(wb), lit(0L)))
    val wi = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    toks.join(broadcast(offsets.select(col("bucket"), col("bucket_offset"))),
        "bucket")
      .withColumn("token_start",
        col("bucket_offset") +
          coalesce(sum(col("n_tokens")).over(wi), lit(0L)))
      .select(col("doc_id"), col("n_tokens"), col("token_start"),
        expr(s"token_start div $seqTokens").as("seq_id"),
        pmod(col("token_start"), lit(seqTokens)).as("seq_offset"))
  }

  /** Packing-efficiency audit of [[sequencePack]]'s concat-and-chunk
    * layout: per training sequence, how many documents touch it, how
    * many START in it vs are CARRIED IN across its left boundary (the
    * attention-contamination mass — tokens that attend across a
    * document boundary unless the trainer masks), and the filled
    * token count (= seqTokens everywhere but the final partial
    * sequence; concat packing never wastes pad). The report a team
    * reads before choosing concat packing vs no-split binning + pad.
    *
    * Scale: rides the pack's own two-phase prefix sums; each doc
    * explodes only into the sequences its span covers (Σ = n_docs +
    * boundary crossings, linear), then one seq_id aggregate. */
  def packEfficiency(documents: DataFrame, seqTokens: Long = 2048,
                     bucketWidth: Long = 1000): DataFrame = {
    val packed = sequencePack(documents, seqTokens, bucketWidth)
    val spans = packed.select(col("doc_id"), col("n_tokens"),
      col("token_start"), col("seq_id").as("first_seq"),
      expr(s"(token_start + n_tokens - 1) div $seqTokens").as("last_seq"))
    val perSeq = spans.select(col("doc_id"), col("n_tokens"),
        col("token_start"),
        explode(sequence(col("first_seq"), col("last_seq"))).as("seq_id"))
      .withColumn("seq_lo", col("seq_id") * lit(seqTokens))
      .withColumn("seq_hi", (col("seq_id") + 1) * lit(seqTokens))
    perSeq.groupBy("seq_id").agg(
      count(lit(1)).as("n_docs"),
      sum((col("token_start") >= col("seq_lo")).cast("long"))
        .as("n_docs_starting"),
      sum((col("token_start") < col("seq_lo")).cast("long"))
        .as("n_carried_in"),
      sum(least(col("token_start") + col("n_tokens"), col("seq_hi")) -
        greatest(col("token_start"), col("seq_lo"))).as("tokens_filled"))
  }

  /** Sliding-window document chunking: cut each doc's token stream
    * into `chunkTokens`-token windows every `stride` tokens (overlap =
    * chunkTokens − stride), the standard long-document layout for
    * context-bounded training and embedding models. Start positions
    * are 0, stride, 2·stride, … while they land inside the doc, so
    * every token is covered and a doc shorter than one window still
    * yields its single (short) chunk.
    *
    * Scale shape: map-only — windows are built per row from the bound
    * token array (`transform(sequence)` + `slice`, all codegen'd
    * collection ops), then exploded; no shuffle anywhere, scan speed
    * at 100 TB, and the output is embarrassingly partitioned for the
    * downstream encode/embed stage. */
  def docChunk(documents: DataFrame, chunkTokens: Int = 64,
               stride: Int = 48): DataFrame = {
    require(chunkTokens > 0 && stride > 0 && stride <= chunkTokens,
      "need 0 < stride <= chunkTokens (stride > chunkTokens drops tokens)")
    documents
      .select(col("doc_id"), wsTokens(col("text")).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"),
        col("toks"))
      .select(col("doc_id"), col("n_tokens"),
        explode(expr(
          s"""transform(sequence(0, cast((n_tokens - 1) div $stride as int)),
             |  i -> struct(
             |    cast(i as long) as chunk_id,
             |    cast(i as long) * $stride as tok_start,
             |    array_join(slice(toks, i * $stride + 1, $chunkTokens), ' ')
             |      as chunk_text))""".stripMargin)).as("c"))
      .select(col("doc_id"), col("n_tokens"), col("c.chunk_id"),
        col("c.tok_start"),
        least(lit(chunkTokens.toLong), col("n_tokens") - col("c.tok_start"))
          .as("n_chunk_tokens"),
        col("c.chunk_text"))
  }

  /** Deterministic MLM-style token masking: each token position masks
    * with probability `maskPct`% decided by the salted content hash
    * of (doc, position) — reproducible across runs, partitionings and
    * engines (a trained run can regenerate its exact mask pattern
    * from the salt alone, and epochs decorrelate by changing it).
    * Emits the masked text plus the mask count; label extraction is
    * the positions where `masked_text` differs.
    *
    * Map-only: the flag array binds once and feeds both the rewrite
    * and the count — no shuffle, scan speed at 100 TB. */
  def mlmMask(documents: DataFrame, maskPct: Int = 15,
              salt: String = "mlm"): DataFrame = {
    require(maskPct >= 0 && maskPct <= 100, "maskPct is a percentage")
    val sha60 = (c: Column) => org.apache.spark.sql.graft.GraftBridge.column(
      graft.functions.expressions.Sha60(
        org.apache.spark.sql.graft.GraftBridge.expression(c)))
    documents
      .select(col("doc_id"), wsTokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"),
        graft.functions.VectorFunctions.bind(
          transform(sequence(lit(0), size(col("toks")) - 1),
            i => pmod(sha60(concat(lit(s"$salt:"),
              col("doc_id").cast("string"), lit(":"), i.cast("string"))),
              lit(100L)) < maskPct),
          flags => struct(
            aggregate(flags, lit(0L),
              (acc, f) => acc + when(f, 1L).otherwise(0L)).as("n_masked"),
            zip_with(col("toks"), flags,
              (t, f) => when(f, "[MASK]").otherwise(t)).as("masked")))
          .as("m"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        col("m.n_masked"),
        array_join(col("m.masked"), " ").as("masked_text"))
  }

  /** Deterministic global training-order shuffle: every doc gets a
    * dense 0-based `shuffle_rank` in salted-content-hash order —
    * reproducible across runs, partitionings and engines (unlike
    * `df.orderBy(rand())`), decorrelated from the split/sample
    * assignments by the salt. Global rank WITHOUT a global
    * single-task sort: the hash's top bits bucket the order (bucket
    * ranges are disjoint and ordered), per-bucket counts prefix-sum on
    * a tiny frame, and within-bucket ranks run per bucket — the
    * sequence_pack two-phase discipline applied to ordering. */
  def corpusShuffle(documents: DataFrame, salt: String = "shuffle"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sha60 = org.apache.spark.sql.graft.GraftBridge.column(
      graft.functions.expressions.Sha60(
        org.apache.spark.sql.graft.GraftBridge.expression(
          concat(lit(s"$salt:"), col("doc_id").cast("string")))))
    // 60-bit hash → top 10 bits = 1024 ordered, disjoint rank buckets
    val hashed = documents.select(col("doc_id"), sha60.as("h"))
      .withColumn("bucket", shiftright(col("h"), 50))
    val counts = hashed.groupBy(col("bucket"))
      .agg(count(lit(1)).as("c"))
    val wb = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts.withColumn("off",
      coalesce(sum(col("c")).over(wb), lit(0L)))
    val wi = Window.partitionBy(col("bucket"))
      .orderBy(col("h"), col("doc_id"))
    hashed.join(broadcast(offsets.select(col("bucket"), col("off"))),
        "bucket")
      .withColumn("shuffle_rank",
        col("off") + row_number().over(wi).cast("long") - 1)
      .select(col("doc_id"), col("shuffle_rank"))
  }

  /** Corpus vocabulary: per-word document frequency and total
    * occurrences (vocab building / stopword discovery). One shuffle
    * on the word. */
  def vocabulary(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), explode(wsTokens(col("text"))).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc_id")).as("n_docs"))

  /** Inverted index with ranked postings: per term, its document
    * frequency, collection frequency, and the top-`maxPostings`
    * posting entries by (tf desc, doc_id) — the search-engine-shaped
    * complement of [[vocabulary]] (per-term doc lists, where
    * [[tfidfTopTerms]] is per-doc term lists). Emitted as exploded
    * rows so the posting list stays a flat, splittable frame.
    *
    * Scale shape: one (word, doc) groupBy with map-side partial
    * counts, a vocab-keyed stats aggregation, and the per-term top-N
    * through `WindowGroupLimit` (per-partition heap prune BEFORE the
    * exchange — a hot term's millions of postings never collect into
    * one task's window buffer beyond the cap). */
  def invertedIndex(documents: DataFrame, maxPostings: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = documents
      .select(col("doc_id"), explode(wsTokens(col("text"))).as("word"))
      .groupBy(col("word"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
    val stats = tf.groupBy(col("word"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"))
    val w = Window.partitionBy(col("word"))
      .orderBy(col("tf").desc, col("doc_id"))
    tf.withColumn("posting_rank", row_number().over(w).cast("long"))
      .filter(col("posting_rank") <= maxPostings)
      .join(stats, "word")
      .select("word", "df", "cf", "posting_rank", "doc_id", "tf")
  }

  /** PMI-style collocation mining: adjacent word pairs whose observed
    * frequency beats the independence expectation — phrase discovery
    * over a pretraining corpus (the classic pointwise-mutual-
    * information signal, emitted as the monotone `lift` ratio
    * p(ab)/(p(a)p(b)) so no engine-specific `ln` enters the hash).
    *
    * Scale: two bounded shuffles (bigram and unigram counts, both
    * keyed on vocabulary terms — map-side combine collapses each to
    * |vocab| rows) + two vocab-keyed joins; the totals row
    * broadcasts. All arithmetic is integer counts until one fixed
    * left-associated double expression, replicated token-for-token by
    * the oracle. */
  def wordPmi(documents: DataFrame, minPairCount: Long = 5): DataFrame = {
    val toks = documents.select(wsTokens(col("text")).as("w"))
    val uni = toks.select(explode(col("w")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("c_w"))
    val biAll = toks.filter(size(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(w) - 2), " +
          "i -> struct(w[i] as word_a, w[i+1] as word_b))")).as("p"))
      .select(col("p.word_a"), col("p.word_b"))
      .groupBy("word_a", "word_b").agg(count(lit(1)).as("c_ab"))
    // totals derive from the |vocab|-sized aggregates (Σ c_w = token
    // count, Σ pre-threshold c_ab = bigram count) — no third and
    // fourth corpus scan just for two scalars; identical aggregate
    // subplans reuse their shuffle stages under AQE
    val tot = uni.agg(sum(col("c_w")).cast("double").as("t_uni"))
      .crossJoin(biAll.agg(sum(col("c_ab")).cast("double").as("t_bi")))
    val bi = biAll.filter(col("c_ab") >= minPairCount)
    bi
      .join(uni.select(col("word").as("word_a"), col("c_w").as("c_a")),
        "word_a")
      .join(uni.select(col("word").as("word_b"), col("c_w").as("c_b")),
        "word_b")
      .crossJoin(broadcast(tot))
      .withColumn("lift",
        ((col("c_ab").cast("double") * col("t_uni")) * col("t_uni")) /
          ((col("t_bi") * col("c_a").cast("double")) *
            col("c_b").cast("double")))
      .select("word_a", "word_b", "c_ab", "c_a", "c_b", "lift")
  }

  /** Repetition metrics (the Gopher-style "repetitive document"
    * quality signals): duplicate word / bigram / trigram fractions per
    * document, plus a flag. Map-only — the token and shingle arrays
    * are built per row (`array_distinct`/`size` are codegen'd
    * collection ops, subexpression elimination shares the arrays), no
    * shuffle, scan speed at 100 TB. Fractions are integer-valued
    * doubles with a single division — bit-portable across engines. */
  def repetition(documents: DataFrame,
                 maxDupBigramFrac: Double = 0.2): DataFrame = {
    val counted = documents.select(col("doc_id"),
      size(wsTokens(col("text"))).cast("double").as("n_words"),
      size(array_distinct(wsTokens(col("text")))).cast("double").as("n_dw"),
      size(Dedup.shingles(col("text"), 2)).cast("double").as("n_bg"),
      size(array_distinct(Dedup.shingles(col("text"), 2)))
        .cast("double").as("n_dbg"),
      size(Dedup.shingles(col("text"), 3)).cast("double").as("n_tg"),
      size(array_distinct(Dedup.shingles(col("text"), 3)))
        .cast("double").as("n_dtg"))
    counted.select(col("doc_id"),
      col("n_words").cast("long").as("n_tokens"),
      ((col("n_words") - col("n_dw")) / col("n_words")).as("dup_word_frac"),
      ((col("n_bg") - col("n_dbg")) / col("n_bg")).as("dup_bigram_frac"),
      ((col("n_tg") - col("n_dtg")) / col("n_tg")).as("dup_trigram_frac"))
      .withColumn("is_repetitive",
        col("dup_bigram_frac") > maxDupBigramFrac)
  }

  /** Top TF-IDF terms per document, with a ratio idf (score =
    * tf · N / df). The ratio is a monotone function of the usual
    * log-idf in df, chosen because it stays in exact integer
    * arithmetic until one final IEEE division — so ranks and scores
    * are bit-reproducible across engines (ln() is not). Shuffle
    * profile: one groupBy (doc, word) with map-side partial counts,
    * one groupBy word for document frequencies (vocab-sized — at
    * 100 TB this frame is millions of rows, broadcastable or a plain
    * shuffle join), the corpus size rides in as a broadcast scalar,
    * and the per-doc top-N runs through `WindowGroupLimit` (partial
    * per-partition top-N before the exchange). */
  def tfidfTopTerms(documents: DataFrame, topN: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val words = documents.select(col("doc_id"),
      explode(wsTokens(col("text"))).as("word"))
    val tf = words.groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = words.groupBy(col("word"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val nDocs = documents.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfreq, "word")
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        (col("tf") * col("n_docs")).cast("double") / col("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("word"))
    scored.withColumn("term_rank", row_number().over(w).cast("long"))
      .filter(col("term_rank") <= topN)
      .select("doc_id", "word", "tf", "score", "term_rank")
  }

  /** PII patterns, simple and RE2-compatible (the oracle engine uses
    * RE2) — email, dotted-quad IP, NNN-NNNN phone. Replacement order
    * matters (emails contain dots and digits): email → IP → phone. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\b\\d{3}-\\d{4}\\b"

  /** PII redaction for training corpora: replace emails / IPs / phone
    * shapes with typed placeholder tokens and report per-doc match
    * counts (the counts drive drop-vs-redact policy decisions).
    * Map-only regex work — scan speed at 100 TB, no shuffle. */
  def piiScrub(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"),
      regexp_replace(
        regexp_replace(
          regexp_replace(col("text"), EmailRe, "<EMAIL>"),
          Ipv4Re, "<IP>"),
        PhoneRe, "<PHONE>").as("clean_text"),
      size(regexp_extract_all(col("text"), lit(EmailRe), lit(0)))
        .cast("long").as("n_emails"),
      size(regexp_extract_all(col("text"), lit(Ipv4Re), lit(0)))
        .cast("long").as("n_ips"),
      size(regexp_extract_all(col("text"), lit(PhoneRe), lit(0)))
        .cast("long").as("n_phones"))

  /** Consistent PII pseudonymization — redaction that PRESERVES
    * entity identity where [[piiScrub]] erases it: every email is
    * replaced by a token derived from ITS OWN hash
    * (`<EMAIL_xxxxxxxx>`, first 8 hex chars of sha256), so the same
    * address maps to the same token in every document — cross-doc
    * joins, frequency analyses and dedup still work on the redacted
    * corpus while the raw value is gone. The rewrite left-folds the
    * doc's matches over its text with replace-all (duplicate matches
    * fold to no-ops; tokens contain no `@`, so no new matches
    * appear) — map-only, scan speed, zero shuffle; sha256 is
    * bit-identical in any engine, so the fold reproduces exactly. */
  def piiPseudonymize(documents: DataFrame): DataFrame = {
    val ents = regexp_extract_all(col("text"), lit(EmailRe), lit(0))
    documents.select(col("doc_id"),
      aggregate(ents, col("text"),
        (acc, e) => replace(acc, e, pseudoToken(e))).as("pseudo_text"),
      size(ents).cast("long").as("n_entities"),
      size(array_distinct(ents)).cast("long").as("n_distinct_entities"))
  }

  private def pseudoToken(e: Column): Column =
    concat(lit("<EMAIL_"), substring(sha2(e, 256), 1, 8), lit(">"))

  /** The inverse half of [[piiPseudonymize]]: the (entity → token)
    * lookup an AUTHORIZED re-identification needs, and the audit
    * surface proving token consistency (one token per entity, ever).
    * One distinct over matched entities — the only shuffle in the
    * pseudonymization story, sized by distinct PII values, not the
    * corpus. */
  def piiPseudonymMap(documents: DataFrame): DataFrame =
    documents
      .select(explode(regexp_extract_all(col("text"), lit(EmailRe),
        lit(0))).as("entity"))
      .distinct()
      .select(col("entity"), pseudoToken(col("entity")).as("token"))

  /** Unicode-script composition per document: counts of Latin /
    * Cyrillic / Han script characters and decimal digits, plus the
    * dominant script under a fixed tie order. The script axis is
    * orthogonal to [[langId]]'s stopword heuristic (which only
    * separates LATIN languages): a multilingual crawl routes on
    * script FIRST — CJK to its own tokenizer budget, mixed-script
    * spam to review — before any language model sees the text.
    * Map-only regex counting at scan speed; `\p{IsX}` (Java) and
    * `\p{X}` (RE2) agree on script membership, so the oracle
    * replicates counts exactly. */
  def scriptMix(documents: DataFrame): DataFrame = {
    def n(re: String): Column =
      size(regexp_extract_all(col("text"), lit(re), lit(0))).cast("long")
    documents.select(col("doc_id"),
        n("\\p{IsLatin}").as("n_latin"),
        n("\\p{IsCyrillic}").as("n_cyrillic"),
        n("\\p{IsHan}").as("n_han"),
        n("[0-9]").as("n_digit"))
      .withColumn("main_script",
        when(col("n_latin") >= col("n_cyrillic") &&
             col("n_latin") >= col("n_han"), "latin")
          .when(col("n_cyrillic") >= col("n_han"), "cyrillic")
          .otherwise("han"))
  }

  /** PII incidence report per source — the governance dashboard over
    * [[piiScrub]]'s detectors: document counts, documents-with-PII,
    * and per-type match totals. This is the artifact a curation run
    * publishes BEFORE scrubbing (which sources leak, what types, how
    * much), and the regression gate after (re-run on clean_text must
    * go to zero). Map-only regex counting at scan speed + one
    * |sources|-row map-side-combined aggregate. */
  def piiReport(documents: DataFrame): DataFrame = {
    val perDoc = documents.select(col("source"),
      size(regexp_extract_all(col("text"), lit(EmailRe), lit(0)))
        .cast("long").as("ne"),
      size(regexp_extract_all(col("text"), lit(Ipv4Re), lit(0)))
        .cast("long").as("ni"),
      size(regexp_extract_all(col("text"), lit(PhoneRe), lit(0)))
        .cast("long").as("np"))
    perDoc.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("ne") + col("ni") + col("np") > 0, 1L).otherwise(0L))
          .as("n_docs_with_pii"),
        sum(col("ne")).as("n_emails"),
        sum(col("ni")).as("n_ips"),
        sum(col("np")).as("n_phones"))
  }

  /** Frequent-word mining (heavy hitters) WITHOUT a full-vocabulary
    * shuffle: per-partition Misra-Gries summaries (bounded memory —
    * `mgCapacity` counters per task, a few KB) produce a candidate
    * superset, then ONLY candidates are exactly counted and
    * thresholded. Guarantee: any word with global frequency
    * ≥ N/(mgCapacity+1) exceeds n_p/(mgCapacity+1) in at least one
    * partition (averaging), so it survives that partition's summary —
    * choose `minCount ≥ N/(mgCapacity+1)` and the output is EXACT
    * (same rows as the full groupBy+HAVING), deterministic, and
    * partition-invariant. At 100 TB the candidate set is
    * tasks × capacity rows (broadcastable) versus a vocabulary-sized
    * shuffle — this is the classic sketch-then-verify pattern.
    * mapPartitions is justified here: Misra-Gries is genuinely
    * per-partition imperative state. */
  def heavyHitters(documents: DataFrame, minCount: Long,
                   mgCapacity: Int = 64): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val words = documents
      .select(explode(wsTokens(col("text"))).as("word")).as[String]
    val candidates = words.mapPartitions { it =>
      val counts = scala.collection.mutable.HashMap[String, Long]()
      it.foreach { w =>
        if (counts.contains(w)) counts(w) += 1L
        else if (counts.size < mgCapacity) counts(w) = 1L
        else
          // decrement-all step: kills one unit of every tracked word;
          // the arriving word is absorbed (net count 0, not tracked)
          counts.toArray.foreach { case (k, v) =>
            if (v == 1L) counts.remove(k) else counts(k) = v - 1L
          }
      }
      counts.keysIterator
    }.distinct()
    words.toDF("word")
      .join(broadcast(candidates.toDF("word")), Seq("word"), "left_semi")
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n_occurrences"))
      .filter(col("n_occurrences") >= minCount)
  }

  /** Winnowing fingerprints: hash every k-gram with the portable
    * sha256-prefix hash, keep the window-min hash of each w-length
    * window, distinct per doc. (Winnowing: local algorithms for
    * document fingerprinting — guarantees any shared substring ≥
    * w+k−1 tokens shares a fingerprint.) One row per
    * (doc_id, fingerprint); every value replicable by the SQL oracle. */
  def fingerprints(documents: DataFrame, k: Int = 5, w: Int = 4): DataFrame = {
    val grams = Dedup.shingles(col("text"), k)
    // bind the hash array once: the sliding-window mins index into a
    // bound value instead of re-shingling the doc per window position
    val sha60 = (g: Column) => org.apache.spark.sql.graft.GraftBridge.column(
      graft.functions.expressions.Sha60(
        org.apache.spark.sql.graft.GraftBridge.expression(g)))
    val mins = graft.functions.VectorFunctions.bind(
      transform(grams, sha60),
      hashes => when(size(hashes) >= w,
        transform(sequence(lit(0), size(hashes) - w),
          i => array_min(slice(hashes, i + 1, lit(w)))))
        .otherwise(array(array_min(hashes))))
    documents.select(col("doc_id"),
      explode(array_distinct(mins)).as("fingerprint"))
  }

  /** fastText-style linear quality classifier over hashed tokens:
    * each token hashes to an integer weight in [-1000, 1000] (a
    * deterministic stand-in for trained embedding-bag weights — in
    * production the hash indexes a broadcast weight table learned
    * offline; the pipeline shape is identical), the document score is
    * the mean weight. The raw score is an INTEGER sum, so it is
    * order-independent and bit-reproducible across engines — the only
    * IEEE step is one final division. Map-only: no shuffle, scan
    * speed at 100 TB. */
  /** Raw hashed-token classifier score over a token-array column —
    * THE weight formula, shared by the batch classifier and the
    * streaming curation twin so they can never silently diverge. */
  def clfScoreRaw(toks: Column, bias: Long = 0L): Column = {
    val sha60 = (c: Column) => org.apache.spark.sql.graft.GraftBridge.column(
      graft.functions.expressions.Sha60(
        org.apache.spark.sql.graft.GraftBridge.expression(c)))
    aggregate(
      transform(toks, t => pmod(sha60(t), lit(2001L)) - lit(1000L)),
      lit(bias), (acc, x) => acc + x)
  }

  def qualityClassifier(documents: DataFrame, bias: Long = 0L): DataFrame =
    documents
      .select(col("doc_id"), wsTokens(col("text")).as("toks"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        clfScoreRaw(col("toks"), bias).as("score_raw"))
      .withColumn("clf_score",
        col("score_raw").cast("double") / (col("n_tokens") * lit(1000.0)))
      .withColumn("clf_keep", col("clf_score") > lit(0.0))

  /** The composite quality GATE: every per-doc quality signal the
    * module computes — length, punctuation, stopword rate, bigram
    * repetition, classifier score — evaluated against production-style
    * thresholds, emitted as per-rule booleans plus the final keep
    * (per-rule flags are what let a pipeline report WHY documents
    * drop, not just how many). The Gopher/C4-style rule stack; each
    * rule reproduces its source operator's arithmetic exactly (the
    * spec asserts agreement), but all signals compute in ONE map-only
    * projection over the shared token array — no second or third text
    * scan, zero shuffles, scan speed at 100 TB. */
  def qualityGate(documents: DataFrame, minTokens: Double = 10.0,
                  maxPunct: Double = 0.3, minStopword: Double = 0.05,
                  maxDupBigram: Double = 0.2): DataFrame = {
    val counted = documents.select(col("doc_id"),
      length(col("text")).cast("double").as("n_chars"),
      size(wsTokens(col("text"))).cast("double").as("n_tokens_d"),
      size(wsTokens(col("text"))).cast("long").as("n_tokens_l"),
      size(expr("regexp_extract_all(text, '[^A-Za-z0-9 ]', 0)"))
        .cast("double").as("n_punct"),
      org.apache.spark.sql.graft.GraftBridge.column(
        graft.functions.expressions.WordSetCount(
          org.apache.spark.sql.graft.GraftBridge.expression(
            wsTokens(col("text"))), Stopwords))
        .cast("double").as("n_stop"),
      size(Dedup.shingles(col("text"), 2)).cast("double").as("n_bg"),
      size(array_distinct(Dedup.shingles(col("text"), 2)))
        .cast("double").as("n_dbg"),
      clfScoreRaw(wsTokens(col("text"))).as("score_raw"))
    counted.select(col("doc_id"),
        (col("n_tokens_d") >= minTokens).as("rule_length"),
        (col("n_punct") / col("n_chars") <= maxPunct).as("rule_punct"),
        (col("n_stop") / col("n_tokens_d") >= minStopword)
          .as("rule_stopword"),
        ((col("n_bg") - col("n_dbg")) / col("n_bg") <= maxDupBigram)
          .as("rule_repetition"),
        (col("score_raw").cast("double") /
          (col("n_tokens_l") * lit(1000.0)) > 0.0).as("rule_classifier"))
      .withColumn("keep",
        col("rule_length") && col("rule_punct") && col("rule_stopword") &&
          col("rule_repetition") && col("rule_classifier"))
  }

  /** Temperature-based domain mixture sampling: each source's keep
    * rate follows w_s ∝ sqrt(m_s) (temperature α = 0.5 over token
    * mass m_s — upsamples small domains, downsamples dominant ones),
    * scaled so the expected kept token mass is `budgetPpm` ppm of the
    * corpus and capped at 1. Membership is a pure salted-hash
    * function of doc_id — reproducible across runs, partitionings and
    * engines.
    *
    * Determinism across engines: weights are floor(sqrt(m)) INTEGERS
    * (sqrt is correctly rounded in IEEE — unlike pow — so identical
    * everywhere), all sums are integer sums, and the rate is a fixed
    * left-to-right chain of exactly-rounded double ops replicated
    * verbatim in the oracle.
    *
    * Scale shape: per-source token masses are one tiny partial-agg
    * shuffle (|sources| rows); rates broadcast back; the keep test is
    * map-side. */
  def domainMix(documents: DataFrame, budgetPpm: Long = 500000L,
                salt: String = "mix"): DataFrame = {
    require(budgetPpm >= 0 && budgetPpm <= 1000000L,
      "budgetPpm is parts-per-million of the corpus token mass")
    val sha60 = org.apache.spark.sql.graft.GraftBridge.column(
      graft.functions.expressions.Sha60(
        org.apache.spark.sql.graft.GraftBridge.expression(
          concat(lit(s"$salt:"), col("doc_id").cast("string")))))
    val masses = documents
      .select(col("source"), size(wsTokens(col("text"))).cast("long").as("n_tok"))
      .groupBy(col("source")).agg(sum(col("n_tok")).as("m"))
      .withColumn("w", floor(sqrt(col("m").cast("double"))).cast("long"))
    val totals = masses.agg(sum(col("m")).as("t"), sum(col("w")).as("wsum"))
    // the denominator multiplies IN DOUBLE: a long wsum * m silently
    // wraps once per-source token mass reaches ~1e13 at corpus scale
    // (double rounds instead — and below 2^53 the product is exact,
    // so the oracle chain is unchanged at any test scale)
    val rates = masses.crossJoin(broadcast(totals))
      .select(col("source"),
        floor(least(lit(1.0),
          lit(budgetPpm) * lit(1.0) / lit(1000000.0) * col("t") * col("w") /
            (col("wsum").cast("double") * col("m").cast("double")))
          * lit(1000000.0))
          .cast("long").as("mix_rate_ppm"))
    documents
      .join(broadcast(rates), "source")
      .filter(pmod(sha60, lit(1000000L)) < col("mix_rate_ppm"))
      .select(col("doc_id"), col("source"), col("mix_rate_ppm"))
  }

  private def saltedSha60(salt: String): Column =
    org.apache.spark.sql.graft.GraftBridge.column(
      graft.functions.expressions.Sha60(
        org.apache.spark.sql.graft.GraftBridge.expression(
          concat(lit(s"$salt:"), col("doc_id").cast("string")))))

  /** Exact-count stratified sample: keep exactly `k` documents per
    * stratum (fewer only if the stratum is smaller), chosen in
    * salted-content-hash order — the fixed-budget complement of
    * [[stratifiedSample]]'s rate sampling. An eval/holdout set of
    * "k docs per language" needs exact counts; a rate sample only
    * hits k in expectation.
    *
    * Deterministic: membership AND rank are pure functions of the
    * salted hash — reproducible across runs, partitionings, engines.
    *
    * Scale shape: `row_number <= k` over (stratum, hash) compiles to
    * `WindowGroupLimit` — every task heap-prunes to its own local
    * top-k BEFORE the exchange, so the stratum shuffle carries
    * O(tasks × k) rows, never the corpus (plan-asserted). */
  def exactStratifiedSample(documents: DataFrame, strataCol: String,
                            k: Int, salt: String = "exact"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0, "k is the per-stratum sample size")
    val w = Window.partitionBy(col(strataCol))
      .orderBy(col("h"), col("doc_id"))
    documents.withColumn("h", saltedSha60(salt))
      .withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= k)
      .select(col("doc_id"), col(strataCol), col("sample_rank"))
  }

  /** Deterministic stratified k-fold assignment: every document gets
    * a fold in [0, k) from its salted content hash, plus its position
    * within (stratum, fold) — the reproducible cross-validation /
    * eval-holdout split. Unlike a rate sample, ALL rows are assigned
    * (the full partition of the corpus), and because membership is a
    * pure function of (salt, doc_id), folds are stable across runs,
    * partitionings, engines, and — critically for a growing corpus —
    * across incremental appends: old documents never migrate folds
    * when new ones arrive.
    *
    * Scale shape: the fold is map-side (hash mod k at scan speed);
    * the in-fold rank is `row_number` over (stratum, fold) — the one
    * shuffle, keyed fine enough (strata × k) to spread. Consumers
    * that only need the fold column can drop the rank projection and
    * run shuffle-free. */
  def stratifiedKFold(documents: DataFrame, strataCol: String = "lang",
                      k: Int = 5, salt: String = "fold"): DataFrame = {
    require(k >= 2, "k-fold needs k >= 2")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol), col("fold"))
      .orderBy(col("doc_id"))
    documents
      .select(col("doc_id"), col(strataCol),
        pmod(saltedSha60(salt), lit(k.toLong)).as("fold"))
      .withColumn("fold_rank", row_number().over(w).cast("long"))
  }

  /** Per-document n-gram novelty: of a document's DISTINCT bigrams,
    * the fraction (in ppm) whose globally FIRST occurrence — minimum
    * doc_id over the corpus — is this document. Early documents score
    * high, late near-copies score ~0; the redundancy/freshness curve
    * that tells a curation pipeline where marginal data stops adding
    * content (and a cheap cross-document complement to intra-doc
    * repetition metrics).
    *
    * Determinism: grouping is by the portable 60-bit content hash of
    * the bigram (the paragraphDedup idiom — the oracle groups by the
    * same hash, so engines agree exactly); counts and the ppm are
    * pure integer arithmetic.
    *
    * Scale shape: documents → distinct (doc, bigram-hash) pairs is
    * one map-side-combined shuffle of 8-byte hashes; first-owner is
    * a whole-partition `min over (partition by hash)` WINDOW — one
    * more 16-byte-row shuffle, but NO self-join and NO second corpus
    * scan (the agg-then-join formulation re-reads and re-hashes the
    * whole corpus for the ownership side); the per-doc rollup is the
    * final combine. The text itself never shuffles — only hashes. */
  def ngramNovelty(documents: DataFrame): DataFrame = {
    val sha60 = (c: Column) =>
      org.apache.spark.sql.graft.GraftBridge.column(
        graft.functions.expressions.Sha60(
          org.apache.spark.sql.graft.GraftBridge.expression(c)))
    val pairs = documents
      .select(col("doc_id"), wsTokens(col("text")).as("toks"))
      // sequence(1, 0) DESCENDS in Spark — guard sub-bigram docs to
      // an empty array instead (explode then drops them, same as SQL)
      .select(col("doc_id"), explode(expr(
        """CASE WHEN size(toks) >= 2 THEN
             transform(sequence(1, size(toks) - 1),
               i -> concat(toks[i - 1], ' ', toks[i]))
           ELSE array() END""")).as("bg"))
      .select(col("doc_id"), sha60(col("bg")).as("h"))
      .distinct()
    val byHash = org.apache.spark.sql.expressions.Window.partitionBy(col("h"))
    pairs
      .withColumn("first_doc", min(col("doc_id")).over(byHash))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_distinct_bigrams"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
      .select(col("doc_id"), col("n_distinct_bigrams"), col("n_novel"),
        expr("n_novel * 1000000 div n_distinct_bigrams")
          .as("novelty_ppm"))
  }

  /** Deterministic text normalization: control bytes → space,
    * whitespace runs collapsed to one space, edges trimmed, text
    * lowercased — the canonical-form pass that runs before exact
    * dedup so byte-level noise (tabs, CRLF, case) can't split
    * otherwise-identical documents. Emits the normalized text, its
    * length, and its content hash (the exact-dedup key).
    *
    * Patterns are RE2-compatible (no lookaround, no backrefs) so the
    * same regexes mean the same thing in any engine. Map-only: zero
    * shuffles, scan speed at 100 TB, and the projection prunes to
    * (doc_id, text) at the parquet reader. */
  def textNormalize(df: DataFrame, textCol: String = "text"): DataFrame = {
    val collapsed = regexp_replace(
      regexp_replace(col(textCol), "[\\x00-\\x1f]", " "), " +", " ")
    val norm = lower(trim(collapsed))
    val normHash = org.apache.spark.sql.graft.GraftBridge.column(
      graft.functions.expressions.Sha60(
        org.apache.spark.sql.graft.GraftBridge.expression(col("norm_text"))))
    df.select(col("doc_id"), norm.as("norm_text"))
      .select(col("doc_id"), col("norm_text"),
        length(col("norm_text")).cast("long").as("n_chars_norm"),
        normHash.as("norm_hash"))
  }

  /** Soft quality filter (CCNet-style): keep probability proportional
    * to the classifier score instead of a hard threshold — borderline
    * documents survive at reduced rate, preserving distributional
    * coverage a cliff-edge cut destroys. keep_ppm =
    * clamp(floor((0.5 + clf_score)·10⁶), 0, 10⁶) — a score-neutral
    * doc keeps at 50%, strongly positive approaches certainty,
    * strongly negative approaches zero; membership is the salted
    * hash against that rate, so the decision is a pure function of
    * (salt, doc) — reproducible across runs, partitionings, engines.
    *
    * Scale shape: map-only — score, rate and hash test evaluate in
    * one projection at scan speed; no shuffle at any corpus size. */
  def qualityResample(documents: DataFrame,
                      salt: String = "resample"): DataFrame = {
    val scored = documents
      .select(col("doc_id"), wsTokens(col("text")).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"),
        clfScoreRaw(col("toks")).as("score_raw"))
      .withColumn("keep_ppm",
        least(greatest(floor((lit(0.5) + col("score_raw").cast("double") /
          (col("n_tokens") * lit(1000.0))) * lit(1000000.0)), lit(0L)),
          lit(1000000L)))
    scored.filter(pmod(saltedSha60(salt), lit(1000000L)) < col("keep_ppm"))
      .select(col("doc_id"), col("keep_ppm"))
  }

  /** Deterministic curriculum ordering: every document gets a dense
    * 0-based `curriculum_rank`, best-quality-first — the training-
    * order analog of [[corpusShuffle]] with a semantic primary key.
    * Docs are banded by the hashed-token classifier score
    * (floor(clf_score × 10); clf_score ∈ [-1, 1] by construction, so
    * ≤ 21 bands), bands are ordered best-first, and order within a
    * band is the salted-hash shuffle — curriculum learning's
    * "easy/clean first" schedule without a global sort.
    *
    * Scale shape: band counts are a ≤21-row frame (the only
    * unpartitioned window runs there), offsets broadcast back, and
    * within-band ranks run per band partition — the two-phase
    * prefix-sum discipline shared with corpusShuffle/sequencePack.
    * The classifier score is [[clfScoreRaw]]'s integer sum, so the
    * band boundary is one exactly-replicated IEEE divide+floor. */
  def curriculumOrder(documents: DataFrame,
                      salt: String = "curriculum"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = documents
      .select(col("doc_id"), wsTokens(col("text")).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"),
        clfScoreRaw(col("toks")).as("score_raw"))
      .withColumn("band",
        floor(col("score_raw").cast("double") /
          (col("n_tokens") * lit(1000.0)) * lit(10.0)))
      .withColumn("h", saltedSha60(salt))
    val counts = scored.groupBy(col("band")).agg(count(lit(1)).as("c"))
    val wb = Window.orderBy(col("band").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts.withColumn("off",
      coalesce(sum(col("c")).over(wb), lit(0L)))
    val wi = Window.partitionBy(col("band"))
      .orderBy(col("h"), col("doc_id"))
    // LEFT join, though every band has an offsets row by construction:
    // an inner join makes Catalyst infer IsNotNull(band) on the corpus
    // side, and that filter re-evaluates the whole classifier
    // aggregate a second time per row — left-outer keeps the single
    // evaluation and is result-identical (band is never null)
    scored.join(broadcast(offsets.select(col("band"), col("off"))),
        Seq("band"), "left")
      .withColumn("curriculum_rank",
        col("off") + row_number().over(wi).cast("long") - 1)
      .select(col("doc_id"), col("band"), col("curriculum_rank"))
  }

  /** Per-language doc-length histogram on LOG2 buckets: bucket b holds
    * documents of [2^b, 2^(b+1)) whitespace tokens, with each bucket's
    * within-language share in ppm — the length-distribution dashboard
    * a curation run reads before choosing packing lengths and
    * truncation cutoffs (doc lengths are heavy-tailed; linear buckets
    * waste 90% of their range on the tail).
    *
    * Determinism: the bucket is `length(bin(n)) - 1` — an INTEGER
    * floor(log2) via the binary-string length, identical in any
    * engine, where float `floor(log2(n))` mis-buckets exact powers of
    * two (Spark computes log2 as ln/ln2: log2(8) = 2.9999…96 → 2).
    * Shares are integer-floor ppm.
    *
    * Scale shape: map-only bucketing at scan speed, one map-side-
    * combined (lang, bucket) groupBy — the aggregate frame is ≤
    * |langs| × 64 rows, so the share window runs on a trivially small
    * frame. */
  def doclenHistogram(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = size(wsTokens(col("text"))).cast("long")
    val counts = documents
      .select(col("lang"),
        (length(bin(greatest(n, lit(1L)))) - 1).cast("long").as("bucket"))
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"))
    counts
      .withColumn("lang_docs",
        sum(col("n_docs")).over(Window.partitionBy(col("lang"))))
      .select(col("lang"), col("bucket"),
        expr("shiftleft(1L, cast(bucket as int))").as("lo_tokens"),
        (expr("shiftleft(1L, cast(bucket as int) + 1)") - 1).as("hi_tokens"),
        col("n_docs"),
        expr("(n_docs * 1000000L) div lang_docs").as("share_ppm"))
  }

  /** Categorical corpus-mix drift between two snapshots: per
    * (lang, source) cell, the document count and corpus share (ppm)
    * on each side and the signed share delta — the "did the crawl mix
    * shift under me" gate a training-data pipeline runs before
    * blessing a new drop ([[ksDrift]] is the continuous-distribution
    * complement). Cells present on only one side appear with a zero
    * count on the other (full outer cell join), which is exactly the
    * alarm case: a source that vanished or a new one that appeared.
    *
    * Determinism: counts and floor-ppm shares are pure integer
    * arithmetic (count·10⁶ ≤ 9.2·10¹² even at a trillion docs).
    *
    * Scale shape: two map-side-combined (lang, source) groupBys — the
    * joined cell frame is |langs|×|sources| rows, so the outer join
    * and total-share windows run on a tiny frame; the corpora
    * themselves are scanned once each and never joined. */
  def mixDrift(prev: DataFrame, cur: DataFrame): DataFrame =
    mixDriftFromCells(mixCells(prev, "n_prev"), mixCells(cur, "n_cur"))

  /** (lang, source) cell counts — the mergeable summary [[mixDrift]]
    * compares (and what its streaming twin accumulates per batch:
    * counting is associative, so shards merge to the one-shot
    * answer). */
  def mixCells(df: DataFrame, cnt: String): DataFrame = df
    .groupBy(col("lang"), col("source"))
    .agg(count(lit(1)).as(cnt))

  /** [[mixDrift]] over pre-counted cell frames (`n_prev` / `n_cur`
    * columns) — the entry point for callers whose counts come from a
    * shard store instead of a corpus scan. */
  def mixDriftFromCells(prevCells: DataFrame,
                        curCells: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joined = prevCells.join(curCells,
        Seq("lang", "source"), "full_outer")
      .na.fill(0L, Seq("n_prev", "n_cur"))
    val w = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    joined
      .withColumn("t_prev", sum(col("n_prev")).over(w))
      .withColumn("t_cur", sum(col("n_cur")).over(w))
      .select(col("lang"), col("source"), col("n_prev"), col("n_cur"),
        expr("(n_prev * 1000000L) div t_prev").as("prev_ppm"),
        expr("(n_cur * 1000000L) div t_cur").as("cur_ppm"),
        (expr("(n_cur * 1000000L) div t_cur") -
          expr("(n_prev * 1000000L) div t_prev")).as("drift_ppm"))
  }

  /** Kolmogorov-Smirnov drift between two snapshots of a discrete
    * numeric column (doc token counts, quality scores): the maximum
    * absolute gap between the two empirical CDFs, in ppm, plus the
    * value where it occurs — the standard two-sample
    * distribution-shift test, run as a gate next to [[mixDrift]]'s
    * categorical check.
    *
    * Determinism: CDFs are integer cumulative counts quantized to
    * floor-ppm BEFORE differencing (documented quantization ≤ 1 ppm
    * per side — the exact-rational cross-product |c₁n₂ − c₂n₁| needs
    * 128-bit arithmetic whose floor-division semantics differ across
    * engines); max is argmax with smallest-value tie-break.
    *
    * Scale shape: each corpus collapses to per-value counts in one
    * map-side-combined groupBy; the CDF windows and the final argmax
    * run over the joined ≤|distinct values| frame, never the corpora.
    * cum·10⁶ stays in-range until ~9.2 trillion rows per side. */
  def ksDrift(prev: DataFrame, cur: DataFrame,
              valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def counts(df: DataFrame, cnt: String): DataFrame = df
      .groupBy(col(valueCol).cast("long").as("v"))
      .agg(count(lit(1)).as(cnt))
    val joined = counts(prev, "c_prev").join(counts(cur, "c_cur"),
        Seq("v"), "full_outer")
      .na.fill(0L, Seq("c_prev", "c_cur"))
    // The CDF needs cumulative sums over the value census. A census of
    // few distinct values runs them as one single-partition window —
    // two extra jobs would cost more than they save. A HIGH-cardinality
    // census (continuous-ish values at 100 TB) must not funnel through
    // one partition (the r13-verdict residual §2 risk): past the
    // threshold the cumsum goes TWO-PHASE — monotone range buckets,
    // per-bucket totals prefixed on the driver (≤ #buckets rows),
    // broadcast offsets, and a PARTITIONED in-bucket window. Integer
    // sums either way: bit-identical output.
    val spark = prev.sparkSession
    val minRows = spark.conf
      .getOption("spark.graft.ksDrift.partitionedCumsumMinRows")
      .map(_.toLong).getOrElse(65536L)
    val pinned = joined.pin(eager = false)
    val stats = pinned.agg(count(lit(1)), min(col("v")), max(col("v")),
      coalesce(sum(col("c_prev")), lit(0L)),
      coalesce(sum(col("c_cur")), lit(0L))).collect()(0)
    val nDistinct = stats.getLong(0)
    val (nPrev, nCur) = (stats.getLong(3), stats.getLong(4))
    val cdf =
      if (nDistinct <= minRows) {
        val wc = Window.orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        pinned
          .withColumn("cum_prev", sum(col("c_prev")).over(wc))
          .withColumn("cum_cur", sum(col("c_cur")).over(wc))
      } else {
        val (minV, maxV) = (stats.getLong(1), stats.getLong(2))
        // ≤4096 monotone buckets: bucket order == value order, so the
        // exclusive per-bucket prefix is the in-bucket window's offset
        val width = math.max(1L, (maxV - minV) / 4096L + 1L)
        // integer div (never the double `/`): exact at any long range
        val bucketed = pinned.withColumn("b",
          expr(s"(v - ${minV}L) div ${width}L"))
        val perBucket = bucketed.groupBy(col("b"))
          .agg(sum(col("c_prev")).as("bp"), sum(col("c_cur")).as("bc"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          .sortBy(_._1)
        var (accP, accC) = (0L, 0L)
        val offsets = perBucket.map { case (b, bp, bc) =>
          val o = (b, accP, accC); accP += bp; accC += bc; o
        }
        val offDf = spark.createDataFrame(
          spark.sparkContext.parallelize(offsets.toSeq.map {
            case (b, op, oc) => org.apache.spark.sql.Row(b, op, oc) }, 1),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("b",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("off_prev",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("off_cur",
              org.apache.spark.sql.types.LongType))))
        val wb = Window.partitionBy(col("b")).orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        bucketed.join(broadcast(offDf), Seq("b"))
          .withColumn("cum_prev",
            sum(col("c_prev")).over(wb) + col("off_prev"))
          .withColumn("cum_cur",
            sum(col("c_cur")).over(wb) + col("off_cur"))
      }
    cdf
      .withColumn("n_prev", lit(nPrev))
      .withColumn("n_cur", lit(nCur))
      .select(col("v"),
        expr("abs((cum_prev * 1000000L) div n_prev - " +
          "(cum_cur * 1000000L) div n_cur)").as("gap_ppm"),
        col("n_prev"), col("n_cur"))
      .orderBy(col("gap_ppm").desc, col("v"))
      .limit(1)
      .select(col("gap_ppm").as("ks_ppm"), col("v").as("at_value"),
        col("n_prev"), col("n_cur"))
  }

  /** BM25 lexical retrieval — the search-engine scoring the tf·tf
    * overlap leg of hybridSearch approximates: per (query, doc) pair
    * sharing terms, Σ_t idf(t) · tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)),
    * with the RATIO idf (N/df — the tfidfTopTerms discipline: no
    * engine-specific ln in the hash) and the classic k1/b saturation
    * (long docs don't win on bulk, repeated terms saturate). Queries
    * are documents matching `queryPred`; their DISTINCT terms form
    * the query.
    *
    * Determinism: each term contribution is one fixed-shape double
    * chain; the per-pair sum folds contributions in TERM order
    * (collect_list → sort → seeded fold — the Bpe/list_reduce oracle
    * idiom; 0.0+x is exact in IEEE so the seed shapes match across
    * engines). The per-pair term array is ≤|query terms|.
    *
    * Scale shape: postings + doc lengths are one (doc, word) shuffle;
    * df is a vocab-keyed aggregate; the query-term frame broadcasts;
    * corpus totals ride a 1-row broadcast; per-query top-k prunes
    * through WindowGroupLimit. */
  def bm25Search(documents: DataFrame, queryPred: Column => Column,
                 k: Int = 10, k1: Double = 1.2,
                 b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sized = documents.select(col("doc_id"), col("text"),
      size(wsTokens(col("text"))).cast("long").as("dl"))
    val postings = sized
      .select(col("doc_id"), col("dl"),
        explode(wsTokens(col("text"))).as("word"))
      .groupBy(col("doc_id"), col("dl"), col("word"))
      .agg(count(lit(1)).as("tf"))
    val df = postings.groupBy(col("word"))
      .agg(count(lit(1)).as("df"))
    val totals = sized.agg(count(lit(1)).as("n_docs_total"),
      sum(col("dl")).as("total_tokens"))
    val qTerms = postings.filter(queryPred(col("doc_id")))
      .select(col("doc_id").as("query_id"), col("word")).distinct()
    val scoredTerms = postings
      .join(broadcast(qTerms), "word")
      .filter(col("doc_id") =!= col("query_id"))
      .join(df, "word")
      .crossJoin(broadcast(totals))
      .withColumn("avgdl",
        col("total_tokens").cast("double") /
          col("n_docs_total").cast("double"))
      .withColumn("contrib",
        (col("n_docs_total").cast("double") / col("df").cast("double")) *
          ((col("tf").cast("double") * lit(k1 + 1.0)) /
            (col("tf").cast("double") + lit(k1) *
              (lit(1.0 - b) + lit(b) * col("dl").cast("double") /
                col("avgdl")))))
    val summed = scoredTerms
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sort_array(collect_list(struct(col("word"), col("contrib"))))
        .as("cs"))
      .select(col("query_id"), col("doc_id"),
        aggregate(col("cs"), lit(0.0),
          (acc, x) => acc + x("contrib")).as("bm25"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("bm25").desc, col("doc_id"))
    summed.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "doc_id", "rank", "bm25")
  }

  /** Per-language Gini coefficient of token mass across documents —
    * "does 1% of the corpus carry half the tokens": the inequality
    * summary that tells a curation run whether a handful of huge
    * documents dominate a language's training signal (packing,
    * sampling and dedup all behave differently at high concentration).
    * Uses the sorted-rank identity G = (2·Σᵢ i·xᵢ − (n+1)·Σx)/(n·Σx).
    *
    * Determinism: Σ i·xᵢ is invariant under permuting equal-value
    * ranks, so the doc_id tie-break changes nothing; the product sum
    * widens to decimal(38,0) (i·x reaches ~10¹⁷ per row at corpus
    * scale — a long Σ wraps); the Gini itself is one fixed-shape
    * double chain replicated by the oracle.
    *
    * Scale shape: one rank window per language (the exact-group-
    * quantiles discipline — sort keyed on the group) + one map-side-
    * combined rollup to |langs| rows. */
  def tokenGini(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val sized = documents.select(col("lang"), col("doc_id"),
      size(wsTokens(col("text"))).cast("long").as("n_tok"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("n_tok"), col("doc_id"))
    sized.withColumn("i", row_number().over(w).cast("long"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("total_tokens"),
        sum((col("i") * col("n_tok")).cast(DecimalType(38, 0))).as("iwx"))
      .select(col("lang"), col("n_docs"), col("total_tokens"),
        ((lit(2.0) * col("iwx").cast("double") -
          (col("n_docs") + 1).cast("double") *
            col("total_tokens").cast("double")) /
          (col("n_docs").cast("double") *
            col("total_tokens").cast("double"))).as("gini"))
  }

  /** Deterministic balanced sharding: documents ranked globally by
    * (token count desc, doc_id) and dealt round-robin across
    * `nShards` — the classic LPT-flavoured greedy that bounds
    * per-shard token imbalance by one document, so every data-loader
    * worker finishes its shard at the same time (a doc_id-hash
    * assignment balances COUNTS but lets token mass skew). Emits the
    * per-doc assignment.
    *
    * Scale shape: NO global sort — the rank is the two-phase
    * prefix-sum discipline shared with [[corpusShuffle]] /
    * [[curriculumOrder]]: docs band by the integer log2 of their
    * token count (≤64 bands, ordered descending = coarse length
    * order), band counts make broadcast offsets, and within-band
    * ranks run per band partition. */
  def shardAssign(documents: DataFrame, nShards: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nShards >= 1, "nShards must be positive")
    val n = size(wsTokens(col("text"))).cast("long")
    val sized = documents.select(col("doc_id"), n.as("n_tok"))
      .withColumn("band",
        (length(bin(greatest(col("n_tok"), lit(1L)))) - 1).cast("long"))
    val counts = sized.groupBy(col("band")).agg(count(lit(1)).as("c"))
    val wb = Window.orderBy(col("band").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts.withColumn("off",
      coalesce(sum(col("c")).over(wb), lit(0L)))
    val wi = Window.partitionBy(col("band"))
      .orderBy(col("n_tok").desc, col("doc_id"))
    sized.join(broadcast(offsets.select(col("band"), col("off"))),
        Seq("band"), "left")
      .withColumn("size_rank",
        col("off") + row_number().over(wi).cast("long") - 1)
      .select(col("doc_id"), col("n_tok"), col("size_rank"),
        pmod(col("size_rank"), lit(nShards.toLong)).as("shard"))
  }

  /** Language-ID confusion matrix — the EVALUATION of [[langId]]
    * against the corpus's labeled `lang` column: per (true, predicted)
    * cell, document count and share of the true language in exact
    * integer ppm. The matrix a curation team reads before trusting
    * the router: which languages leak into which, and how much mass
    * a threshold would misroute. Two map-side-combined shuffles
    * (cells, then the |langs|-row true-language totals via window). */
  def langIdConfusion(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = langId(documents)
      .groupBy(col("lang"), col("predicted_lang"))
      .agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("lang"))
    cells
      .withColumn("n_true", sum(col("n_docs")).over(w))
      .select(col("lang"), col("predicted_lang"), col("n_docs"),
        expr("n_docs * 1000000 div n_true").as("share_of_true_ppm"),
        (col("lang") === col("predicted_lang")).as("is_correct"))
  }

  /** Tokenizer-vocabulary coverage audit: with vocab = the corpus's
    * global top-`k` words (count desc, word asc tie-break — the list
    * a frequency-truncated tokenizer would keep), report per-language
    * token mass in / out of vocab and the OOV rate in exact integer
    * ppm. The curation signal that shows which languages a shared
    * vocabulary shortchanges before any training run pays for it.
    *
    * Scale: one token-count shuffle (map-side combined), then the
    * top-k resolves per-partition before one tiny k-row exchange
    * (TakeOrderedAndProject — never a global sort), the k-row vocab
    * broadcasts, and the coverage roll-up is a second map-side
    * combined groupBy over #langs keys. The corpus is scanned twice
    * (count pass + coverage pass) — both map-only scans; at 100 TB
    * the token-count pass can be sampled upstream if vocab stability
    * allows, but the audit itself is exact by design. */
  def vocabCoverage(documents: DataFrame, k: Int = 1000): DataFrame = {
    val toks = documents.select(col("lang"),
      explode(wsTokens(col("text"))).as("w"))
    val vocab = toks.groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w").asc).limit(k)
      .select(col("w"), lit(1L).as("in_v"))
    toks.join(broadcast(vocab), Seq("w"), "left")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("in_v"), lit(0L))).as("n_in_vocab"))
      .select(col("lang"), col("n_tokens"), col("n_in_vocab"),
        expr("(n_tokens - n_in_vocab) * 1000000 div n_tokens")
          .as("oov_ppm"))
  }

  /** Policy-blocklist filter (the C4 "banned word list" gate, Raffel
    * et al. 2020 §2.2 — distinct from the QUALITY batteries: this is
    * a content-policy decision, not a fluency one), generalized to a
    * RATIO threshold so a single incidental token doesn't nuke a long
    * document: a doc is flagged iff lexicon tokens exceed
    * `maxHitPct`% of its tokens, decided by integer cross-multiply
    * (100·hits > pct·tokens — no float thresholds). Emits the
    * per-source accountability frame: doc counts, flag counts,
    * flagged ppm, and the token mass the filter would drop — the
    * numbers a data card reports next to the lexicon version.
    *
    * Scale shape: lexicon broadcasts as a literal set; hit counting
    * is map-side over one token explode; one source-keyed map-side-
    * combined aggregate. */
  def lexiconFilter(documents: DataFrame, lexicon: Seq[String],
                    maxHitPct: Int = 5): DataFrame = {
    require(lexicon.nonEmpty && maxHitPct >= 0,
      "need a lexicon and a non-negative percent threshold")
    val hits = size(filter(wsTokens(col("text")),
      w => w.isInCollection(lexicon))).cast("long")
    val toks = size(wsTokens(col("text"))).cast("long")
    documents
      .select(col("source"), toks.as("n_tokens"), hits.as("n_hits"))
      .withColumn("flagged",
        col("n_hits") * 100L > col("n_tokens") * maxHitPct.toLong)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("flagged"), 1L).otherwise(0L)).as("n_flagged"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(when(col("flagged"), col("n_tokens")).otherwise(0L))
          .as("tokens_dropped"))
      .select(col("source"), col("n_docs"), col("n_flagged"),
        expr("n_flagged * 1000000 div n_docs").as("flagged_ppm"),
        col("n_tokens"), col("tokens_dropped"))
  }

  /** Exact phrase query over a POSITIONAL inverted index — the IR
    * feature [[invertedIndex]]'s bag-of-words postings can't answer
    * ("table scan" ≠ a doc containing "table" and "scan" apart).
    * Token positions come from one posexplode; the phrase matches at
    * start position p iff word_i sits at p+i for every i — a chain
    * of (doc, position)-keyed equi-joins, each leg pre-filtered to
    * ONE phrase word, so only matching-word postings ever shuffle
    * (at web scale that is the classic positional-postings
    * intersection, never a text rescan per query). Emits per
    * matching doc the match count and first occurrence.
    *
    * All integer positions and counts — hash-exact. */
  def phraseSearch(documents: DataFrame,
                   phrase: Seq[String]): DataFrame = {
    require(phrase.size >= 2, "a phrase needs at least two words")
    val idx = documents.select(col("doc_id"),
      posexplode(wsTokens(col("text"))).as(Seq("pos", "word")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("word"))
    val start = idx.filter(col("word") === phrase.head)
      .select(col("doc_id"), col("pos"))
    phrase.zipWithIndex.tail.foldLeft(start) { case (acc, (w, i)) =>
      acc.join(idx.filter(col("word") === w)
          .select(col("doc_id"), (col("pos") - i.toLong).as("pos")),
        Seq("doc_id", "pos"))
    }
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_matches"), min(col("pos")).as("first_pos"))
  }

  /** Count–Min sketch frequency audit — the fixed-memory point-query
    * sketch next to the corpus's other mergeable summaries (bloom:
    * membership, HLL: cardinality, Misra-Gries: top-k, KMV: overlap;
    * CMS answers "how often does THIS token occur" in depth·width
    * counters regardless of vocabulary size). Counters are plain
    * integer sums over (row, sha60-cell) keys — associative,
    * merge-under-any-partitioning, and REPLICABLE exactly in SQL, so
    * unlike HLL/percentile sketches the whole frame hash-checks.
    * Each probe word reports its exact count, the CMS estimate
    * (min over rows), the overcount, and the sketch's one-sided
    * CONTRACT `est ≥ true` — an inequality that holds by
    * construction, surfaced per row like bloom_fpp_audit's fpp bound.
    *
    * Scale shape: the token scan emits `depth` (row, cell) keys per
    * occurrence into ONE map-side-combined groupBy whose world is
    * depth·width counters (256 rows here) at ANY corpus size; probes
    * and true counts are a broadcast-probe-set filter + tiny joins.
    * A streaming twin is the same fold per micro-batch (counters are
    * associative longs). */
  def countMinAudit(documents: DataFrame, width: Int = 64,
                    depth: Int = 4, probes: Seq[String]): DataFrame =
    countMinFromCounters(
      countMinCounters(documents, width, depth),
      countMinTruths(documents, probes),
      width, depth, probes)

  private def cmsCell(width: Int)(r: Column, w: Column): Column = {
    val sha60 = (c: Column) => org.apache.spark.sql.graft.GraftBridge.column(
      graft.functions.expressions.Sha60(
        org.apache.spark.sql.graft.GraftBridge.expression(c)))
    pmod(sha60(concat(lit("cms:"), r.cast("string"), lit(":"), w)),
      lit(width.toLong))
  }

  /** The CMS counter fold for one document set: `(r, cell, n)` —
    * depth·width integer counters, associative under union+re-sum
    * (the streaming twin lands one such shard per micro-batch). */
  def countMinCounters(documents: DataFrame, width: Int = 64,
                       depth: Int = 4): DataFrame = {
    require(width >= 2 && depth >= 1, "need a real sketch geometry")
    val rows = documents.sparkSession.range(depth).select(col("id").as("r"))
    documents.select(explode(wsTokens(col("text"))).as("w"))
      .crossJoin(broadcast(rows))
      .select(col("r"), cmsCell(width)(col("r"), col("w")).as("cell"))
      .groupBy("r", "cell").agg(count(lit(1)).as("n"))
  }

  /** Exact probe-word occurrence counts `(word_t, true_count)` —
    * associative like the counters, folded alongside them. */
  def countMinTruths(documents: DataFrame,
                     probes: Seq[String]): DataFrame = {
    val probeDf = broadcast(documents.sparkSession
      .createDataFrame(probes.map(Tuple1(_))).toDF("word"))
    documents.select(explode(wsTokens(col("text"))).as("w"))
      .join(probeDf, col("w") === col("word"), "left_semi")
      .groupBy(col("w").as("word_t")).agg(count(lit(1)).as("true_count"))
  }

  /** Probe readout over (possibly merged) counter/truth frames: per
    * word the exact count, min-over-rows estimate, overcount and the
    * one-sided contract. Shared by the batch audit and the
    * streaming shard store. */
  def countMinFromCounters(counters: DataFrame, truths: DataFrame,
                           width: Int, depth: Int,
                           probes: Seq[String]): DataFrame = {
    require(probes.nonEmpty, "need at least one probe word")
    val spark = counters.sparkSession
    val rows = spark.range(depth).select(col("id").as("r"))
    val probeDf = broadcast(
      spark.createDataFrame(probes.map(Tuple1(_))).toDF("word"))
    val est = probeDf.crossJoin(broadcast(rows))
      .select(col("word"), col("r"),
        cmsCell(width)(col("r"), col("word")).as("cell"))
      .join(counters, Seq("r", "cell"), "left")
      .groupBy("word")
      .agg(min(coalesce(col("n"), lit(0L))).as("cm_estimate"))
    est.join(truths, col("word") === col("word_t"), "left")
      .select(col("word"),
        coalesce(col("true_count"), lit(0L)).as("true_count"),
        col("cm_estimate"))
      .withColumn("overcount", col("cm_estimate") - col("true_count"))
      .withColumn("never_undercounts",
        col("cm_estimate") >= col("true_count"))
  }
}
