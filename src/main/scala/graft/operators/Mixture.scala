package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Token-budget mixture planning: the allocation step between "here
  * is the crawl" and "here is the training set". Given per-source
  * token masses, temperature-weighted target shares and an upsampling
  * cap, [[tokenBudgetFit]] solves the exact waterfilling allocation a
  * training run needs (reference keeps rate-based mixing only —
  * 3-Silver-to-Gold.sql:1 builds fixed gold aggregates; the
  * allocation solver is the scale-path generalization this engine
  * adds), and [[budgetSample]] materializes that allocation as a
  * deterministic document subset without ever globally sorting the
  * corpus.
  *
  * Why a solver and not a rate: `domainMix` keeps each source at rate
  * min(1, budget·w/(W·m)) — when a small source saturates (rate 1)
  * the surplus budget is silently LOST and the realized mixture
  * undershoots. The waterfilling fit redistributes that surplus
  * across unsaturated sources (the standard max-min fair allocation),
  * so the total allocation equals the budget exactly (up to one
  * floor per source) whenever the budget is feasible.
  *
  * Closed form, not iteration: sources sorted by cap/weight admit a
  * prefix structure — the saturated set is always a prefix — so ONE
  * pass of cumulative sums finds the waterline λ with
  * Σ min(cap_s, w_s·λ) = budget. No driver loop, no convergence.
  *
  * Determinism across engines: masses/caps/cumulative sums are exact
  * long sums; weights are floor∘sqrt integers (sqrt is correctly
  * rounded in IEEE, unlike pow); the waterline candidates and the
  * final per-source allocation use a fixed chain of exactly-rounded
  * double ops (one subtract, one divide; one multiply, one floor)
  * replicated verbatim in the oracle. Products stay below 2^53
  * (weight ≤ √m ≈ 3·10⁶ at 10¹³ tokens; w·λ ≤ cap ≤ 4·10¹³).
  *
  * Scale shape: the corpus is touched ONCE by a map-side-combined
  * per-source token-mass aggregate (|sources| rows out); everything
  * after runs on that tiny frame (single-partition window over
  * |sources| rows — bounded by construction, like skew_report's
  * fence frame). */
object Mixture {

  private def wsTokens(text: Column): Column = split(text, " ")

  private def saltedSha60(salt: String): Column =
    org.apache.spark.sql.graft.GraftBridge.column(
      graft.functions.expressions.Sha60(
        org.apache.spark.sql.graft.GraftBridge.expression(
          concat(lit(s"$salt:"), col("doc_id").cast("string")))))

  /** Per-source exact token masses `(source, m)` — the ONE pass over
    * the corpus every fit needs (map-side-combined, |sources| rows
    * out). Zero-token sources are excluded (they can carry no
    * allocation and their weight would be 0). */
  def sourceMasses(documents: DataFrame): DataFrame =
    documents
      .select(col("source"),
        size(wsTokens(col("text"))).cast("long").as("n_tok"))
      .groupBy(col("source")).agg(sum(col("n_tok")).as("m"))
      .filter(col("m") > 0)

  /** Masses + integer temperature weights (w = floor(sqrt(m)), the
    * α = 0.5 of domainMix) + the upsampling cap in tokens. */
  private def weighted(masses: DataFrame, maxEpochsPct: Long): DataFrame =
    masses
      .withColumn("w", floor(sqrt(col("m").cast("double"))).cast("long"))
      .withColumn("cap",
        expr(s"(m * $maxEpochsPct) div 100"))

  /** Exact waterfilling token allocation: distribute `budgetTokens`
    * across sources proportionally to w_s = floor(sqrt(m_s)), capped
    * at `cap_s = m_s·maxEpochsPct/100` tokens per source (an epoch
    * ceiling — 400 means "repeat a small source at most 4×"), with
    * surplus from capped sources redistributed among the rest.
    *
    * The waterline: sort sources by r_s = cap_s/w_s ascending; the
    * capped set is a prefix of that order, so with prefix sums
    * C_i = Σ_{j<i} cap_j and W_i = Σ_{j<i} w_j the candidate
    * waterline at row i is λ_i = (B − C_i)/(W_total − W_i), and the
    * TRUE waterline is the first λ_i < r_i (for every earlier row
    * λ_j ≥ r_j, i.e. the row saturates). No valid row means the
    * budget covers every cap — everything saturates.
    *
    * Output one row per source: (source, m_tokens, weight,
    * cap_tokens, alloc_tokens, epochs_ppm) where
    * alloc = min(cap, floor(w·λ)) and epochs_ppm = floor(10⁶·alloc/m)
    * (10⁶ = one full epoch). Σ alloc undershoots the budget by less
    * than |sources| tokens (one floor per source) when feasible. */
  def tokenBudgetFit(documents: DataFrame, budgetTokens: Long,
                     maxEpochsPct: Long = 400): DataFrame =
    fitMasses(sourceMasses(documents), budgetTokens, maxEpochsPct)

  /** The waterfilling solve itself, on a pre-aggregated
    * `(source, m)` mass frame — the entry point for callers that
    * maintain masses incrementally (the streaming mass store) or
    * probe many budgets ([[mixtureCurve]]). */
  def fitMasses(masses: DataFrame, budgetTokens: Long,
                maxEpochsPct: Long): DataFrame = {
    require(budgetTokens >= 0, "budgetTokens is the total token budget")
    require(maxEpochsPct > 0,
      "maxEpochsPct caps per-source upsampling (100 = one epoch)")
    val base = weighted(masses, maxEpochsPct)
      .withColumn("r", col("cap").cast("double") / col("w").cast("double"))
    // the whole solve — prefix sums, totals, candidate waterlines and
    // the first-valid selection — runs as layered window functions
    // over ONE waterline-ordered pass: exactly one single-partition
    // exchange on the |sources|-row frame (tiny by construction,
    // like skew_report's fence frame)
    val wOrd = Window.orderBy(col("r"), col("source"))
    val before = wOrd.rowsBetween(Window.unboundedPreceding, -1)
    val full = wOrd.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    base
      .withColumn("cum_cap", coalesce(sum(col("cap")).over(before), lit(0L)))
      .withColumn("cum_w", coalesce(sum(col("w")).over(before), lit(0L)))
      .withColumn("w_total", sum(col("w")).over(full))
      // denominator is > 0 on every row: cum_w excludes the row
      // itself, so w_total − cum_w ≥ w_row ≥ 1
      .withColumn("lambda_i",
        (lit(budgetTokens) - col("cum_cap")).cast("double") /
          (col("w_total") - col("cum_w")).cast("double"))
      .withColumn("valid", (col("lambda_i") < col("r")).cast("long"))
      .withColumn("prior_valid",
        coalesce(sum(col("valid")).over(before), lit(0L)))
      // the TRUE waterline is the first valid row's λ in waterline
      // order (valid with no prior valid); min over that ≤1-row set
      // is identity, and NULL when everything saturates
      .withColumn("lambda",
        min(when(col("valid") === 1L && col("prior_valid") === 0L,
          col("lambda_i"))).over(full))
      .select(col("source"), col("m").as("m_tokens"), col("w").as("weight"),
        col("cap").as("cap_tokens"),
        when(col("lambda").isNull, col("cap"))
          .otherwise(least(col("cap"),
            floor(col("w").cast("double") * col("lambda")).cast("long")))
          .as("alloc_tokens"))
      .withColumn("epochs_ppm",
        floor(lit(1000000.0) * col("alloc_tokens").cast("double") /
          col("m_tokens").cast("double")).cast("long"))
  }

  /** The saturation curve: [[tokenBudgetFit]] solved at a LADDER of
    * budgets in one pass — the picture that chooses a training budget
    * (where does each source saturate? where do epochs_ppm plateaus
    * begin?). The waterline's prefix structure (cap/weight order,
    * cum_cap, cum_w, w_total) is budget-INDEPENDENT, so the corpus
    * is massed once and the single-partition window runs ONCE;
    * budgets then explode against the |sources|-row frame and each
    * budget's candidate-λ selection runs as per-budget PARTITIONED
    * windows (hash exchange on the tiny frame — no extra global
    * funnel however long the ladder is).
    *
    * Output one row per (budget, source): (budget_tokens, source,
    * alloc_tokens, epochs_ppm, saturated) — the same allocation
    * tokenBudgetFit would emit at that budget, by construction. */
  def mixtureCurve(documents: DataFrame, budgets: Seq[Long],
                   maxEpochsPct: Long = 400): DataFrame = {
    require(budgets.nonEmpty && budgets.forall(_ >= 0),
      "budgets is the non-empty ladder of token budgets to solve")
    require(maxEpochsPct > 0,
      "maxEpochsPct caps per-source upsampling (100 = one epoch)")
    val base = weighted(sourceMasses(documents), maxEpochsPct)
      .withColumn("r", col("cap").cast("double") / col("w").cast("double"))
    val wOrd = Window.orderBy(col("r"), col("source"))
    val before = wOrd.rowsBetween(Window.unboundedPreceding, -1)
    val full = wOrd.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val pre = base
      .withColumn("cum_cap", coalesce(sum(col("cap")).over(before), lit(0L)))
      .withColumn("cum_w", coalesce(sum(col("w")).over(before), lit(0L)))
      .withColumn("w_total", sum(col("w")).over(full))
    val ladder = budgets.distinct.sorted
    val withB = pre.withColumn("budget_tokens",
      explode(array(ladder.map(lit(_)): _*)))
    val bOrd = Window.partitionBy(col("budget_tokens"))
      .orderBy(col("r"), col("source"))
    val bBefore = bOrd.rowsBetween(Window.unboundedPreceding, -1)
    val bFull = bOrd.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    withB
      .withColumn("lambda_i",
        (col("budget_tokens") - col("cum_cap")).cast("double") /
          (col("w_total") - col("cum_w")).cast("double"))
      .withColumn("valid", (col("lambda_i") < col("r")).cast("long"))
      .withColumn("prior_valid",
        coalesce(sum(col("valid")).over(bBefore), lit(0L)))
      .withColumn("lambda",
        min(when(col("valid") === 1L && col("prior_valid") === 0L,
          col("lambda_i"))).over(bFull))
      .withColumn("alloc_tokens",
        when(col("lambda").isNull, col("cap"))
          .otherwise(least(col("cap"),
            floor(col("w").cast("double") * col("lambda")).cast("long"))))
      .select(col("budget_tokens"), col("source"), col("alloc_tokens"),
        floor(lit(1000000.0) * col("alloc_tokens").cast("double") /
          col("m").cast("double")).cast("long").as("epochs_ppm"),
        (col("alloc_tokens") === col("cap")).as("saturated"))
  }

  /** How many high-order sha60 bits index the refinement buckets:
    * 2^12 = 4096 buckets ⇒ the exactly-sorted sliver is ~1/4096 of
    * the corpus however large the corpus is. */
  val DefaultBucketBits = 12

  /** Materialize a [[tokenBudgetFit]] allocation (at maxEpochsPct =
    * 100 — subset selection, no upsampling) as the exact document
    * set: within each source, documents are taken in salted-content-
    * hash order until the source's allocation is reached — a doc is
    * kept iff the token mass STRICTLY BEFORE it is under the
    * allocation (so the boundary doc is kept and the realized mass
    * overshoots by strictly less than one document per source).
    *
    * The hash order makes the sample reproducible across runs,
    * partitionings and engines, append-stable under corpus growth
    * within the untouched prefix, and uncorrelated with any data
    * attribute — the same contract as corpus_sample, but hitting an
    * EXACT token budget instead of an expected rate.
    *
    * Scale shape — the corpus is never globally sorted: bucket =
    * high 12 bits of the hash (order-compatible: sorting by
    * (bucket, hash) IS sorting by hash), a map-side-combined
    * (source, bucket) token histogram (≤ 4096·|sources| rows) finds
    * each source's boundary bucket by prefix sum; whole buckets
    * below/above the boundary are kept/dropped by a broadcast join
    * (map-only over the corpus); ONLY the ~1/4096 boundary sliver
    * pays a window sort. The oracle is the direct per-source
    * window cumsum — the refinement must reproduce it row-for-row.
    *
    * Output: (doc_id, source, n_tokens) of kept documents. */
  def budgetSample(documents: DataFrame, budgetTokens: Long,
                   salt: String = "budget",
                   bucketBits: Int = DefaultBucketBits): DataFrame = {
    val alloc = tokenBudgetFit(documents, budgetTokens, maxEpochsPct = 100L)
      .select(col("source"), col("alloc_tokens"))
    prefixSelect(hashedDocs(documents, salt, bucketBits), alloc, bucketBits)
      .select(col("doc_id"), col("source"), col("n_tokens"))
  }

  /** (doc_id, source, n_tokens, h, bucket) — the salted-hash order
    * key and its high-bit refinement bucket (order-compatible:
    * sorting by (bucket, h) IS sorting by h). */
  private def hashedDocs(documents: DataFrame, salt: String,
                         bucketBits: Int): DataFrame = {
    require(bucketBits >= 1 && bucketBits <= 30,
      "bucketBits sizes the refinement histogram (2^bits buckets)")
    documents
      .select(col("doc_id"), col("source"),
        size(wsTokens(col("text"))).cast("long").as("n_tokens"),
        saltedSha60(salt).as("h"))
      .withColumn("bucket", shiftright(col("h"), 60 - bucketBits))
  }

  /** Bucket-refined exact prefix selection: keep each source's
    * salted-hash-order prefix of documents whose strictly-preceding
    * token mass is under the source's `alloc_tokens`, without a
    * global sort — whole buckets classified keep/drop by a broadcast
    * (source, bucket) histogram with prefix sums, ONLY the boundary
    * sliver (≤ one bucket per source) pays a window sort. */
  private def prefixSelect(docs: DataFrame, alloc: DataFrame,
                           bucketBits: Int): DataFrame = {
    // phase 1: (source, bucket) token histogram — tiny, map-side
    // combined; classify each bucket against the source allocation
    val ordB = Window.partitionBy(col("source")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val buckets = docs.groupBy(col("source"), col("bucket"))
      .agg(sum(col("n_tokens")).as("bt"))
      .withColumn("cum_before", coalesce(sum(col("bt")).over(ordB), lit(0L)))
      .join(alloc, "source")
      .withColumn("state",
        when(col("cum_before") + col("bt") <= col("alloc_tokens"), lit("keep"))
          .when(col("cum_before") >= col("alloc_tokens"), lit("drop"))
          .otherwise(lit("refine")))
    // carry EVERY alloc column through (callers thread extra columns
    // like full_epochs along the selection), dropping only the
    // histogram mass
    val classified = docs.join(
      broadcast(buckets.drop("bt")), Seq("source", "bucket"))
    val wholeKeep = classified.filter(col("state") === "keep")
      .drop("state", "cum_before", "alloc_tokens")
    // phase 2: exact window cumsum over ONLY the boundary sliver
    // (≤ one bucket per source), seeded with the bucket's prefix mass
    val ordD = Window.partitionBy(col("source"), col("bucket"))
      .orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val refined = classified.filter(col("state") === "refine")
      .withColumn("doc_before",
        coalesce(sum(col("n_tokens")).over(ordD), lit(0L)))
      .filter(col("cum_before") + col("doc_before") < col("alloc_tokens"))
      .drop("doc_before", "state", "cum_before", "alloc_tokens")
    wholeKeep.unionByName(refined)
  }

  /** Materialize an UPSAMPLING allocation (`maxEpochsPct` > 100
    * meaningful) as the actual repeated training set: per source with
    * allocation a and mass m, every document appears
    * `full = a div m` times (epoch 0 … full−1) and the fractional
    * epoch `a mod m` is a [[budgetSample]]-style salted-hash-order
    * prefix appearing once more with epoch = full. Realized mass per
    * source = full·m + (fractional prefix mass): equals the
    * allocation up to strictly less than one boundary document, and
    * every epoch is the SAME deterministic hash order (epochs are
    * decorrelated by training-side shuffling, not by re-sampling —
    * the manifest stays reproducible).
    *
    * Scale shape: full copies are a map-only bounded explode (factor
    * ≤ maxEpochsPct/100 by the fit's cap); the fractional prefix is
    * the bucket-refined selection (no global sort). Output:
    * (doc_id, source, n_tokens, epoch). */
  def epochExpand(documents: DataFrame, budgetTokens: Long,
                  maxEpochsPct: Long = 400,
                  salt: String = "budget",
                  bucketBits: Int = DefaultBucketBits): DataFrame = {
    // the fit is a ≤|sources|-row CONTROL frame: like IVF centroid
    // frames and quantile fences it is materialized once and
    // re-enters the plan as a local relation, so the expansion's
    // several references to it replan zero window funnels; the
    // fractional prefix budget is the remainder, named alloc_tokens
    // for prefixSelect, with full_epochs threaded along the selection
    val spark = documents.sparkSession
    import spark.implicits._
    val fit = tokenBudgetFit(documents, budgetTokens, maxEpochsPct)
      .select(col("source"),
        expr("alloc_tokens div m_tokens").as("full_epochs"),
        expr("alloc_tokens % m_tokens").as("alloc_tokens"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
      .toDF("source", "full_epochs", "alloc_tokens")
    val docs = hashedDocs(documents, salt, bucketBits)
    val fullCopies = docs.join(broadcast(fit), "source")
      .filter(col("full_epochs") > 0)
      .select(col("doc_id"), col("source"), col("n_tokens"),
        explode(sequence(lit(0L), col("full_epochs") - 1)).as("epoch"))
    val fractional = prefixSelect(docs, fit, bucketBits)
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("full_epochs").as("epoch"))
    fullCopies.unionByName(fractional)
  }

  /** Materialize the [[mixtureManifest]] as PHYSICAL training shards:
    * hive-partitioned by shard = seq_id div seqsPerShard, so a
    * trainer (or a resume-from-step-N restart) reads exactly the
    * shards it needs via partition pruning — the storage-layout end
    * of the mixture pipeline (plan → token layout → files). Shards
    * inherit the manifest's determinism: same salts, same files. */
  def writeManifestShards(documents: DataFrame, path: String,
                          budgetTokens: Long, maxEpochsPct: Long = 400,
                          seqTokens: Long = 2048,
                          seqsPerShard: Long = 1024,
                          packSalt: String = "pack"): Unit = {
    require(seqsPerShard > 0, "seqsPerShard sizes the output shards")
    mixtureManifest(documents, budgetTokens, maxEpochsPct, seqTokens,
      packSalt)
      .withColumn("shard", expr(s"seq_id div $seqsPerShard"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
  }

  /** The end product of the mixture pipeline composed end-to-end:
    * fit → [[epochExpand]] → global token layout. Every (doc, epoch)
    * copy is placed in the training token stream by a salted hash of
    * (doc_id, epoch) — THIS is the shuffle that decorrelates a doc's
    * repeats (they land at unrelated stream positions) while keeping
    * the whole manifest reproducible from the salt. Positions are
    * exact global token offsets via the corpusShuffle two-phase
    * prefix-sum discipline (1024 hash-order buckets: one tiny
    * bucket-totals window, per-bucket partitioned cumsums — the
    * stream is never globally sorted), and seq_id = token_start div
    * seqTokens maps every copy to the context window a trainer
    * actually reads.
    *
    * Output: (doc_id, source, epoch, n_tokens, token_start, seq_id). */
  def mixtureManifest(documents: DataFrame, budgetTokens: Long,
                      maxEpochsPct: Long = 400, seqTokens: Long = 2048,
                      packSalt: String = "pack"): DataFrame = {
    require(seqTokens > 0, "seqTokens is the context-window length")
    val h = org.apache.spark.sql.graft.GraftBridge.column(
      graft.functions.expressions.Sha60(
        org.apache.spark.sql.graft.GraftBridge.expression(
          concat(lit(s"$packSalt:"), col("doc_id").cast("string"),
            lit(":"), col("epoch").cast("string")))))
    val keyed = epochExpand(documents, budgetTokens, maxEpochsPct)
      .withColumn("h", h)
      .withColumn("pb", shiftright(col("h"), 50))
    val totals = keyed.groupBy(col("pb"))
      .agg(sum(col("n_tokens")).as("bt"))
    val wb = Window.orderBy(col("pb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals.withColumn("off",
      coalesce(sum(col("bt")).over(wb), lit(0L)))
    val wi = Window.partitionBy(col("pb"))
      .orderBy(col("h"), col("doc_id"), col("epoch"))
      .rowsBetween(Window.unboundedPreceding, -1)
    keyed.join(broadcast(offsets.select(col("pb"), col("off"))), "pb")
      .withColumn("token_start",
        col("off") + coalesce(sum(col("n_tokens")).over(wi), lit(0L)))
      .select(col("doc_id"), col("source"), col("epoch"), col("n_tokens"),
        col("token_start"),
        expr(s"token_start div $seqTokens").as("seq_id"))
  }

  /** The max_seq_len sizing audit: for each candidate context length
    * L, how the corpus behaves under the two standard policies —
    * TRUNCATE (keep the first L tokens: how much token mass is cut)
    * and SPLIT (chunk into ⌈tok/L⌉ pieces: how many sequences the
    * corpus becomes). Per L: docs that fit outright (fit_ppm), total
    * chunks under splitting, exact token mass kept under truncation
    * and the floor-ppm loss. The curve is what picks L before
    * [[writeManifestShards]] packs anything — too short silently
    * amputates the long-document tail this audit prices.
    *
    * All integer arithmetic (counts, Σ min(tok, L), floor-ppm), so
    * the whole frame hash-checks. Scale shape: token counts are
    * map-side; each doc emits |ctxLens| tiny rows into ONE
    * map-side-combined groupBy on the |ctxLens|-key column — no
    * second scan per candidate length. */
  def contextLenFit(documents: DataFrame,
                    ctxLens: Seq[Int] = Seq(16, 32, 64, 128)): DataFrame = {
    require(ctxLens.nonEmpty && ctxLens.forall(_ >= 1),
      "context lengths must be positive")
    documents
      .select(size(split(col("text"), " ")).cast("long").as("tok"))
      .select(col("tok"), explode(
        array(ctxLens.map(l => lit(l.toLong)): _*)).as("ctx_len"))
      .groupBy("ctx_len")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("tok") <= col("ctx_len"), 1L).otherwise(0L))
          .as("n_fit"),
        sum(expr("(tok + ctx_len - 1) div ctx_len")).as("n_chunks"),
        sum(col("tok")).as("tokens_total"),
        sum(least(col("tok"), col("ctx_len"))).as("tokens_kept_trunc"))
      .select(col("ctx_len"), col("n_docs"), col("n_fit"),
        expr("n_fit * 1000000 div n_docs").as("fit_ppm"),
        col("n_chunks"), col("tokens_total"), col("tokens_kept_trunc"),
        expr("(tokens_total - tokens_kept_trunc) * 1000000" +
          " div tokens_total").as("trunc_loss_ppm"))
  }
}
