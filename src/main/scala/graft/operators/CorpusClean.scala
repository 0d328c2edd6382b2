package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level text cleaning for training-data pipelines: C4-style
  * removal of paragraphs that repeat across the corpus (boilerplate,
  * headers, license blocks) and intra-document duplicate-paragraph
  * removal.
  *
  * The corpus has no newline structure, so a "paragraph" is a fixed
  * run of `chunkTokens` whitespace tokens — the operators are
  * agnostic to how the chunk array is produced and would take
  * `split(text, '\n')` verbatim on newline-delimited corpora.
  *
  * Scale design (100 TB posture):
  *  - chunking is map-only (one staged projection so the token array
  *    is materialized once, not re-split per lambda);
  *  - corpus-frequency counting shuffles ONLY 8-byte chunk hashes
  *    with map-side partial aggregation;
  *  - the banned set (chunks above the frequency cap) is tiny by
  *    construction — repeated boilerplate is a shrinking fraction of
  *    a growing corpus — so it broadcasts, and document reassembly
  *    is a map-side array filter: NO explode + re-group shuffle of
  *    the full corpus text.
  */
object CorpusClean {

  private def sha60(c: Column): Column =
    org.apache.spark.sql.graft.GraftBridge.column(
      graft.functions.expressions.Sha60(
        org.apache.spark.sql.graft.GraftBridge.expression(c)))

  /** (doc_id, chunks) with `chunks` = consecutive `chunkTokens`-token
    * strings (last chunk may be shorter). Two staged selects so the
    * split token array is computed once (HOF lambdas re-evaluate
    * inline subtrees per element). */
  def chunked(documents: DataFrame, chunkTokens: Int): DataFrame = {
    require(chunkTokens >= 1, "chunkTokens must be positive")
    documents
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"),
        expr(s"""transform(
            sequence(0, int((size(toks) + ${chunkTokens - 1}) div $chunkTokens) - 1),
            i -> concat_ws(' ', slice(toks, i * $chunkTokens + 1, $chunkTokens)))""")
          .as("chunks"))
  }

  /** C4-style corpus-level paragraph dedup: any chunk whose exact
    * text occurs more than `maxFreq` times across the corpus is
    * removed from EVERY document containing it; documents are
    * reassembled in chunk order.
    *
    * Two passes over the corpus, both map-only apart from the 8-byte
    * hash-count shuffle: pass 1 counts chunk hashes, pass 2 filters
    * each document's chunk array against the broadcast banned set
    * (an O(|banned|) `array_contains` per chunk — fine while banned
    * stays broadcast-sized; beyond that, fall back to an explode +
    * anti-join + re-group, trading the map-side filter for a wide
    * shuffle). */
  def paragraphDedup(documents: DataFrame, chunkTokens: Int = 20,
                     maxFreq: Long = 1): DataFrame = {
    val ch = chunked(documents, chunkTokens)
    val banned = ch
      .select(explode(col("chunks")).as("chunk"))
      .select(sha60(col("chunk")).as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("n"))
      .filter(col("n") > maxFreq)
      .agg(sort_array(collect_list(col("h"))).as("banned"))
    ch.crossJoin(broadcast(banned))
      .select(col("doc_id"), col("chunks"),
        filter(col("chunks"),
          c => not(array_contains(col("banned"), sha60(c)))).as("kept"))
      .select(col("doc_id"),
        concat_ws(" ", col("kept")).as("text_clean"),
        size(col("chunks")).cast("long").as("n_chunks"),
        size(col("kept")).cast("long").as("n_chunks_kept"))
  }

  /** Intra-document duplicate-paragraph removal: keep each chunk's
    * FIRST occurrence within its document, preserving order. Pure
    * map-only — no shuffle at any scale (the quadratic first-index
    * scan is per-document over a handful of chunks). */
  def intraDocDedup(documents: DataFrame, chunkTokens: Int = 5): DataFrame =
    chunked(documents, chunkTokens)
      .select(col("doc_id"), col("chunks"),
        expr("filter(chunks, (c, i) -> array_position(chunks, c) = i + 1)")
          .as("kept"))
      .select(col("doc_id"),
        concat_ws(" ", col("kept")).as("text_clean"),
        size(col("chunks")).cast("long").as("n_chunks"),
        size(col("kept")).cast("long").as("n_chunks_kept"))
}
