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
  *  - the banned set (chunks above the frequency cap) is applied via
  *    a [[CorpusClean.BannedSetPath]]: broadcast-sized sets get a
  *    map-side array filter (no corpus shuffle); larger sets get a
  *    distributed anti-join that never folds the set into one task.
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

  /** How [[paragraphDedup]] applies the banned-chunk set to the
    * corpus. A boilerplate-heavy crawl can push the banned set into
    * the millions, where the broadcast array fold (one row, one task,
    * 2 GB ceiling) and the O(|banned|) per-chunk scan both break —
    * hence two physical paths under one semantics. */
  sealed trait BannedSetPath
  object BannedSetPath {
    /** Fold the banned hashes into ONE broadcast sorted array;
      * document reassembly is a map-side array filter — no corpus
      * shuffle. Correct only while the banned set is broadcast-sized
      * (the fold is a single-task row; each chunk pays an
      * O(|banned|) scan). */
    case object Broadcast extends BannedSetPath
    /** posexplode + distributed LEFT ANTI hash join on the chunk hash
      * + ordered re-group. The corpus text pays one wide shuffle, but
      * the banned set stays distributed — no single-task fold, no row
      * ceiling, no per-chunk linear scan: the 100 TB path when
      * boilerplate is abundant. */
    case object AntiJoin extends BannedSetPath
    /** Count the banned set, then pick (≤ `broadcastLimit` →
      * [[Broadcast]]). The count is one extra job over the 8-byte
      * hash aggregate, and the chosen path re-derives the banned set
      * lazily — callers that know their corpus pick an explicit path
      * and skip both costs. */
    final case class Auto(broadcastLimit: Long = 1L << 20) extends BannedSetPath
  }

  /** C4-style corpus-level paragraph dedup: any chunk whose exact
    * text occurs more than `maxFreq` times across the corpus is
    * removed from EVERY document containing it; documents are
    * reassembled in chunk order.
    *
    * Pass 1 counts chunk hashes (shuffles ONLY 8-byte hashes, with
    * map-side partial aggregation); pass 2 filters each document's
    * chunks via the [[BannedSetPath]] — map-side broadcast-array
    * filter for small banned sets, distributed anti-join for large
    * ones. Both paths are oracle-identical. */
  def paragraphDedup(documents: DataFrame, chunkTokens: Int = 20,
                     maxFreq: Long = 1,
                     path: BannedSetPath = BannedSetPath.Auto()): DataFrame = {
    val ch = chunked(documents, chunkTokens)
    val banned = ch
      .select(explode(col("chunks")).as("chunk"))
      .select(sha60(col("chunk")).as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("n"))
      .filter(col("n") > maxFreq)
      .select(col("h"))
    path match {
      case BannedSetPath.Auto(limit) =>
        val chosen =
          if (banned.count() <= limit) BannedSetPath.Broadcast
          else BannedSetPath.AntiJoin
        assemble(ch, banned, chosen)
      case explicit => assemble(ch, banned, explicit)
    }
  }

  private def assemble(ch: DataFrame, banned: DataFrame,
                       path: BannedSetPath): DataFrame = path match {
    case BannedSetPath.Broadcast =>
      val bannedArr = banned
        .agg(sort_array(collect_list(col("h"))).as("banned"))
      ch.crossJoin(broadcast(bannedArr))
        .select(col("doc_id"), col("chunks"),
          filter(col("chunks"),
            c => not(array_contains(col("banned"), sha60(c)))).as("kept"))
        .select(col("doc_id"),
          concat_ws(" ", col("kept")).as("text_clean"),
          size(col("chunks")).cast("long").as("n_chunks"),
          size(col("kept")).cast("long").as("n_chunks_kept"))
    case BannedSetPath.AntiJoin =>
      val ex = ch
        .select(col("doc_id"),
          posexplode(col("chunks")).as(Seq("chunk_id", "chunk")))
        .select(col("doc_id"), col("chunk_id"), col("chunk"),
          sha60(col("chunk")).as("h"))
      // re-group sorts the surviving (chunk_id, chunk) structs —
      // struct ordering compares chunk_id first, so document order is
      // restored deterministically regardless of shuffle order
      val re = ex.join(banned, Seq("h"), "left_anti")
        .groupBy(col("doc_id"))
        .agg(
          array_join(
            transform(
              array_sort(collect_list(struct(col("chunk_id"), col("chunk")))),
              x => x.getField("chunk")), " ").as("text_clean"),
          count(lit(1)).as("n_chunks_kept"))
      // docs whose every chunk was banned vanish from the re-group —
      // restore them with empty text (matches the broadcast path)
      ch.select(col("doc_id"), size(col("chunks")).cast("long").as("n_chunks"))
        .join(re, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("text_clean"), lit("")).as("text_clean"),
          col("n_chunks"),
          coalesce(col("n_chunks_kept"), lit(0L)).as("n_chunks_kept"))
    case BannedSetPath.Auto(_) =>
      throw new IllegalStateException("Auto resolves before assemble")
  }

  /** Per-SOURCE boilerplate strip: a chunk that occurs in more than
    * `maxDocs` DISTINCT documents of the SAME source is that site's
    * boilerplate (cookie banner, nav header, license footer) and is
    * removed from every document of that source — the CCNet-style
    * per-domain pass that [[paragraphDedup]]'s corpus-global
    * frequency can't express: a phrase ubiquitous on one site but
    * rare globally survives the global cap yet is pure template
    * noise within its domain. Counting DISTINCT documents (not raw
    * occurrences) keeps a chunk repeated inside one document from
    * being mistaken for cross-document template.
    *
    * Scale shape: occurrence dedup and frequency counting shuffle
    * ONLY (source, 8-byte hash, doc_id) triples with map-side
    * combine; the banned set stays distributed — the strip is a
    * LEFT ANTI hash join on (source, hash), no single-task fold, no
    * broadcast ceiling (a big crawl's per-domain template set is
    * exactly the case that outgrows a broadcast). Ordered re-group
    * restores chunk order per document. */
  def boilerplatePerSource(documents: DataFrame, chunkTokens: Int = 20,
                           maxDocs: Long = 1): DataFrame = {
    val ch = documents
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("source"),
        expr(s"""transform(
            sequence(0, int((size(toks) + ${chunkTokens - 1}) div $chunkTokens) - 1),
            i -> concat_ws(' ', slice(toks, i * $chunkTokens + 1, $chunkTokens)))""")
          .as("chunks"))
    val ex = ch
      .select(col("doc_id"), col("source"),
        posexplode(col("chunks")).as(Seq("chunk_id", "chunk")))
      .select(col("doc_id"), col("source"), col("chunk_id"), col("chunk"),
        sha60(col("chunk")).as("h"))
    val banned = ex
      .select(col("source"), col("h"), col("doc_id")).distinct()
      .groupBy(col("source"), col("h"))
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") > maxDocs)
      .select(col("source"), col("h"))
    val re = ex.join(banned, Seq("source", "h"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("chunk_id"), col("chunk")))),
            x => x.getField("chunk")), " ").as("text_clean"),
        count(lit(1)).as("n_chunks_kept"))
    ch.select(col("doc_id"), col("source"),
        size(col("chunks")).cast("long").as("n_chunks"))
      .join(re, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        coalesce(col("text_clean"), lit("")).as("text_clean"),
        col("n_chunks"),
        coalesce(col("n_chunks_kept"), lit(0L)).as("n_chunks_kept"))
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
