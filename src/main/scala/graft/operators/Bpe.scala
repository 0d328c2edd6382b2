package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Materialize.Pinnable

/** Byte-pair-encoding tokenizer for training-data pipelines: an exact
  * BPE trainer over a bounded deterministic sample (the classic
  * word-frequency-dictionary formulation) and a distributed encoder
  * applying a FROZEN merge table — the lifecycle of a production
  * tokenizer: train offline once, ship the vocab, encode at scale.
  *
  * Scale design: training touches only the sample's word-count
  * dictionary (vocabulary-sized, collected like the IVF quantizer
  * sample — Similarity.trainCentroids); encoding is map-only via the
  * native [[graft.functions.expressions.BpeEncodeDoc]] kernel — scan
  * speed at 100 TB, no shuffle, merge table baked into the plan (a
  * broadcast-sized object at real vocab sizes).
  *
  * Determinism: merge selection breaks count ties lexicographically;
  * each merge pass is a left-to-right non-overlapping fold, replicated
  * piece-for-piece by chained `list_reduce` in the DuckDB oracle.
  */
object Bpe {

  /** Exact BPE merge training on the word-count dictionary of a
    * deterministic corpus sample (`doc_id % sampleMod == 0`). Pair
    * counts weight by word frequency and count every adjacent
    * position; the best pair is (max count, then lexicographic
    * (a, b)) — fully deterministic. Stops early when no pair repeats.
    *
    * The driver only ever holds the TOP-`dictBudget` words by (count
    * desc, word asc) — the `orderBy.limit` compiles to
    * TakeOrderedAndProject, a distributed top-K with per-partition
    * pruning, so the collect is O(dictBudget) no matter how many
    * distinct words the corpus has (a raw distinct-word collect is
    * billions of entries at 100 TB). Standard BPE trainers truncate
    * the word dictionary anyway: merges are driven by high-frequency
    * words, and the singleton tail can never win a merge. */
  def train(documents: DataFrame, numMerges: Int,
            sampleMod: Int = 5,
            dictBudget: Int = 1 << 16): Seq[(String, String)] = {
    require(numMerges >= 1, "numMerges must be positive")
    require(dictBudget >= 1, "dictBudget must be positive")
    val wordCounts: Array[(Array[String], Long)] = documents
      .filter(pmod(col("doc_id"), lit(sampleMod)) === 0)
      .select(explode(split(col("text"), " ")).as("w"))
      // training-dictionary contract: words containing the piece
      // delimiter '|' are excluded on BOTH engines — the DuckDB oracle
      // replays piece lists as '|'-joined strings, where a literal
      // pipe inside a word is unrepresentable (the Spark side's true
      // arrays wouldn't care, but the contract must be shared)
      .filter(!col("w").contains("|"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(dictBudget)
      .collect()
      .map(r => (r.getString(0).map(String.valueOf(_)).toArray, r.getLong(1)))
      .sortBy(_._1.mkString)
    var words = wordCounts
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var continue = true
    while (continue && merges.length < numMerges) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (pieces, c) =>
        var i = 0
        while (i < pieces.length - 1) {
          val k = (pieces(i), pieces(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      val repeated = counts.filter(_._2 >= 2)
      if (repeated.isEmpty) continue = false
      else {
        val best = repeated.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        words = words.map { case (pieces, c) =>
          (mergePass(pieces, best._1, best._2), c)
        }
      }
    }
    merges.toSeq
  }

  /** Fully DISTRIBUTED BPE merge induction: the word dictionary never
    * leaves the cluster (contrast [[train]]'s bounded driver
    * dictionary — at 100 TB the distinct-word frame is billions of
    * rows and lives sharded). Each round is one map-side-combined
    * adjacent-pair count over the vocabulary-keyed piece frame, a
    * distributed top-1 (`orderBy.limit(1)` → TakeOrderedAndProject;
    * the ONLY driver traffic is that one winning-pair row per round —
    * the hierarchy_depth bounded-scalar convergence pattern), then a
    * literal-baked left-fold merge over every word's piece array with
    * a `localCheckpoint` lineage cut per round. Selection rule is
    * [[train]]'s exactly: count ≥ 2, max count, ties lexicographic on
    * (a, b); merging is the same non-overlapping pass (a freshly
    * merged tail CAN absorb an immediately following `b`).
    *
    * Emits the merge table itself — (rank, piece_a, piece_b,
    * pair_count) — the artifact a production run freezes and ships to
    * [[encode]]. */
  def trainDistributed(documents: DataFrame, numMerges: Int,
                       sampleMod: Int = 5): DataFrame = {
    require(numMerges >= 1, "numMerges must be positive")
    val spark = documents.sparkSession
    var words = documents
      .filter(pmod(col("doc_id"), lit(sampleMod.toLong)) === 0)
      .select(explode(split(col("text"), " ")).as("w"))
      // same '|'-free dictionary contract as [[train]] (see there)
      .filter(!col("w").contains("|"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .select(split(col("w"), "").as("pieces"), col("c"))
      .pin(eager = false)
    val merges =
      scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var continue = true
    while (continue && merges.length < numMerges) {
      val tail = size(col("pieces")) - 1
      val best = words
        .select(explode(zip_with(
          slice(col("pieces"), lit(1), tail),
          slice(col("pieces"), lit(2), tail),
          (x, y) => struct(x.as("a"), y.as("b")))).as("p"), col("c"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("c")).as("cnt"))
        .filter(col("cnt") >= 2)
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (best.isEmpty) continue = false
      else {
        val (a, b, cnt) =
          (best.head.getString(0), best.head.getString(1),
            best.head.getLong(2))
        merges += ((a, b, cnt))
        words = words.select(
          aggregate(col("pieces"), typedLit(Seq.empty[String]),
            (acc, x) => when(
              size(acc) > 0 && element_at(acc, -1) === lit(a) &&
                x === lit(b),
              concat(slice(acc, lit(1), size(acc) - 1),
                array(lit(a + b))))
              .otherwise(concat(acc, array(x)))).as("pieces"),
          col("c"))
          // LAZY pin (the CC-loop discipline): the next round's
          // best-pair collect materializes the checkpoint — one job
          // per round instead of two, and the LAST round's merge-apply
          // (whose output no collect ever reads) never runs at all
          .pin(eager = false)
      }
    }
    import spark.implicits._
    merges.toSeq.zipWithIndex
      .map { case ((a, b, c), i) => (i + 1L, a, b, c) }
      .toDF("rank", "piece_a", "piece_b", "pair_count")
  }

  /** One left-to-right non-overlapping merge pass (the kernel's inner
    * loop, over an existing piece list). */
  private def mergePass(pieces: Array[String], a: String,
                        b: String): Array[String] = {
    val out = new Array[String](pieces.length)
    var n = 0
    var i = 0
    while (i < pieces.length) {
      if (n > 0 && out(n - 1) == a && pieces(i) == b) out(n - 1) = a + b
      else { out(n) = pieces(i); n += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(out, n)
  }

  /** The shipped merge table: [[train]]'s output (numMerges = 16,
    * sampleMod = 5) on the sf0.01 test corpus, frozen here the way a
    * production vocab is trained offline and checked in. */
  val DefaultMerges: Seq[(String, String)] = Seq(
    ("a" -> "l"), ("e" -> "r"), ("u" -> "e"), ("a" -> "n"),
    ("i" -> "n"), ("o" -> "w"), ("al" -> "ue"), ("c" -> "an"),
    ("in" -> "d"), ("o" -> "r"), ("ue" -> "ry"), ("s" -> "c"),
    ("t" -> "a"), ("v" -> "al"), ("w" -> "ind"), ("b" -> "a")
  ).map(identity)

  /** Distributed encode under a frozen merge table: per-doc encoded
    * text (words space-joined, pieces '|'-joined) + piece counts.
    * Map-only native kernel. */
  def encode(documents: DataFrame,
             merges: Seq[(String, String)] = DefaultMerges): DataFrame = {
    val enc = org.apache.spark.sql.graft.GraftBridge.column(
      graft.functions.expressions.BpeEncodeDoc(
        org.apache.spark.sql.graft.GraftBridge.expression(col("text")),
        merges))
    documents
      .select(col("doc_id"), enc.as("encoded_text"),
        size(split(col("text"), " ")).cast("long").as("n_words"))
      .select(col("doc_id"), col("encoded_text"), col("n_words"),
        size(split(col("encoded_text"), "[ |]")).cast("long").as("n_pieces"))
      .withColumn("pieces_per_word",
        col("n_pieces").cast("double") / col("n_words"))
  }

  /** Tokenizer fertility report: pieces-per-word by language — the
    * standard tokenizer-equity metric (a vocabulary trained on one
    * language fragments the others; fertility quantifies the token-
    * budget tax per language before committing to a vocab).
    *
    * Scale shape: encode is the map-only kernel; the only shuffle is
    * the |languages|-row aggregation of integer sums (map-side
    * combined); fertility is one final IEEE division per group. */
  def fertility(documents: DataFrame,
                merges: Seq[(String, String)] = DefaultMerges): DataFrame = {
    val enc = org.apache.spark.sql.graft.GraftBridge.column(
      graft.functions.expressions.BpeEncodeDoc(
        org.apache.spark.sql.graft.GraftBridge.expression(col("text")),
        merges))
    documents
      .select(col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_words"),
        size(split(enc, "[ |]")).cast("long").as("n_pieces"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_pieces")).as("n_pieces"))
      .withColumn("fertility",
        col("n_pieces").cast("double") / col("n_words"))
  }
}
