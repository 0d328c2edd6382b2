package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact edit-distance similarity join — the entity-resolution /
  * record-linkage primitive (find all pairs of short strings within
  * Levenshtein distance d: near-identical customer names, product
  * titles, author strings). Reference scope: the cleaning/dedup
  * family next to dedup_exact and the n-gram fuzzy matchers, which
  * all miss single-character typos that edit distance catches.
  *
  * Candidate generation is the FastSS deletion neighborhood
  * (Bocek et al. 2007): if ED(a, b) ≤ d then some string obtained by
  * deleting ≤ d characters from a equals one obtained by deleting
  * ≤ d from b — so exploding each string's deletion variants and
  * equi-joining on the (hashed) variant is a COMPLETE blocking: no
  * true pair can be missed, and the final `levenshtein` verify keeps
  * the output exactly the naive all-pairs semantics the oracle runs.
  *
  * Scale: the corpus never cross-joins. Each string explodes into
  * O(len^d) 8-byte variant hashes (distinct-ed per string first, so
  * runs of repeated characters collapse); the only corpus-sized
  * shuffles carry (hash, id) rows, candidate pairs are distinct-ed as
  * bare id pairs, and the text travels only through the two id-keyed
  * verify joins. Variant buckets are capped (`maxBucket`) before pair
  * expansion — the same hot-bucket guard the LSH paths use — so one
  * degenerate value (e.g. millions of empty strings) cannot produce a
  * quadratic bucket; the cap is a documented recall switch that
  * defaults high enough to be exact on non-degenerate data, and the
  * registered query runs uncapped to keep the oracle equality strict.
  * Meant for SHORT entity fields: variant count is len·(len-1)/2 at
  * d=2, so bound the column (names, titles), not document text.
  */
object EditDistance {

  /** All deletion variants of `s` with up to `d` single-character
    * deletions, as a distinct array column (includes `s` itself). */
  private def deletionVariants(s: Column, d: Int): Column = {
    // one deletion level: s -> [s(0,i-1) ++ s(i+1,..) for every i]
    def delOnce(c: Column): Column = transform(
      sequence(lit(1), length(c)),
      i => concat(c.substr(lit(1), i - 1),
        c.substr(i + 1, length(c))))
    var out: Column = array(s)
    var frontier: Column = array(s)
    for (_ <- 1 to d) {
      frontier = array_distinct(flatten(transform(frontier, delOnce(_))))
      out = array_union(out, frontier)
    }
    array_distinct(out)
  }

  /** All (a_id, b_id, dist) pairs with a_id < b_id and
    * levenshtein ≤ maxDist over `df(strCol)`. Exact: equals the naive
    * all-pairs join (the oracle) on any input where no variant bucket
    * overflows `maxBucket` (0 = uncapped). */
  def edJoin(df: DataFrame, idCol: String, strCol: String,
             maxDist: Int = 1, maxBucket: Long = 0L): DataFrame = {
    require(maxDist >= 1 && maxDist <= 2,
      "deletion-neighborhood blocking is meant for d in {1, 2}")
    val ids = df.select(col(idCol).cast("long").as("id"),
      col(strCol).as("s"))
    val variants = ids.select(col("id"),
      explode(deletionVariants(col("s"), maxDist)).as("v"))
      .select(col("id"), xxhash64(col("v")).as("vh"))
      .distinct()
    val blocked =
      if (maxBucket <= 0L) variants
      else {
        // hot-bucket guard: degenerate values (a constant field) would
        // otherwise expand one bucket quadratically
        val hot = variants.groupBy("vh").count()
          .filter(col("count") > maxBucket).select("vh")
        variants.join(hot, Seq("vh"), "left_anti")
      }
    val cand = blocked.as("a")
      .join(blocked.as("b"), col("a.vh") === col("b.vh") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
      .distinct()
    cand
      .join(ids.select(col("id").as("a_id"), col("s").as("sa")), "a_id")
      .join(ids.select(col("id").as("b_id"), col("s").as("sb")), "b_id")
      .select(col("a_id"), col("b_id"),
        levenshtein(col("sa"), col("sb")).cast("long").as("dist"))
      .filter(col("dist") <= maxDist)
  }
}
