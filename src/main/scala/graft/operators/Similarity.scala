package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Scale design: queries are a SMALL set (broadcast); the corpus is
  * scanned exactly once. Brute-force ranks with a per-query window
  * (shuffle keyed on query_id — #partitions = #queries, so the
  * shuffle is tiny); the LSH variant prunes the corpus to matching
  * hyperplane-signature buckets first, which is the 100 TB path
  * (bucket join instead of full scan per query).
  */
object Similarity {

  /** Exact cosine top-k: every (query × corpus) similarity, ranked
    * per query. `queries` must be broadcast-small. */
  def annBruteForce(corpus: DataFrame, queries: DataFrame,
                    k: Int = 5): DataFrame = {
    // norms precomputed per side: the (query × corpus) step pays one
    // dot product per pair, not three
    val q = broadcast(queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"),
      VectorFunctions.l2Norm(col("embedding")).as("q_norm")))
    val scored = corpus
      .select(col("vec_id").as("neighbor_id"), col("embedding"),
        VectorFunctions.l2Norm(col("embedding")).as("c_norm"))
      .join(q, col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine",
        VectorFunctions.dot(col("q_emb"), col("embedding")) /
          (col("q_norm") * col("c_norm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }

  /** Random-hyperplane signature: bit i = sign(dot(v, h_i)) where
    * h_i components are derived from a deterministic integer hash
    * (no RNG state — reproducible across runs/executors). Packs
    * `bits` bits into an int. Map-only. */
  def hyperplaneSignature(emb: org.apache.spark.sql.Column,
                          dim: Int, bits: Int): org.apache.spark.sql.Column =
    // bind the double-promoted embedding once; the bits × dim loop
    // then indexes a bound array instead of re-promoting per element
    VectorFunctions.bind(VectorFunctions.toDoubleArray(emb), e =>
      aggregate(sequence(lit(0), lit(bits - 1)), lit(0), (acc, i) => {
        // pseudo-hyperplane component for (bit i, dim j):
        //   ((murmur3(i*dim + j) mod 2001) - 1000) / 1000  ∈ [-1, 1]
        val dotp = aggregate(sequence(lit(0), lit(dim - 1)), lit(0.0),
          (s, j) => s + element_at(e, j + 1) *
            ((pmod(hash(i * lit(dim) + j), lit(2001)) - 1000).cast("double") / 1000.0))
        acc * 2 + when(dotp > 0, 1).otherwise(0)
      }))

  // ---------- IVF (inverted-file) ANN ----------

  private def nearestCentroids(emb: org.apache.spark.sql.Column,
                               cents: Array[Array[Float]], n: Int) =
    org.apache.spark.sql.graft.GraftBridge.column(
      graft.functions.expressions.NearestCentroids(
        org.apache.spark.sql.graft.GraftBridge.expression(emb), cents, n))

  /** Deterministic mini-KMeans (Lloyd) coarse quantizer: init = the
    * nlist lowest-vec_id embeddings, per-dimension means accumulated
    * as exact decimals (partition-order-independent), fixed iteration
    * count. Centroid set is tiny (nlist × dim) — lives on the driver
    * and broadcasts inside the assignment kernel. */
  def trainCentroids(corpus: DataFrame, nlist: Int = 16,
                     iters: Int = 3): Array[Array[Float]] = {
    var cents = corpus.orderBy("vec_id").limit(nlist)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    for (_ <- 0 until iters) {
      val assigned = corpus.select(
        element_at(nearestCentroids(col("embedding"), cents, 1), 1)
          .as("cluster"),
        col("embedding"))
      // exact-decimal per-dimension mean → deterministic across
      // partition orders (double sums would drift bit-level)
      val dims = assigned
        .select(col("cluster"), posexplode(col("embedding"))
          .as(Seq("dim", "v")))
        .groupBy("cluster", "dim")
        .agg((sum(col("v").cast("decimal(20,10)")) /
          count(lit(1))).cast("float").as("mean"))
        .collect()
      val next = cents.map(_.clone())
      dims.foreach { r =>
        next(r.getAs[Int]("cluster"))(r.getAs[Int]("dim")) =
          r.getAs[Float]("mean")
      }
      cents = next
    }
    cents
  }

  /** IVF ANN: corpus rows live in their nearest-centroid list; each
    * query probes its `nprobe` closest lists and ranks exact cosine
    * only within them. At 100 TB the corpus side is partitioned by
    * cluster (shuffle once at index build), so a query touches
    * nprobe/nlist of the data. Approximate: recall depends on
    * nprobe/nlist. */
  def annIvf(corpus: DataFrame, queries: DataFrame, nlist: Int = 16,
             nprobe: Int = 4, k: Int = 5, iters: Int = 3): DataFrame = {
    val cents = trainCentroids(corpus, nlist, iters)
    val tagged = corpus.select(
      col("vec_id").as("neighbor_id"), col("embedding"),
      VectorFunctions.l2Norm(col("embedding")).as("c_norm"),
      element_at(nearestCentroids(col("embedding"), cents, 1), 1)
        .as("cluster"))
    val probes = broadcast(queries.select(
      col("vec_id").as("query_id"), col("embedding").as("q_emb"),
      VectorFunctions.l2Norm(col("embedding")).as("q_norm"),
      explode(nearestCentroids(col("embedding"), cents, nprobe))
        .as("cluster")))
    val scored = tagged.join(probes, Seq("cluster"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine",
        VectorFunctions.dot(col("q_emb"), col("embedding")) /
          (col("q_norm") * col("c_norm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cluster", "rank", "cosine")
  }

  /** LSH-bucketed ANN: corpus and queries hashed to hyperplane
    * signature buckets; candidates = bucket collisions; exact cosine
    * rank within candidates. Approximate — may miss neighbors whose
    * signatures differ. */
  def annLsh(corpus: DataFrame, queries: DataFrame, dim: Int,
             bits: Int = 8, k: Int = 5): DataFrame = {
    val sigOf = (d: DataFrame, idAs: String, embAs: String) =>
      d.select(col("vec_id").as(idAs), col("embedding").as(embAs),
        hyperplaneSignature(col("embedding"), dim, bits).as("bucket"))
    val c = sigOf(corpus, "neighbor_id", "embedding")
    val q = broadcast(sigOf(queries, "query_id", "q_emb"))
    val scored = c.join(q, Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine",
        VectorFunctions.cosine(col("q_emb"), col("embedding")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "bucket", "rank", "cosine")
  }
}
