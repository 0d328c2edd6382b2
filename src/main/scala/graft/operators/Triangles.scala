package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-vertex triangle counting + local clustering coefficient over
  * the word co-occurrence graph — the cohesion complement of
  * [[TextRank]]'s centrality: a high-rank word with near-zero
  * clustering is a CONNECTOR between topics, one embedded in many
  * triangles sits INSIDE a topic cluster.
  *
  * Scale: the naive wedge join pays Σ deg(v)² — quadratic in the
  * hottest vertex, exactly the skew a zipfian co-occurrence graph
  * maximizes. The classic fix (compact-forward / degree orientation)
  * is applied: every undirected edge is ORIENTED from its
  * lower-(degree, word) endpoint to the higher one, which makes each
  * out-neighborhood O(√|E|) — wedges are then pairs of OUT-edges of
  * the pivot, and every triangle is found exactly once at its
  * lowest-ordered vertex. The orientation is a computational
  * strategy only: the triangle SET (and so the per-vertex counts the
  * oracle recomputes naively) is identical. Joins shuffle (8-byte
  * hashable) word keys; the corpus is read once to build the edge
  * set, and the clustering coefficient is one fixed double
  * expression over integer counts.
  */
object Triangles {

  /** (word, deg, n_tri, clustering) for every vertex of the adjacent
    * word graph; clustering = 2·T / (deg·(deg−1)), 0 when deg < 2. */
  def wordTriangles(documents: DataFrame): DataFrame = {
    val toks = documents.select(split(col("text"), " ").as("w"))
    val prs = toks.filter(size(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(w) - 2), " +
          "i -> struct(w[i] as a, w[i+1] as b))")).as("p"))
      .select(col("p.a"), col("p.b"))
      .filter(col("a") =!= col("b"))
    // undirected edge set, canonical a < b
    val edges = prs.select(least(col("a"), col("b")).as("a"),
      greatest(col("a"), col("b")).as("b")).distinct()
    val deg = edges.select(col("a").as("word"))
      .unionByName(edges.select(col("b").as("word")))
      .groupBy("word").agg(count(lit(1)).as("deg"))
    // orient each edge toward the larger (deg, word): out-degree of
    // every vertex is O(sqrt(|E|)) under this order
    val dA = deg.select(col("word").as("a"), col("deg").as("dega"))
    val dB = deg.select(col("word").as("b"), col("deg").as("degb"))
    val oriented = edges.join(dA, "a").join(dB, "b")
      .select(
        when(col("dega") < col("degb") ||
          (col("dega") === col("degb") && col("a") < col("b")),
          struct(col("a").as("src"), col("b").as("dst")))
          .otherwise(struct(col("b").as("src"), col("a").as("dst")))
          .as("e"))
      .select(col("e.src"), col("e.dst"))
    // wedges at the pivot = pairs of out-edges (string-canonical so
    // each unordered pair appears once); close each wedge against the
    // CANONICAL undirected edge set — the pivot is the triangle's
    // (deg, word)-minimum, so every triangle closes exactly once
    val w1 = oriented.select(col("src"), col("dst").as("x"))
    val w2 = oriented.select(col("src"), col("dst").as("y"))
    val closing = edges.select(col("a").as("x"), col("b").as("y"))
    val tri = w1.join(w2, "src").filter(col("x") < col("y"))
      .join(closing.hint("shuffle_hash"), Seq("x", "y"), "left_semi")
      .select(col("src"), col("x"), col("y"))
    val perVertex = tri
      .select(explode(array(col("src"), col("x"), col("y"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n_tri"))
    deg.join(perVertex, Seq("word"), "left")
      .select(col("word"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        when(col("deg") < 2, lit(0.0))
          .otherwise((coalesce(col("n_tri"), lit(0L)).cast("double")
            * 2.0) / (col("deg").cast("double")
              * (col("deg") - 1).cast("double")))
          .as("clustering"))
  }
}
