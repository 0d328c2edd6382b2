package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClustersSpec extends SparkSpec {

  private def cc(pairs: Seq[(Long, Long)], nodes: Seq[Long]) = {
    import spark.implicits._
    Clusters.connectedComponents(pairs.toDF("id_a", "id_b"),
        nodes.toDF("id"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("label"))
      .toMap
  }

  test("chains merge into one component labeled by the min id") {
    // 9-3-2-1 is a 3-hop chain: label 1 must propagate through two
    // intermediate nodes (exercises multiple rounds), 5-6 is separate,
    // 4/7/8 are edge-less singletons
    val labels = cc(Seq((1L, 2L), (2L, 3L), (5L, 6L), (9L, 3L)),
      1L to 9L)
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 1L,
      5L -> 5L, 6L -> 5L, 4L -> 4L, 7L -> 7L, 8L -> 8L))
  }

  test("a 10-hop chain converges through the lineage-truncation path") {
    // diameter 9 forces ≥ 8 loop rounds — the localCheckpoint branch
    // (every 4th round) runs several times and must not change results
    val labels = cc((1L to 9L).map(i => (i, i + 1)), 1L to 10L)
    assert(labels.values.toSet == Set(1L))
  }

  test("two chains joined by a bridge collapse to a single component") {
    val labels = cc(Seq((10L, 20L), (30L, 40L), (20L, 30L)),
      Seq(10L, 20L, 30L, 40L))
    assert(labels.values.toSet == Set(10L))
  }

  test("incrementalClusters folds a delta into existing labels = " +
    "the full-graph answer (merge, bridge, delta-only, singleton)") {
    import spark.implicits._
    // day 1: components {1,2,3} and {5,6}, singleton 8
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L), (6L, 5L),
      (8L, 8L)).toDF("id", "label")
    // day 2 delta {4, 7, 9}: 4 bridges the two old components
    // (4~3, 4~5), 7~9 is a delta-only pair, 9 also attaches to 8
    val deltaPairs = Seq((3L, 4L), (4L, 5L), (7L, 9L), (8L, 9L))
      .toDF("id_a", "id_b")
    val folded = Clusters.incrementalClusters(labels, deltaPairs,
      Seq(4L, 7L, 9L).toDF("id"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("label"))
      .toMap
    val full = cc(Seq((1L, 2L), (2L, 3L), (5L, 6L), (3L, 4L), (4L, 5L),
      (7L, 9L), (8L, 9L)), Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L))
    assert(folded == full)
    assert(folded == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 1L, 6L -> 1L, 7L -> 7L, 8L -> 7L, 9L -> 7L))
  }

  test("incrementalClusters on the corpus pair graph equals " +
    "duplicateClusters run from scratch") {
    val docs = tables.documents
    val pairs = Dedup.minhashLsh(docs)
    val isOld = (c: org.apache.spark.sql.Column) =>
      pmod(c, lit(4L)) =!= 0L
    val oldLabels = Clusters.duplicateClusters(
        docs.filter(isOld(col("doc_id"))),
        pairs.filter(isOld(col("id_a")) && isOld(col("id_b"))))
      .select(col("doc_id").as("id"), col("cluster_id").as("label"))
    val folded = Clusters.incrementalClusters(oldLabels,
      pairs.filter(!isOld(col("id_a")) || !isOld(col("id_b"))),
      docs.filter(!isOld(col("doc_id"))).select(col("doc_id").as("id")))
    val scratch = Clusters.duplicateClusters(docs, pairs)
      .select(col("doc_id").as("id"), col("cluster_id").as("label"))
    assert(folded.exceptAll(scratch).isEmpty &&
      scratch.exceptAll(folded).isEmpty)
  }

  private def ccStar(pairs: Seq[(Long, Long)], nodes: Seq[Long],
                     maxIters: Int = 40) = {
    import spark.implicits._
    Clusters.connectedComponentsStar(pairs.toDF("id_a", "id_b"),
        nodes.toDF("id"), maxIters)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("label"))
      .toMap
  }

  test("star algorithm matches min-label propagation on mixed graphs") {
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (9L, 3L))
    assert(ccStar(pairs, 1L to 9L) == cc(pairs, 1L to 9L))
    val bridge = Seq((10L, 20L), (30L, 40L), (20L, 30L))
    assert(ccStar(bridge, Seq(10L, 20L, 30L, 40L)) ==
      cc(bridge, Seq(10L, 20L, 30L, 40L)))
    assert(ccStar(Nil, Seq(1L, 2L)) == Map(1L -> 1L, 2L -> 2L))
  }

  test("star algorithm collapses a 200-hop chain in O(log n) rounds") {
    // diameter 199: min-label propagation needs ~199 rounds; the
    // alternating star rewrite must finish within 12 (≈ 2·log2 + slack)
    // — maxIters acts as the proof bound, not just a safety valve
    val labels = ccStar((1L to 199L).map(i => (i, i + 1)), 1L to 200L,
      maxIters = 12)
    assert(labels.values.toSet == Set(1L))
    assert(labels.size == 200)
  }

  test("duplicateClusters marks exactly one canonical doc per cluster") {
    import spark.implicits._
    val docs = (1L to 6L).toDF("doc_id")
    val pairs = Seq((2L, 4L), (4L, 6L)).toDF("id_a", "id_b")
    val out = Clusters.duplicateClusters(docs, pairs).collect()
    val byDoc = out.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byDoc(2L).getAs[Long]("cluster_id") == 2L)
    assert(byDoc(4L).getAs[Long]("cluster_id") == 2L)
    assert(byDoc(6L).getAs[Long]("cluster_id") == 2L)
    assert(byDoc(2L).getAs[Long]("cluster_size") == 3L)
    assert(out.count(_.getAs[Boolean]("is_canonical")) == 4) // 2,1,3,5
    // survivors = canonical docs: dropping !is_canonical removes the
    // transitive dups 4 and 6, keeps everything else
    assert(out.filter(_.getAs[Boolean]("is_canonical"))
      .map(_.getAs[Long]("doc_id")).sorted.toSeq == Seq(1L, 2L, 3L, 5L))
  }

  test("component output over the real corpus is deterministic") {
    val docs = tables.documents
    val a = Clusters.duplicateClusters(docs, Dedup.minhashLsh(docs))
    val b = Clusters.duplicateClusters(docs, Dedup.minhashLsh(docs))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // cluster ids are members of their own cluster
    assert(a.filter(col("cluster_id") > col("doc_id")).count() == 0)
  }

  test("clusterStats histogram accounts for every doc and every removal") {
    val docs = tables.documents
    val clusters = Clusters.duplicateClusters(docs, Dedup.minhashLsh(docs))
    val stats = Clusters.clusterStats(clusters).collect()
    // n_docs sums back to the corpus; removable sums to corpus − survivors
    assert(stats.map(_.getAs[Long]("n_docs")).sum == docs.count())
    val survivors = clusters.filter(col("is_canonical")).count()
    assert(stats.map(_.getAs[Long]("n_docs_removable")).sum ==
      docs.count() - survivors)
    // each histogram row is internally consistent
    stats.foreach { r =>
      assert(r.getAs[Long]("n_docs") ==
        r.getAs[Long]("cluster_size") * r.getAs[Long]("n_clusters"))
      assert(r.getAs[Long]("n_docs_removable") ==
        (r.getAs[Long]("cluster_size") - 1) * r.getAs[Long]("n_clusters"))
    }
  }

  test("goldenRecords resolves each field by its own survivorship rule") {
    import spark.implicits._
    // cluster {1,2,3}: canonical text from doc 1 (min id), n_chars
    // completeness from doc 3, lang mode 'de' (2 of 3), sources a+b;
    // doc 9 is a singleton that survives as itself
    val docs = Seq(
      (1L, "short", "en", "a", 5L),
      (2L, "short v2", "de", "a", 8L),
      (3L, "short v3 longer", "de", "b", 15L),
      (9L, "alone", "fr", "c", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val out = Clusters.goldenRecords(docs, pairs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.size == 2)
    val g = out(1L)
    assert(g.getAs[Long]("n_docs") == 3 &&
      g.getAs[Long]("max_n_chars") == 15 &&
      g.getAs[Long]("n_sources") == 2)
    assert(g.getAs[String]("lang_mode") == "de")
    assert(g.getAs[String]("canonical_text") == "short")
    val s = out(9L)
    assert(s.getAs[Long]("n_docs") == 1 &&
      s.getAs[String]("canonical_text") == "alone" &&
      s.getAs[String]("lang_mode") == "fr")
  }

  test("goldenRecords: lang-mode ties break to the smallest value") {
    import spark.implicits._
    val docs = Seq(
      (1L, "t1", "fr", "a", 2L),
      (2L, "t2", "de", "a", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val out = Clusters.goldenRecords(docs, pairs).collect()
    assert(out.length == 1)
    // counts tie 1-1 → 'de' < 'fr' wins deterministically
    assert(out.head.getAs[String]("lang_mode") == "de")
  }

  test("hierarchyDepth: depth(k) = depth(parent(k)) + 1 everywhere, root 0") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val nodes = spark.range(500).select(col("id").as("k"))
    val out = Clusters.hierarchyDepth(nodes, "k")
    assert(out.count() == 500L, "one depth row per node")
    val byId = out.collect()
      .map(r => r.getAs[Long]("node_id") -> r.getAs[Long]("depth")).toMap
    assert(byId(0L) == 0L)
    assert(byId.forall { case (k, d) => k == 0L || d >= 1L })
    assert(byId.values.max < 64L, "random recursive tree depth is O(log n)")
    // recompute each node's parent with the SAME derivation and check
    // the defining recurrence — the invariant pointer doubling must
    // preserve through every 2^r jump
    val sha60 = (c: org.apache.spark.sql.Column) =>
      org.apache.spark.sql.graft.GraftBridge.column(
        graft.functions.expressions.Sha60(
          org.apache.spark.sql.graft.GraftBridge.expression(c)))
    val parents = nodes.filter(col("k") > 0).select(col("k"),
      pmod(sha60(concat(lit("tree:"), col("k").cast("string"))),
        col("k")).as("p")).collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[Long]("p")).toMap
    for ((k, p) <- parents)
      assert(byId(k) == byId(p) + 1L,
        s"depth($k)=${byId(k)} but depth(parent=$p)=${byId(p)}")
  }

  test("subtreeRollup: root absorbs everything, counts obey the child recurrence") {
    import org.apache.spark.sql.functions._
    val nodes = spark.range(300).select(col("id").as("k"),
      (col("id") % 7).cast("double").as("m"))
    val out = Clusters.subtreeRollup(nodes, "k", "m").collect()
      .map(r => r.getAs[Long]("node_id") ->
        (r.getAs[Long]("subtree_n"),
          r.getAs[java.math.BigDecimal]("subtree_cents").longValueExact))
      .toMap
    assert(out.size == 300)
    // the root's subtree is the whole forest: n nodes, all cents
    assert(out(0L)._1 == 300L)
    val totalCents = (0L until 300L).map(k => (k % 7) * 100L).sum
    assert(out(0L)._2 == totalCents)
    // recurrence: subtree_n(p) = 1 + Σ subtree_n(children of p)
    val sha60 = (c: org.apache.spark.sql.Column) =>
      org.apache.spark.sql.graft.GraftBridge.column(
        graft.functions.expressions.Sha60(
          org.apache.spark.sql.graft.GraftBridge.expression(c)))
    val parentOf = nodes.filter(col("k") > 0).select(col("k"),
      pmod(sha60(concat(lit("tree:"), col("k").cast("string"))),
        col("k")).as("p")).collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[Long]("p")).toMap
    val childrenOf = parentOf.toSeq.groupBy(_._2)
      .map { case (p, kids) => p -> kids.map(_._1) }
    for (p <- out.keys) {
      val kids = childrenOf.getOrElse(p, Seq.empty)
      assert(out(p)._1 == 1L + kids.map(out(_)._1).sum,
        s"count recurrence broken at node $p")
      assert(out(p)._2 == (p % 7) * 100L + kids.map(out(_)._2).sum,
        s"cents recurrence broken at node $p")
    }
  }
}
