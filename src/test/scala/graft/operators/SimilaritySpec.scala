package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  test("annBruteForce returns k ranked neighbors per query") {
    val emb = tables.embeddings
    val out = Similarity.annBruteForce(emb, emb.filter(col("vec_id") < 4), k = 5)
    val counts = out.groupBy("query_id").count().collect()
    assert(counts.length == 4 && counts.forall(_.getAs[Long]("count") == 5))
    // ranks are 1..5 and cosine non-increasing within each query
    val rows = out.orderBy("query_id", "rank").collect()
    rows.grouped(5).foreach { g =>
      assert(g.map(_.getAs[Long]("rank")).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
      val sims = g.map(_.getAs[Double]("cosine"))
      assert(sims.zip(sims.tail).forall { case (x, y) => x >= y })
    }
  }

  test("retrievalMrr: planted same-label twin ranks first, rr exact") {
    import spark.implicits._
    // label-0 queries have a near-identical label-0 twin; label-1
    // vectors point the other way — exact leg must hit at rank 1
    val base = (0 until 12).map { i =>
      val lab = i % 2
      val x = if (lab == 0) 0.9f else -0.9f
      (i.toLong, Seq(x, 0.1f * (i % 3), 0.05f * (i % 5)), lab)
    }
    val emb = base.toDF("vec_id", "embedding", "label")
    val out = Similarity.retrievalMrr(emb,
      emb.filter(col("vec_id") < 2), k = 5, dim = 3, m = 1, ksub = 4,
      sampleBudget = 12).collect()
    assert(out.length == 4, "2 queries x 2 methods")
    for (r <- out) {
      val fh = r.getAs[Long]("first_hit_rank")
      val rr = r.getAs[Long]("rr_x2520")
      if (fh == 0L) assert(rr == 0L)
      else assert(rr * fh == 2520L - (2520L % fh) && rr == 2520L / fh,
        s"rr must be the exact scaled reciprocal (fh=$fh rr=$rr)")
    }
    val exact = out.filter(_.getAs[String]("method") == "exact")
    assert(exact.forall(_.getAs[Long]("first_hit_rank") == 1L),
      "clustered labels: the exact top neighbor shares the label")
  }

  test("retrievalMrr rejects k past the lcm window") {
    val emb = tables.embeddings
    intercept[IllegalArgumentException] {
      Similarity.retrievalMrr(emb, emb.filter(col("vec_id") < 2), k = 11)
    }
  }

  test("a vector's top-1 neighbor of itself-in-corpus is itself (sanity via self-inclusion)") {
    val emb = tables.embeddings
    // query vec 0 against a corpus containing a copy of it under id -1
    val corpus = emb.unionByName(
      emb.filter(col("vec_id") === 0).withColumn("vec_id", lit(-1L)))
    val out = Similarity.annBruteForce(corpus,
      emb.filter(col("vec_id") === 0), k = 1)
    val top = out.collect().head
    assert(top.getAs[Long]("neighbor_id") == -1L)
    assert(math.abs(top.getAs[Double]("cosine") - 1.0) < 1e-12)
  }

  test("appendToIvfIndex extends the index under the frozen quantizer") {
    val emb = tables.embeddings
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivf_append").toString + "/idx"
    Similarity.buildIvfIndex(emb.filter(col("vec_id") < 100), path)
    Similarity.appendToIvfIndex(spark, path, emb.filter(col("vec_id") >= 100))
    // the appended index must equal tagging the WHOLE corpus with the
    // persisted (frozen) centroids — same rows, same clusters, no
    // dupes, no drops
    val cents = Similarity.readIndexCentroids(path)
    val expected = emb.select(col("vec_id"),
      graft.functions.VectorFunctions.l2Norm(col("embedding")).as("norm"),
      Similarity.clusterOf(col("embedding"), cents).as("cluster"))
    val got = spark.read.parquet(s"$path/data")
      .select(col("vec_id"), col("norm"), col("cluster"))
    assert(got.count() == emb.count())
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
    // queries against the appended index still prune and rank sanely
    val out = Similarity.annIvfIndexed(spark, path,
      emb.filter(col("vec_id") < 4), k = 3)
    assert(out.groupBy("query_id").count().collect()
      .forall(_.getAs[Long]("count") <= 3))
  }

  test("annRecall normalizes by the per-query exact-neighbor count") {
    val tiny = tables.embeddings.filter(col("vec_id") < 3)
    val rec = Similarity.annRecall(tiny, tiny, k = 5,
      nlist = 1, nprobe = 1, iters = 1, sampleBudget = Int.MaxValue).collect()
    assert(rec.length == 6) // 3 queries × 2 methods
    assert(rec.forall(_.getAs[Double]("recall") <= 1.0))
    // IVF with a single list is exhaustive → perfect recall even though
    // each query has only 2 eligible neighbors (< k); a flat-k
    // denominator would cap a perfect searcher at 0.4 here
    assert(rec.filter(_.getAs[String]("method") == "ivf")
      .forall(_.getAs[Double]("recall") == 1.0))
  }

  test("annIvf ranks within probed lists and achieves useful recall") {
    val emb = tables.embeddings
    val queries = emb.filter(col("vec_id") < 8)
    val ivf = Similarity.annIvf(emb, queries, nlist = 16, nprobe = 8, k = 5)
    assert(ivf.groupBy("query_id").count().collect()
      .forall(_.getAs[Long]("count") <= 5))
    // recall vs exact top-5 with generous nprobe
    val exact = Similarity.annBruteForce(emb, queries, k = 5)
      .select("query_id", "neighbor_id")
    val hits = ivf.select("query_id", "neighbor_id")
      .intersect(exact).count()
    assert(hits >= 0.3 * exact.count(), s"recall too low: $hits/40")
    // deterministic across runs (decimal-mean centroids)
    val again = Similarity.annIvf(emb, queries, nlist = 16, nprobe = 8, k = 5)
      .select("query_id", "neighbor_id", "rank")
    assert(ivf.select("query_id", "neighbor_id", "rank")
      .exceptAll(again).count() == 0)
  }

  test("materialized IVF index prunes partitions and matches annIvf exactly") {
    val emb = tables.embeddings
    val queries = emb.filter(col("vec_id") < 4)
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivfidx").toString
    Similarity.buildIvfIndex(emb, path)
    val indexed = Similarity.annIvfIndexed(spark, path, queries)
    // the probed-cluster filter reaches the file listing: partition
    // pruning, not a post-scan filter
    val plan = indexed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cluster"),
      s"no partition pruning in:\n${plan.take(2000)}")
    // identical results to the unindexed path
    val direct = Similarity.annIvf(emb, queries)
      .collect().map(_.toSeq).sortBy(_.toString)
    val viaIndex = indexed.collect().map(_.toSeq).sortBy(_.toString)
    assert(viaIndex.toSeq == direct.toSeq)
  }

  test("cached centroid training returns the identical quantizer") {
    val emb = tables.embeddings
    val a = Similarity.trainCentroids(emb, cacheKey = Some("spec-cache"))
    val b = Similarity.trainCentroids(emb, cacheKey = Some("spec-cache"))
    val fresh = Similarity.trainCentroids(emb)
    // cache hit: same instance, no retraining
    assert(a eq b)
    // and identical values to an uncached run (cache never changes results)
    assert(a.map(_.toSeq).toSeq == fresh.map(_.toSeq).toSeq)
  }

  test("annLsh candidates are a subset of brute-force scoring universe") {
    val emb = tables.embeddings
    val out = Similarity.annLsh(emb, emb.filter(col("vec_id") < 4), dim = 64)
    assert(out.count() > 0)
    assert(out.filter(col("rank") > 5).count() == 0)
    // recall sanity: every returned neighbor shares the query bucket
    assert(out.filter(col("neighbor_id") === col("query_id")).count() == 0)
  }

  test("PQ codebooks train deterministically with the right shape") {
    val emb = tables.embeddings
    val a = Similarity.trainPqCodebooks(emb)
    val b = Similarity.trainPqCodebooks(emb)
    assert(a.length == 8 && a.forall(_.length == 16) &&
      a.forall(_.forall(_.length == 8)))
    assert(a.map(_.map(_.toSeq).toSeq).toSeq ==
      b.map(_.map(_.toSeq).toSeq).toSeq)
    // subspace codebooks differ from each other (training actually
    // looked at the per-subspace data, not a shared init)
    assert(a(0).map(_.toSeq).toSeq != a(1).map(_.toSeq).toSeq)
  }

  test("annPq ranks by ADC estimate and overlaps exact search") {
    val emb = tables.embeddings
    val queries = emb.filter(col("vec_id") < 4)
    val pq = Similarity.annPq(emb, queries, k = 5)
    val nq = queries.count()
    assert(pq.count() == nq * 5)
    assert(pq.filter(col("neighbor_id") === col("query_id")).count() == 0)
    // per-query ranks are 1..5 and est_ip is non-increasing in rank
    val byQ = pq.collect().groupBy(_.getLong(0))
    byQ.values.foreach { rows =>
      val sorted = rows.sortBy(_.getLong(2))
      assert(sorted.map(_.getLong(2)).toSeq == (1L to 5L))
      val ests = sorted.map(_.getDouble(3))
      assert(ests.zip(ests.tail).forall { case (x, y) => x >= y })
    }
    // quantized search still finds a decent share of the true top-5:
    // at 100 docs / 8-byte codes, expect SOME overlap for most queries
    val bf = Similarity.annBruteForce(emb, queries, k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = pq.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).count(bf.contains)
    assert(hits >= nq) // ≥1 true neighbor recovered per query on average
  }

  test("labelCentroids: exact dyadic means, order-independent, guarded") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(0.25f, -0.5f), 0),
      (2L, Seq(0.75f, 1.0f), 0),
      (3L, Seq(0.125f, 0.375f), 1)).toDF("vec_id", "embedding", "label")
    val out = Similarity.labelCentroids(df).collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getDouble(2), r.getLong(3))).toMap
    assert(out((0, 0)) == ((0.5, 2L)) && out((0, 1)) == ((0.25, 2L)))
    assert(out((1, 0)) == ((0.125, 1L)) && out((1, 1)) == ((0.375, 1L)))
    // partition order cannot move the result (integer sums commute)
    val shuffled = Similarity.labelCentroids(tables.embeddings)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val repartitioned = Similarity.labelCentroids(
      tables.embeddings.repartition(7, col("vec_id")))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(shuffled == repartitioned)
    // the dyadic guard fires on a component below the 2^-48 grid
    val bad = Seq((1L, Seq(1e-30f), 0)).toDF("vec_id", "embedding", "label")
    val e = intercept[Exception] {
      Similarity.labelCentroids(bad).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("non-dyadic")))
  }

  test("materialized PQ index: pruned partitions, frozen-codebook append") {
    val emb = tables.embeddings
    val queries = emb.filter(col("vec_id") < 4)
    val path = java.nio.file.Files
      .createTempDirectory("graft_pqidx").toString
    val base = emb.filter(col("vec_id") % 5 =!= 0)
    val delta = emb.filter(col("vec_id") % 5 === 0)
    Similarity.buildPqIndex(base, path, m = 8, ksub = 16,
      pqSampleBudget = 128)
    Similarity.appendToPqIndex(spark, path, delta)
    val indexed = Similarity.annPqIndexed(spark, path, queries)
    // probed-cluster filter reaches the file listing
    val plan = indexed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cluster"),
      s"no partition pruning in:\n${plan.take(2000)}")
    // append under the frozen books ≡ encoding the whole corpus with
    // the BASE-trained index (quantizer and codebooks never moved)
    val cents = Similarity.readIndexCentroids(path)
    val books = Similarity.readIndexBooks(path)
    assert(books.length == 8 && books(0).length == 16)
    val stored = spark.read.parquet(s"$path/codes")
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Int]("cluster"), r.getSeq[Int](r.fieldIndex("codes"))))
      .toMap
    assert(stored.size == emb.count())
    val direct = emb.select(col("vec_id"),
        Similarity.clusterOf(col("embedding"), cents).as("cluster"),
        org.apache.spark.sql.graft.GraftBridge.column(
          graft.functions.expressions.PqCodes(
            org.apache.spark.sql.graft.GraftBridge.expression(
              col("embedding")), books)).as("codes"))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getSeq[Int](2))).toMap
    assert(stored == direct)
  }

  test("annIvfPq = cell-pruned candidates scored exactly like annPq") {
    val emb = tables.embeddings
    val queries = emb.filter(col("vec_id") < 4)
    val ivfpq = Similarity.annIvfPq(emb, queries, k = 5,
      m = 8, ksub = 16, pqSampleBudget = 128, cacheKey = Some(sfDir))
    assert(ivfpq.count() == queries.count() * 5)
    // every emitted neighbor sits in one of its query's probed cells
    val cents = Similarity.trainCentroids(emb, cacheKey = Some(sfDir))
    val allProbes = queries.select(col("vec_id").as("query_id"),
        explode(org.apache.spark.sql.graft.GraftBridge.column(
          graft.functions.expressions.NearestCentroids(
            org.apache.spark.sql.graft.GraftBridge.expression(
              col("embedding")), cents, 4))).as("cluster"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    ivfpq.select("query_id", "cluster").collect()
      .foreach(r => assert(allProbes.contains((r.getLong(0), r.getInt(1)))))
    // ADC scores agree with the full-corpus PQ path on shared pairs:
    // the composition changes candidate GENERATION, never scoring
    val pqScores = Similarity.annPq(emb, queries, k = 5,
      m = 8, ksub = 16, sampleBudget = 128, cacheKey = Some(sfDir))
      .select("query_id", "neighbor_id", "est_ip").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val shared = ivfpq.select("query_id", "neighbor_id", "est_ip")
      .collect()
      .flatMap(r => pqScores.get((r.getLong(0), r.getLong(1)))
        .map(s => (s, r.getDouble(2))))
    assert(shared.nonEmpty)
    shared.foreach { case (a, b) => assert(a == b) }
  }

  test("hybridSearch: RRF rewards docs found by both legs") {
    import spark.implicits._
    def vec(x: Float, y: Float): Seq[Float] =
      Seq(x, y) ++ Seq.fill(62)(0.0f)
    val docs = Seq(
      (1L, "alpha beta gamma"),                  // the query
      (10L, "alpha beta gamma delta"),           // lexical-only hit
      (20L, "unrelated words entirely here"),    // semantic-only hit
      (30L, "alpha beta something"),             // hit in BOTH legs
      (40L, "nothing shared at all zz")).toDF("doc_id", "text")
    val embs = Seq(
      (1L, vec(1.0f, 0.0f), 0),
      (10L, vec(0.0f, 1.0f), 0),                 // orthogonal to query
      (20L, vec(0.9f, 0.1f), 0),                 // close to query
      (30L, vec(0.8f, 0.2f), 0),                 // close to query
      (40L, vec(-1.0f, 0.0f), 0))                // opposite
      .toDF("vec_id", "embedding", "label")
      .select(col("vec_id"),
        col("embedding").cast("array<float>").as("embedding"), col("label"))
    val out = Similarity.hybridSearch(docs, embs, queryPred = _ === 1L,
      k = 2).collect()
      .map(r => r.getLong(1) -> (Option(r.get(2)).map(_.toString.toLong),
        Option(r.get(3)).map(_.toString.toLong), r.getDouble(4),
        r.getLong(5))).toMap
    // doc 30 appears in both legs → two RRF terms → top hybrid rank
    assert(out(30L)._4 == 1L, s"expected 30 first, got $out")
    assert(out(30L)._1.nonEmpty && out(30L)._2.nonEmpty)
    // single-leg docs carry exactly one term
    assert(out(10L)._2.isEmpty || out(10L)._1.isEmpty == false)
    // rrf arithmetic: doc 30's score is the two-term sum
    val s30 = out(30L)
    assert(math.abs(s30._3 - (1.0 / (60 + s30._1.get) +
      1.0 / (60 + s30._2.get))) < 1e-15)
    // hybrid ranks are dense from 1
    assert(out.values.map(_._4).toSeq.sorted == (1L to out.size).toSeq)
  }

  test("kmeansAssign: exhaustive assignment consistent with the shared quantizer") {
    val emb = tables.embeddings
    val out = Similarity.kmeansAssign(emb, cacheKey = Some(sfDir)).cache()
    assert(out.count() == emb.count())
    // clusters are quantizer cells
    assert(out.filter(col("cluster") < 0 || col("cluster") >= 16).count() == 0)
    // sizes are consistent: every row's cluster_size equals the count
    // of rows sharing its cluster, and sizes sum to the corpus
    val bad = out.groupBy("cluster")
      .agg(count(lit(1)).as("n"), first("cluster_size").as("s"))
      .filter(col("n") =!= col("s"))
    assert(bad.count() == 0)
    // assignment agrees with clusterOf under the same cached centroids
    val cents = Similarity.trainCentroids(emb, cacheKey = Some(sfDir))
    val direct = emb.select(col("vec_id"),
      Similarity.clusterOf(col("embedding"), cents).cast("long").as("c"))
    assert(out.join(direct, "vec_id")
      .filter(col("cluster") =!= col("c")).count() == 0)
    out.unpersist()
  }

  test("randomProjection: exact dots over the hyperplane grid, full shape") {
    import graft.functions.expressions.HyperplaneConstants
    val emb = tables.embeddings
    val n = emb.count()
    val out = Similarity.randomProjection(emb, dim = 64, outDim = 16)
    assert(out.count() == n * 16)
    // spot-check one vector against a driver-side sequential fold
    val v = emb.filter(col("vec_id") === 0L)
      .select("embedding").collect().head.getSeq[Float](0)
    val expected = (0 until 16).map { r =>
      var acc = 0.0
      var j = 0
      while (j < v.length) {
        acc += v(j).toDouble * HyperplaneConstants.component(r * 64 + j)
        j += 1
      }
      acc
    }
    val got = out.filter(col("vec_id") === 0L).orderBy("proj_dim")
      .collect().map(_.getDouble(2)).toSeq
    assert(got == expected)
  }

  test("randomProjection approximately preserves relative distances (JL)") {
    import spark.implicits._
    // synthetic vectors with a WIDE distance spread (scales 1..5 over
    // varied directions) — the testdata embeddings are near-uniform
    // distance, where the JL ±ε band drowns the tiny true signal
    def lcg(seed: Long): Long = (seed * 6364136223846793005L + 1442695040888963407L)
    val vecs = (0 until 24).map { i =>
      var s = lcg(i.toLong + 7)
      val scale = 1.0f + (i % 5)
      val arr = Array.fill(64) {
        s = lcg(s)
        ((s >>> 40).toFloat / (1L << 23).toFloat - 1.0f) * scale
      }
      (i.toLong, arr.toSeq)
    }
    val emb = vecs.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val orig = vecs.map { case (id, a) =>
      id -> a.map(_.toDouble).toArray }.toMap
    val proj = Similarity.randomProjection(emb, dim = 64, outDim = 16)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.sortBy(_.getLong(1)).map(_.getDouble(2)) }
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    // Pearson correlation between original and projected squared
    // distances over all pairs — JL preserves distances up to the
    // common scale factor outDim·E[c²], so correlation should be high
    val ids = orig.keys.toSeq.sorted
    val pairs = ids.combinations(2).toSeq
    val xs = pairs.map { case Seq(a, b) => d2(orig(a), orig(b)) }
    val ys = pairs.map { case Seq(a, b) =>
      d2(proj(a).toArray, proj(b).toArray) }
    def corr(x: Seq[Double], y: Seq[Double]): Double = {
      val n = x.size
      val mx = x.sum / n; val my = y.sum / n
      val cov = x.zip(y).map { case (a, b) => (a - mx) * (b - my) }.sum
      val sx = math.sqrt(x.map(a => (a - mx) * (a - mx)).sum)
      val sy = math.sqrt(y.map(b => (b - my) * (b - my)).sum)
      cov / (sx * sy)
    }
    val r = corr(xs, ys)
    assert(r > 0.5, s"JL distance correlation $r")
  }

  test("annSq8: near-lossless recall vs float brute force at k=5") {
    val qs = tables.embeddings.filter(col("vec_id") < 8)
    val exact = Similarity.annBruteForce(tables.embeddings, qs, k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sq8 = Similarity.annSq8(tables.embeddings, qs, k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sq8.size == exact.size)
    val recall = (sq8 & exact).size.toDouble / exact.size
    // 127 levels per dimension loses almost nothing — that's the
    // point of the SQ8 rung vs PQ's measured ~0.675
    assert(recall >= 0.9, s"sq8 recall $recall")
  }

  test("annSq8: integer ranking is bit-stable across reruns and clamps at ±127") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(-1.0f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f)),
      (4L, Array(0.0f, 0.0f, 0.5f))).toDF("vec_id", "embedding")
    val out = Similarity.annSq8(emb, emb.filter(col("vec_id") === 0L),
      k = 4).collect()
    // rank order: 1 (aligned), then 3/4 (orthogonal, tie broken by
    // id), then 2 (opposed); the absmax element quantizes to ±127
    assert(out.map(_.getAs[Long]("neighbor_id")).toSeq ==
      Seq(1L, 3L, 4L, 2L))
    val opposed = out.find(_.getAs[Long]("neighbor_id") == 2L).get
    assert(opposed.getAs[Long]("dot_i8") == -127L * 127L)
    assert(opposed.getAs[Double]("cosine_q") == -1.0)
    val ortho = out.find(_.getAs[Long]("neighbor_id") == 3L).get
    assert(ortho.getAs[Long]("dot_i8") == 0L &&
      ortho.getAs[Double]("cosine_q") == 0.0)
    val rerun = Similarity.annSq8(emb,
      emb.filter(col("vec_id") === 0L), k = 4).collect()
    assert(out.map(_.toString).toSeq == rerun.map(_.toString).toSeq)
  }

  test("annSq8: an all-zero corpus ranks by id at cosine 0") {
    import spark.implicits._
    val emb = (0L to 3L).map(i => (i, Array.fill(4)(0.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.annSq8(emb, emb.filter(col("vec_id") === 0L),
      k = 3).collect()
    assert(out.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(1L, 2L, 3L))
    assert(out.forall(_.getAs[Double]("cosine_q") == 0.0))
  }

  test("cellStats: populations cover the corpus, shares sum to ~1e6, " +
       "imbalance is the share times nlist") {
    val emb = tables.embeddings
    val rows = Similarity.cellStats(emb, cacheKey = Some(sfDir)).collect()
    val total = emb.count()
    assert(rows.map(_.getAs[Long]("n_vectors")).sum == total)
    // each floor-divided share loses < 1 ppm; nonempty cells ≤ nlist
    val shareSum = rows.map(_.getAs[Long]("share_ppm")).sum
    assert(shareSum <= 1000000L && shareSum > 1000000L - rows.length)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_vectors")
      assert(r.getAs[Long]("share_ppm") == n * 1000000L / total)
      assert(r.getAs[Long]("imbalance_ppm") == n * 16L * 1000000L / total)
    }
    // same frozen quantizer as the cluster surface: cell populations
    // must agree with kmeansAssign's cluster_size frame
    val sizes = Similarity.kmeansAssign(emb, cacheKey = Some(sfDir))
      .select("cluster", "cluster_size").distinct().collect()
      .map(r => r.getAs[Long]("cluster") -> r.getAs[Long]("cluster_size"))
      .toMap
    rows.foreach { r =>
      assert(sizes(r.getAs[Long]("cluster")) == r.getAs[Long]("n_vectors"))
    }
  }

  test("centroidOutliers ranks the farthest-from-prototype vectors first") {
    import spark.implicits._
    val df = Seq(
      // label 0: two aligned vectors and one pointing the other way
      (1L, Seq(1.0f, 0.0f), 0),
      (2L, Seq(0.5f, 0.0f), 0),
      (3L, Seq(-1.0f, 0.0f), 0),
      // label 1: all identical → cosine 1, ranks break on vec_id
      (4L, Seq(0.0f, 0.25f), 1),
      (5L, Seq(0.0f, 0.25f), 1)).toDF("vec_id", "embedding", "label")
    val out = Similarity.centroidOutliers(df, k = 2).collect()
      .map(r => (r.getAs[Int]("label"), r.getAs[Long]("outlier_rank")) ->
        (r.getAs[Long]("vec_id"), r.getAs[Double]("cosine"))).toMap
    // label-0 centroid is (1/6, 0): vec 3 is anti-aligned (cos −1)
    assert(out((0, 1L))._1 == 3L && out((0, 1L))._2 == -1.0)
    // vecs 1 and 2 are both perfectly aligned (cos 1) — rank 2 goes
    // to the lower vec_id
    assert(out((0, 2L))._1 == 1L && out((0, 2L))._2 == 1.0)
    assert(out((1, 1L))._1 == 4L && out((1, 1L))._2 == 1.0)
    assert(out((1, 2L))._1 == 5L)
    // k caps the per-label output
    assert(out.size == 4)
  }

  test("centroidOutliers surfaces injected junk in the corpus embeddings") {
    import spark.implicits._
    // anti-centroid junk at TINY magnitude: cosine to the prototype
    // ≈ −1 (scale-invariant) while the mean barely moves (mean is
    // NOT scale-invariant — a large junk vector would drag the
    // centroid onto itself and invert the test). Components under
    // the float-2^-24 dyadic grid snap to 0 for the exact-mean guard.
    val c = Similarity.labelCentroids(tables.embeddings)
      .filter(col("label") === 0).orderBy("dim")
      .collect().map(_.getAs[Double]("mean"))
    val norm = math.sqrt(c.map(v => v * v).sum)
    val junkVec = c.map { v =>
      val f = (-v / norm / 64.0).toFloat
      if (math.abs(f) < 6e-8f) 0.0f else f
    }.toSeq
    val junk = Seq((999999L, junkVec, 0)).toDF("vec_id", "embedding", "label")
    val out = Similarity.centroidOutliers(
      tables.embeddings.unionByName(junk), k = 3)
    val top = out.filter(col("label") === 0 && col("outlier_rank") === 1L)
      .select("vec_id").first().getLong(0)
    assert(top == 999999L)
  }

  test("annTwoStage re-ranks the PQ shortlist exactly and lifts recall") {
    val emb = tables.embeddings
    val queries = emb.filter(col("vec_id") < 8)
    val two = Similarity.annTwoStage(emb, queries, k = 5, shortlist = 20,
      m = 16, ksub = 64, sampleBudget = 512)
    val short = Similarity.annPq(emb, queries, k = 20,
      m = 16, ksub = 64, sampleBudget = 512)
    // stage 2 only reorders stage 1's candidates
    assert(two.select("query_id", "neighbor_id")
      .exceptAll(short.select("query_id", "neighbor_id")).count() == 0)
    // within each query, rank order IS exact-cosine order
    val rows = two.collect()
      .groupBy(_.getAs[Long]("query_id")).values
    rows.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      val cosines = sorted.map(_.getAs[Double]("cosine"))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b })
      assert(sorted.map(_.getAs[Long]("rank")).toSeq == (1L to rs.size))
    }
    // re-ranking cannot lose to raw PQ order truncated at k, measured
    // against the exact top-k: every exact hit PQ's top-5 finds is in
    // the shortlist too, so the exact re-rank keeps it
    val exact = Similarity.annBruteForce(emb, queries, k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq5 = Similarity.annPq(emb, queries, k = 5,
      m = 16, ksub = 64, sampleBudget = 512)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val two5 = two.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((two5 & exact).size >= (pq5 & exact).size)
  }

  test("annTwoStageRecall: twostage recall dominates pq pointwise") {
    val emb = tables.embeddings
    val out = Similarity.annTwoStageRecall(emb,
      emb.filter(col("vec_id") < 8), k = 5, shortlist = 20,
      m = 16, ksub = 64, sampleBudget = 512)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[String]("method")) ->
        r.getAs[Double]("recall")).toMap
    val queries = out.keys.map(_._1).toSet
    assert(queries.size == 8 && out.size == 16)
    // an exact hit in pq's top-5 is in the shortlist, and only exact
    // top-5 members can out-cosine it — the re-rank keeps every pq
    // hit, so twostage recall ≥ pq recall for EVERY query
    queries.foreach { q =>
      assert(out((q, "twostage")) >= out((q, "pq")),
        s"query $q: twostage ${out((q, "twostage"))} < pq ${out((q, "pq"))}")
    }
  }

  test("centroidDrift: identical snapshots ~1, inverted label ~-1") {
    import spark.implicits._
    val emb = tables.embeddings
    val same = Similarity.centroidDrift(emb, emb).collect()
    assert(same.length == 10)
    same.foreach { r =>
      assert(r.getAs[Double]("centroid_cosine") > 0.999999)
      assert(r.getAs[Long]("n_prev") == r.getAs[Long]("n_cur"))
    }
    // flip label 0's vectors: its prototype inverts, cosine → −1;
    // untouched labels stay at 1
    val flipped = emb.withColumn("embedding",
      when(col("label") === 0,
        transform(col("embedding"), v => -v)).otherwise(col("embedding")))
    val out = Similarity.centroidDrift(emb, flipped).collect()
      .map(r => r.getAs[Int]("label") -> r.getAs[Double]("centroid_cosine"))
      .toMap
    assert(out(0) < -0.999999)
    assert(out(1) > 0.999999)
  }

  test("mmrRerank diversifies: a duplicate result yields its slot; λ=1 is pure relevance") {
    import spark.implicits._
    // query 0 at (1,0); ids 1,2 are DUPLICATE perfect matches; id 3
    // is diverse at rel 0.8 with sim(1,3) = 0.8
    val df = Seq(
      (0L, Seq(1.0f, 0.0f), 0),
      (1L, Seq(1.0f, 0.0f), 0),
      (2L, Seq(1.0f, 0.0f), 0),
      (3L, Seq(0.8f, 0.6f), 0))
      .toDF("vec_id", "embedding", "label")
    val q = df.filter(col("vec_id") === 0)
    // λ=0.4: round 2 scores — dup 2: .4·1 − .6·1 = −0.2;
    // diverse 3: .4·.8 − .6·.8 = −0.16 → diversity wins the slot
    val mmr = Similarity.mmrRerank(df, q, k = 2, pool = 3, lambda = 0.4)
      .collect().map(r => r.getAs[Long]("mmr_round") ->
        r.getAs[Long]("neighbor_id")).toMap
    assert(mmr == Map(1L -> 1L, 2L -> 3L), s"got $mmr")
    // λ=1 degenerates to pure relevance: the duplicate keeps slot 2
    val pure = Similarity.mmrRerank(df, q, k = 2, pool = 3, lambda = 1.0)
      .collect().map(r => r.getAs[Long]("mmr_round") ->
        r.getAs[Long]("neighbor_id")).toMap
    assert(pure == Map(1L -> 1L, 2L -> 2L), s"got $pure")
    // rounds are distinct picks
    val full = Similarity.mmrRerank(tables.embeddings,
      tables.embeddings.filter(col("vec_id") < 4), k = 5, pool = 20)
    val perQ = full.collect().groupBy(_.getAs[Long]("query_id"))
    assert(perQ.size == 4)
    perQ.values.foreach { rs =>
      assert(rs.map(_.getAs[Long]("neighbor_id")).distinct.length == 5)
      assert(rs.map(_.getAs[Long]("mmr_round")).sorted.toSeq ==
        Seq(1L, 2L, 3L, 4L, 5L))
    }
  }

  test("embeddingCommunities: mutual guard keeps one-sided attraction " +
    "from gluing; tight groups form one community each") {
    import spark.implicits._
    // v2 points at v1 (cos .8) and v3 points at v2 (cos .6), but with
    // k=1 only (v1, v2) is MUTUAL — v3 must stay a singleton
    val emb = Seq(
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(0.8f, 0.6f), 0),
      (3L, Array(0.0f, 1.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.embeddingCommunities(emb, k = 1, nlist = 1)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("community_id"), r.getAs[Long]("community_size")))
      .toMap
    assert(out(1L) == ((1L, 2L)) && out(2L) == ((1L, 2L)))
    assert(out(3L) == ((3L, 1L)), "one-sided edge must not merge v3")
    // two well-separated triples with k=2: one community per triple,
    // labelled by its min vec_id
    val two = Seq(
      (10L, Array(1.0f, 0.0f), 0), (11L, Array(0.99f, 0.1f), 0),
      (12L, Array(0.98f, 0.15f), 0),
      (20L, Array(0.0f, 1.0f), 1), (21L, Array(0.1f, 0.99f), 1),
      (22L, Array(0.15f, 0.98f), 1)
    ).toDF("vec_id", "embedding", "label")
    val res = Similarity.embeddingCommunities(two, k = 2, nlist = 1)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Long]("community_id")).toMap
    assert(Seq(10L, 11L, 12L).forall(res(_) == 10L))
    assert(Seq(20L, 21L, 22L).forall(res(_) == 20L))
  }

  test("hardNegatives: every negative crosses the label boundary and " +
    "is the true per-anchor optimum") {
    val emb = tables.embeddings
    val out = Similarity.hardNegatives(emb, k = 5, anchorMod = 20)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // label guard: no negative shares its anchor's label
    assert(rows.forall(r =>
      r.getAs[Int]("anchor_label") != r.getAs[Int]("neg_label")))
    // ranks are contiguous 1..k per anchor with non-increasing cosine
    rows.groupBy(_.getAs[Long]("anchor_id")).foreach { case (a, g) =>
      val byRank = g.sortBy(_.getAs[Long]("rank"))
      assert(byRank.map(_.getAs[Long]("rank")).toSeq ==
        (1L to byRank.length).toSeq, s"anchor $a ranks not contiguous")
      val cos = byRank.map(_.getAs[Double]("cosine"))
      assert(cos.zip(cos.tail).forall { case (x, y) => x >= y })
    }
    // optimality: the mined top-1 equals the max different-label
    // cosine from an unrestricted brute-force recompute
    val top1 = rows.filter(_.getAs[Long]("rank") == 1L)
      .map(r => r.getAs[Long]("anchor_id") -> r.getAs[Double]("cosine"))
      .toMap
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val all = Similarity.annBruteForce(emb,
      emb.filter(col("vec_id") % 20 === 0), k = emb.count().toInt)
      .collect()
    val best = all
      .filter(r => labels(r.getAs[Long]("neighbor_id")) !=
        labels(r.getAs[Long]("query_id")))
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, g) => q -> g.map(_.getAs[Double]("cosine")).max }
    assert(top1 == best)
  }

  test("knnClassify: constructed clusters classify perfectly, ties break low") {
    import spark.implicits._
    // two tight clusters on orthogonal axes; test ids are multiples
    // of 20 sitting inside each cluster
    val df = Seq(
      (20L, Seq(1.0f, 0.0f), 7),  // test, true label 7
      (1L, Seq(0.9f, 0.1f), 7), (2L, Seq(0.95f, 0.05f), 7),
      (3L, Seq(0.85f, 0.15f), 7),
      (40L, Seq(0.0f, 1.0f), 9),  // test, true label 9
      (4L, Seq(0.1f, 0.9f), 9), (5L, Seq(0.05f, 0.95f), 9),
      (6L, Seq(0.15f, 0.85f), 9))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.knnClassify(df, k = 3, testMod = 20)
      .collect().map(r => r.getAs[Long]("query_id") -> r).toMap
    assert(out(20L).getAs[Int]("pred_label") == 7 &&
      out(20L).getAs[Boolean]("correct"))
    assert(out(40L).getAs[Int]("pred_label") == 9 &&
      out(40L).getAs[Boolean]("correct"))
    assert(out(20L).getAs[Long]("n_votes") == 3L)
    // tie case: k=2 over one neighbor of each label → smaller label
    val tie = Seq(
      (20L, Seq(1.0f, 1.0f), 5),
      (1L, Seq(1.0f, 0.99f), 5), (2L, Seq(0.99f, 1.0f), 3))
      .toDF("vec_id", "embedding", "label")
    val t = Similarity.knnClassify(tie, k = 2, testMod = 20).collect()(0)
    assert(t.getAs[Int]("pred_label") == 3 && !t.getAs[Boolean]("correct"))
  }

  test("filtered search: only matching-metadata neighbors, dense ranks") {
    import org.apache.spark.sql.functions._
    val emb = tables.embeddings
    val filtered = Similarity.annBruteForce(
      emb.filter(col("label") % 2 === 0), emb.filter(col("vec_id") < 8),
      k = 5)
    val labels = emb.select(col("vec_id").as("neighbor_id"), col("label"))
    // every neighbor satisfies the predicate
    assert(filtered.join(labels, "neighbor_id")
      .filter(col("label") % 2 =!= 0).count() == 0)
    // ranks dense 1..5 per query (a filtered INDEX, not a
    // post-filtered global top-k with holes)
    val ranks = filtered.groupBy("query_id")
      .agg(collect_set(col("rank")).as("rs")).collect()
    assert(ranks.forall(_.getAs[Seq[Long]]("rs").sorted == Seq(1L, 2L, 3L, 4L, 5L)))
  }

  test("clusterQuality: confused vectors counted, nearest labels mutual") {
    import spark.implicits._
    // label 0 lives on the x-axis, label 1 on the y-axis; vec 3 is
    // labeled 0 but points straight at label 1's centroid
    val d = Seq(
      (1L, Seq(1.0f, 0.0f), 0), (2L, Seq(0.75f, 0.25f), 0),
      (3L, Seq(0.0f, 1.0f), 0),
      (4L, Seq(0.0f, 1.0f), 1), (5L, Seq(0.25f, 0.75f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.clusterQuality(d)
      .collect().map(r => r.getAs[Int]("label") -> r).toMap
    assert(out(0).getAs[Long]("n_vectors") == 3L)
    assert(out(0).getAs[Long]("n_confused") == 1L)
    assert(out(0).getAs[Long]("confused_ppm") == 333333L)
    assert(out(1).getAs[Long]("n_confused") == 0L)
    // with two labels, nearest is mutual
    assert(out(0).getAs[Int]("nearest_label") == 1)
    assert(out(1).getAs[Int]("nearest_label") == 0)
    // the misplaced vector drags label 0's worst own-cosine down
    assert(out(0).getAs[Double]("min_cos_own") <
      out(1).getAs[Double]("min_cos_own"))
  }

  test("clusterQuality: a single label has no confusion and no neighbor") {
    import spark.implicits._
    val d = Seq((1L, Seq(1.0f, 0.0f), 7), (2L, Seq(0.5f, 0.5f), 7))
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.clusterQuality(d).collect().head
    assert(r.getAs[Long]("n_confused") == 0L)
    assert(r.isNullAt(r.fieldIndex("nearest_label")))
    assert(r.isNullAt(r.fieldIndex("nearest_centroid_cos")))
  }

  test("annDimSweep: shared prefix hides the true neighbor, full dim is the anchor") {
    import spark.implicits._
    // every vector shares the 2-dim prefix (1, 0); tails differ.
    // Full-dim nearest of query 0 is vec 5 (tail almost parallel);
    // truncated to 2 dims all cosines tie, so top-1 falls to the
    // lowest neighbor_id (vec 1) — recall@1 at dim 2 must be 0.
    val d = Seq(
      (0L, Seq(1f, 0f, 1f, 0f)),
      (1L, Seq(1f, 0f, -1f, 0f)),
      (2L, Seq(1f, 0f, 0f, 1f)),
      (3L, Seq(1f, 0f, 0f, -1f)),
      (4L, Seq(1f, 0f, -0.9f, 0.1f)),
      (5L, Seq(1f, 0f, 0.99f, 0.01f))).toDF("vec_id", "embedding")
    val out = Similarity.annDimSweep(d, d.filter(col("vec_id") === 0),
      k = 1, dims = Seq(2, 4)).collect()
    assert(out.length == 2, "one query x two swept dims")
    val byDim = out.map(r =>
      r.getAs[Long]("dim") -> r.getAs[Double]("recall")).toMap
    assert(byDim(2L) == 0.0, "prefix ties hide the true neighbor")
    assert(byDim(4L) == 1.0, "full-width slice is lossless")
  }

  test("annDimSweep emits |queries| x |dims| rows with recall in [0,1]") {
    val emb = tables.embeddings
    val out = Similarity.annDimSweep(emb, emb.filter(col("vec_id") < 4),
      k = 5, dims = Seq(8, 64)).collect()
    assert(out.length == 8)
    assert(out.forall { r =>
      val rec = r.getAs[Double]("recall"); rec >= 0.0 && rec <= 1.0 })
    // dim 64 IS the full embedding: the slice path must be lossless
    assert(out.filter(_.getAs[Long]("dim") == 64L)
      .forall(_.getAs[Double]("recall") == 1.0))
  }

  test("tripletAudit: clean geometry has no violations; a planted mislabel violates") {
    import spark.implicits._
    // two tight, well-separated label clusters + one vector whose
    // LABEL says 0 but whose geometry sits in cluster 1: its nearest
    // same-label vector is far while its nearest other-label vector
    // is nearly identical — a guaranteed margin violation
    val d = Seq(
      (0L, Seq(1f, 0f, 0.0f), 0), (20L, Seq(1f, 0f, 0.1f), 0),
      (40L, Seq(-1f, 0f, 0.0f), 1), (41L, Seq(-1f, 0f, 0.1f), 1),
      (60L, Seq(-1f, 0.01f, 0.0f), 0)) // mislabeled: lives in cluster 1
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.tripletAudit(d, anchorMod = 20, margin = 0.05)
      .collect().map(r => r.getAs[Long]("anchor_id") -> r).toMap
    assert(out.keySet == Set(0L, 20L, 40L, 60L))
    assert(!out(0L).getAs[Boolean]("violated"))
    assert(!out(20L).getAs[Boolean]("violated"))
    assert(out(60L).getAs[Boolean]("violated"),
      "the mislabeled anchor's hard negative beats its positive")
    assert(out(60L).getAs[Long]("neg_id") == 40L ||
      out(60L).getAs[Long]("neg_id") == 41L)
    for ((_, r) <- out)
      assert(r.getAs[Double]("cos_pos") <= 1.0 &&
        r.getAs[Double]("cos_neg") <= 1.0)
  }

  test("pqDistortion: zero for a corpus the codebook represents exactly") {
    import spark.implicits._
    // ksub distinct vectors, each repeated: Lloyd's converges to the
    // vectors themselves, so reconstruction is exact and every vector
    // lands in bucket 0
    val base = (0 until 4).map(i =>
      Seq.tabulate(8)(j => if (j % 4 == i) 1f else 0f))
    val d = (0 until 16).map(i => (i.toLong, base(i % 4)))
      .toDF("vec_id", "embedding")
    val out = Similarity.pqDistortion(d, dim = 8, m = 2, ksub = 4,
      sampleBudget = 16, binWidth = 0.5).collect()
    assert(out.length == 1 && out.head.getAs[Long]("bucket") == 0L &&
      out.head.getAs[Long]("n_vectors") == 16L)
    assert(out.head.getAs[Double]("bucket_lo") == 0.0)
  }

  test("pqDistortion: histogram covers the corpus and finer codebooks never hurt") {
    val emb = tables.embeddings
    val coarse = Similarity.pqDistortion(emb, m = 8, ksub = 16,
      cacheKey = Some("pqd_c")).collect()
    assert(coarse.map(_.getAs[Long]("n_vectors")).sum == emb.count())
    assert(coarse.forall(_.getAs[Long]("bucket") >= 0L),
      "squared distortion is non-negative")
  }

  test("annNprobeCurve: per-query recall is monotone in nprobe and exhaustive at nlist") {
    val emb = tables.embeddings
    val out = Similarity.annNprobeCurve(emb,
      emb.filter(col("vec_id") < 4), nprobes = Seq(1, 2, 4, 8, 16),
      k = 5).collect()
    assert(out.length == 20, "4 queries x 5 swept nprobes")
    // candidates grow with nprobe, so per-query hits cannot drop:
    // an exact member is only ever displaced by other exact members
    out.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rows) =>
      val curve = rows.sortBy(_.getAs[Long]("nprobe"))
        .map(_.getAs[Double]("recall"))
      assert(curve.zip(curve.tail).forall { case (a, b) => a <= b },
        s"recall curve must be non-decreasing: ${curve.toSeq}")
    }
    assert(out.filter(_.getAs[Long]("nprobe") == 16L)
      .forall(_.getAs[Double]("recall") == 1.0),
      "nprobe = nlist probes every cell: exhaustive search")
  }
}
