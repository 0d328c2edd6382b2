package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class SpectralSpec extends SparkSpec {

  /** Synthetic embeddings with a dominant first axis: points at
    * ±(a, b) with a ≫ b — the top principal direction is e₀. */
  private def anisotropic(n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      val s = if (i % 2 == 0) 1.0f else -1.0f
      val wiggle = ((i % 7) - 3).toFloat / 100f
      (i.toLong, Seq(s * 0.9f, wiggle, 0.01f * (i % 3)), i % 2)
    }.toDF("vec_id", "embedding", "label")
  }

  private def brute(df: DataFrame): Map[(Int, Int), (Long, Long, Long, Long)] = {
    val rows = df.select("embedding").collect()
      .map(_.getSeq[Float](0).map(x => math.floor(x.toDouble * 1024.0).toLong))
    val d = rows.head.length
    (for (i <- 0 until d; j <- i until d) yield {
      val sij = rows.map(r => r(i) * r(j)).sum
      val si = rows.map(_(i)).sum
      val sj = rows.map(_(j)).sum
      (i, j) -> ((rows.length.toLong, sij, si, sj))
    }).toMap
  }

  test("covariance matches the collected brute-force moments exactly") {
    val d = anisotropic(40)
    val expect = brute(d)
    val got = Spectral.covariance(d).collect()
    assert(got.length == expect.size, "one row per i <= j pair")
    for (r <- got) {
      val key = (r.getAs[Int]("i"), r.getAs[Int]("j"))
      val (n, sij, si, sj) = expect(key)
      assert(r.getAs[Long]("n_rows") == n)
      assert(r.getAs[Long]("s_ij") == sij, s"s_ij at $key")
      assert(r.getAs[Long]("s_i") == si)
      assert(r.getAs[Long]("s_j") == sj)
      val covNum = BigInt(n) * BigInt(sij) - BigInt(si) * BigInt(sj)
      assert(BigInt(r.getAs[java.math.BigDecimal]("cov_num")
        .toBigInteger) == covNum, s"cov_num at $key")
    }
  }

  test("covariance emits the full upper triangle on the real table") {
    val cov = Spectral.covariance(tables.embeddings)
    val dim = 64
    assert(cov.count() == dim.toLong * (dim + 1) / 2)
    assert(cov.filter(col("i") > col("j")).isEmpty)
    // diagonal covariance numerators are n·Σq² − (Σq)² ≥ 0 exactly
    assert(cov.filter(col("i") === col("j"))
      .filter(col("cov_num") < 0).isEmpty)
  }

  test("powerIterate finds the planted dominant axis") {
    val v = Spectral.powerIterate(anisotropic(50)).collect()
      .map(r => r.getAs[Int]("dim") ->
        BigInt(r.getAs[java.math.BigDecimal]("v2").toBigInteger)).toMap
    assert(v.size == 3)
    // the ±0.9 axis dominates: its loading magnitude must dwarf the
    // wiggle axes by orders of magnitude
    assert(v(0).abs > v(1).abs * 100, s"v2 = $v")
    assert(v(0).abs > v(2).abs * 100, s"v2 = $v")
  }

  test("powerIterate is the exact matrix power of the covariance") {
    val d = anisotropic(30)
    val expect = brute(d)
    val dim = 3
    val c = Array.tabulate(dim, dim) { (i, j) =>
      val (n, sij, si, sj) = expect(if (i <= j) (i, j) else (j, i))
      BigInt(n) * BigInt(sij) - BigInt(si) * BigInt(sj)
    }
    val ones = Array.fill(dim)(BigInt(1))
    val mv = (m: Array[Array[BigInt]], v: Array[BigInt]) =>
      Array.tabulate(dim)(i => (0 until dim).map(j => m(i)(j) * v(j)).sum)
    val v1 = mv(c, ones)
    val v2 = mv(c, v1)
    val got = Spectral.powerIterate(d).collect()
      .map(r => r.getAs[Int]("dim") ->
        ((BigInt(r.getAs[java.math.BigDecimal]("v1").toBigInteger),
          BigInt(r.getAs[java.math.BigDecimal]("v2").toBigInteger)))).toMap
    for (i <- 0 until dim) {
      assert(got(i)._1 == v1(i), s"v1[$i]")
      assert(got(i)._2 == v2(i), s"v2[$i]")
    }
  }

  test("isotropyAudit: trace/offdiag masses replay the triangle and " +
    "the top pair is the planted correlated one") {
    val d = anisotropic(40)
    val expect = brute(d)
    val covNum = (i: Int, j: Int) => {
      val (n, sij, si, sj) = expect((i, j))
      BigInt(n) * BigInt(sij) - BigInt(si) * BigInt(sj)
    }
    val dims = 3
    val trace = (0 until dims).map(i => covNum(i, i)).sum
    val off = (for (i <- 0 until dims; j <- i + 1 until dims)
      yield covNum(i, j).abs).sum
    val r = Spectral.isotropyAudit(d).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_dims") == dims.toLong)
    assert(BigInt(row.getAs[java.math.BigDecimal]("trace")
      .toBigInteger) == trace)
    assert(BigInt(row.getAs[java.math.BigDecimal]("offdiag_abs")
      .toBigInteger) == off)
    val pairs = for (i <- 0 until dims; j <- i + 1 until dims)
      yield (covNum(i, j).abs, i, j)
    // the operator's tie-break: highest |cov|, then SMALLEST (i, j)
    val top = pairs.sortWith { (x, y) =>
      x._1 > y._1 || (x._1 == y._1 &&
        (x._2 < y._2 || (x._2 == y._2 && x._3 < y._3)))
    }.head
    assert(row.getAs[Int]("top_i") == top._2 &&
      row.getAs[Int]("top_j") == top._3)
    assert(BigInt(row.getAs[java.math.BigDecimal]("top_abs")
      .toBigInteger) == top._1)
  }

  test("rawCovariance shards merge to the one-shot covariance on any split") {
    val d = anisotropic(40)
    val parts = (0L until 3L).map(i =>
      Spectral.rawCovariance(d.filter(col("vec_id") % 3 === i)))
    val merged = Spectral.mergeCovariance(parts.reduce(_ unionByName _))
    val direct = Spectral.covariance(d)
    assert(merged.exceptAll(direct).count() == 0 &&
      direct.exceptAll(merged).count() == 0)
  }

  test("project separates the two planted clusters along the axis") {
    val d = anisotropic(50)
    val scored = Spectral.project(d)
      .join(d.select(col("vec_id"), col("label")), "vec_id")
      .collect()
      .map(r => (r.getAs[Int]("label"),
        BigInt(r.getAs[java.math.BigDecimal]("score").toBigInteger)))
    val pos = scored.filter(_._1 == 0).map(_._2)
    val neg = scored.filter(_._1 == 1).map(_._2)
    // the +0.9 cluster and the −0.9 cluster land on opposite sides
    assert(pos.forall(s => neg.forall(t => s.signum != t.signum || s == t)),
      "clusters must not interleave in sign")
    assert(pos.map(_.signum).distinct.length == 1)
    assert(neg.map(_.signum).distinct.length == 1)
    assert(pos.head.signum == -neg.head.signum)
  }

  test("project scores every vector exactly (q · v2 replay)") {
    val d = anisotropic(20)
    val v2 = Spectral.powerIterate(d).collect()
      .map(r => r.getAs[Int]("dim") ->
        BigInt(r.getAs[java.math.BigDecimal]("v2").toBigInteger)).toMap
    val qs = d.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1024.0).toLong))
      .toMap
    val got = Spectral.project(d).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        BigInt(r.getAs[java.math.BigDecimal]("score").toBigInteger)).toMap
    for ((id, q) <- qs) {
      val expect = q.zipWithIndex.map { case (qd, i) => v2(i) * qd }.sum
      assert(got(id) == expect, s"score for vec $id")
    }
  }
}
