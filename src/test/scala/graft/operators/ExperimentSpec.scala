package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

class ExperimentSpec extends SparkSpec {

  private def events(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("user_id", "event_type")
  }

  test("abTest: arm totals partition users; conversions count thresholded") {
    // users 1..10: user u fires u purchase events → minCount=5 splits
    val rows = for {
      u <- 1L to 10L
      _ <- 1L to u
    } yield (u, "purchase")
    val out = Experiment.abTest(events(rows), "purchase", minCount = 5L)
      .collect().head
    assert(out.getAs[Long]("n_control") + out.getAs[Long]("n_treat") == 10L)
    assert(out.getAs[Long]("conv_control") +
      out.getAs[Long]("conv_treat") == 6L) // users 5..10
  }

  test("abTest: z² equals the hand-evaluated fixed double chain") {
    val rows = (1L to 40L).flatMap { u =>
      // even users convert (2 purchases), odd don't
      if (u % 2 == 0) Seq((u, "purchase"), (u, "purchase"))
      else Seq((u, "view"))
    }
    val r = Experiment.abTest(events(rows), "purchase", minCount = 1L)
      .collect().head
    val (nc, cc) = (r.getAs[Long]("n_control"), r.getAs[Long]("conv_control"))
    val (nt, ct) = (r.getAs[Long]("n_treat"), r.getAs[Long]("conv_treat"))
    val p1 = ct.toDouble / nt.toDouble
    val p2 = cc.toDouble / nc.toDouble
    val pp = (ct + cc).toDouble / (nt + nc).toDouble
    val expected = ((p1 - p2) * (p1 - p2)) /
      ((pp * (1.0 - pp) * (nt + nc).toDouble) / (nt * nc).toDouble)
    assert(r.getAs[Double]("z_squared") == expected)
    assert(r.getAs[Long]("lift_ppm") ==
      ct * 1000000L / nt - cc * 1000000L / nc)
  }

  test("abTest: degenerate all-convert and none-convert yield NULL z²") {
    val allConv = events((1L to 8L).map(u => (u, "purchase")))
    val row1 = Experiment.abTest(allConv, "purchase", minCount = 1L)
      .collect().head
    assert(row1.isNullAt(row1.fieldIndex("z_squared")))
    val noneConv = events((1L to 8L).map(u => (u, "view")))
    val row2 = Experiment.abTest(noneConv, "purchase", minCount = 1L)
      .collect().head
    assert(row2.isNullAt(row2.fieldIndex("z_squared")))
  }

  test("bootstrapCi: brackets are ordered, contain the sample mean, " +
    "and widen as the trim loosens") {
    val d = tables.documents
    val t1 = Experiment.bootstrapCi(d, trim = 1).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Double]("mean"), r.getAs[Double]("ci_lo"),
          r.getAs[Double]("ci_hi")))).toMap
    assert(t1.nonEmpty)
    for ((src, (mean, lo, hi)) <- t1) {
      assert(lo <= hi, s"$src bracket ordered")
      assert(mean >= lo && mean <= hi,
        s"$src: sample mean $mean outside [$lo, $hi]")
    }
    val t0 = Experiment.bootstrapCi(d, trim = 0).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi")))).toMap
    for ((src, (lo1, hi1)) <- t1.view.mapValues(v => (v._2, v._3)).toMap)
      assert(t0(src)._1 <= lo1 && t0(src)._2 >= hi1,
        s"$src: trim 0 (min/max bracket) must contain the trim 1 bracket")
  }

  test("bootstrapCi: Poisson weights hit their ppm thresholds on a " +
    "large frame") {
    import spark.implicits._
    // weight realization is a pure hash function: measure the w=0
    // share by running b=2 on 5000 single-token docs and reading the
    // resample mass (wn = sum of weights ≈ n at Poisson(1) mean 1)
    val docs = (0 until 5000).map(i => (i.toLong, "tok", "s"))
      .toDF("doc_id", "text", "source")
    val r = Experiment.bootstrapCi(docs, b = 2, trim = 0).collect().head
    // each resample mean is ws/wn = 1.0 exactly (all docs 1 token)
    assert(r.getAs[Double]("ci_lo") == 1.0 &&
      r.getAs[Double]("ci_hi") == 1.0)
    assert(r.getAs[Long]("n") == 5000L)
  }

  test("bootstrapCi rejects a bracket wider than the resample count") {
    intercept[IllegalArgumentException] {
      Experiment.bootstrapCi(tables.documents, b = 4, trim = 2)
    }
  }
}
