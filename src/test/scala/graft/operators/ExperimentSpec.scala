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
}
