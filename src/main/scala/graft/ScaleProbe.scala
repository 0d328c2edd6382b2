package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Gold}

/** Scaling probe: runs representative queries at 1× and 10× the input
  * (10× = ten disjoint copies, ids shifted where identity matters) and
  * reports rows/sec at each scale. Near-constant rows/sec ⇒ the plan's
  * cost is linear in input — the property that carries local numbers
  * to a 1000-executor cluster.
  */
object ScaleProbe {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = Tables(spark, sfDir)
    spark.range(1000000L).selectExpr("sum(id)").collect() // warmup

    def replicate(df: DataFrame, n: Int, shiftCol: Option[String]): DataFrame =
      (0 until n).map { i =>
        shiftCol.fold(df)(c => df.withColumn(c, col(c) + i * 100000000L))
      }.reduce(_ unionByName _)

    val probes: Seq[(String, Long, () => Long, Long, () => Long)] = Seq(
      ("q1_pricing", {
        val base = t.lineitem
        base.count()
      }, () => { Gold.q1Pricing(t.lineitem).count() },
        t.lineitem.count() * 10,
        () => Gold.q1Pricing(replicate(t.lineitem, 10, None)).count()),
      ("gold_region_sales", t.lineitem.count(),
        () => Gold.regionSales(t.lineitem, t.orders, t.customer,
          t.nation, t.region).count(),
        t.lineitem.count() * 10,
        () => Gold.regionSales(replicate(t.lineitem, 10, None), t.orders,
          t.customer, t.nation, t.region).count()),
      ("dedup_minhash_lsh", t.documents.count(),
        () => Dedup.minhashLsh(t.documents).count(),
        t.documents.count() * 10,
        () => Dedup.minhashLsh(
          replicate(t.documents, 10, Some("doc_id"))).count()))

    probes.foreach { case (name, rows1, run1, rows10, run10) =>
      val (_, s1) = time(run1())
      val (_, s10) = time(run10())
      val r1 = rows1 / s1
      val r10 = rows10 / s10
      println(f"""{"probe":"$name","rows_1x":$rows1,"sec_1x":$s1%.2f,"rows_10x":$rows10,"sec_10x":$s10%.2f,"rows_per_sec_1x":$r1%.0f,"rows_per_sec_10x":$r10%.0f,"scaling_efficiency":${r10 / r1}%.2f}""")
    }
    spark.stop()
  }
}
