package graft
import org.apache.spark.sql.SparkSession
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    for (n <- Seq("gold_region_sales", "q1_pricing", "dedup_minhash_lsh", "ann_bruteforce")) {
      println(s"===== $n")
      val df = Queries.queries(n)(spark, d)
      val plan = df.queryExecution.executedPlan.toString
      println(plan.linesIterator.take(45).mkString("\n"))
    }
    spark.stop()
  }
}
