package graft
object TrainBpe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables(spark, "/root/testdata/sf0.01").documents
    val m = graft.operators.Bpe.train(docs, 16, 5)
    println("MERGES:" + m.map{case (a,b) => s"""("$a" -> "$b")"""}.mkString(", "))
    spark.stop()
  }
}
