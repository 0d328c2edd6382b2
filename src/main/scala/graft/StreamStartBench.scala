package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Micro-benchmark: how much fixed cost does ONE AvailableNow file
  * stream run pay, start() to termination, on a tiny staged input?
  * Measurement tooling only — never on any query path. */
object StreamStartBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    graft.SessionTuning.sparkConf(cpus.toInt)
      .foreach { case (k, v) => builder.config(k, v) }
    sys.env.get("SPARK_GRAFT_PROFILE_CONF").foreach(_.split(";")
      .filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2); builder.config(k, v)
      })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val src = "/tmp/ssb_src"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(src))
    Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("id", "s").repartition(2).write.mode("overwrite").json(src)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("s", StringType)))

    val phases = scala.collection.mutable.ListBuffer[(String, Long)]()
    def runOnce(i: Int): Unit = {
      val ckpt = s"/tmp/ssb_ckpt_$i"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
      val t0 = System.nanoTime()
      var tFirstBatch = 0L
      val q = spark.readStream.schema(schema).json(src)
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          if (tFirstBatch == 0L) tFirstBatch = System.nanoTime()
          b.count(); ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      val tStarted = System.nanoTime()
      q.awaitTermination(60000)
      val tDone = System.nanoTime()
      println(f"run $i: start()=${(tStarted - t0) / 1e6}%.0fms  " +
        f"toFirstBatch=${(tFirstBatch - t0) / 1e6}%.0fms  " +
        f"total=${(tDone - t0) / 1e6}%.0fms")
    }
    (1 to 8).foreach(runOnce)
    spark.stop()
  }
}
