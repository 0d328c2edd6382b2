package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class VersionedTableSpec extends SparkSpec {

  private def freshPath = Files.createTempDirectory("graft_vt").toString + "/t"

  test("write/read round-trips and versions are immutable snapshots") {
    val path = freshPath
    val v0 = VersionedTable.write(tables.nation, path)
    assert(v0 == 0)
    val v1 = VersionedTable.write(tables.nation.filter(col("n_regionkey") === 0), path)
    assert(v1 == 1)
    assert(VersionedTable.read(spark, path, Some(0)).count() == 25)
    assert(VersionedTable.read(spark, path, Some(1)).count() == 5)
    // latest == v1
    assert(VersionedTable.read(spark, path).count() == 5)
    intercept[IllegalArgumentException](
      VersionedTable.read(spark, path, Some(7)))
  }

  test("upsert commits a MERGE version; old version still readable (time travel)") {
    val path = freshPath
    VersionedTable.write(tables.nation, path)
    val updates = tables.nation.filter(col("n_nationkey") < 3)
      .withColumn("n_name", concat(col("n_name"), lit("_UPDATED")))
    val v = VersionedTable.upsert(spark, path, updates, Seq("n_nationkey"))
    assert(v == 1)
    val latest = VersionedTable.read(spark, path)
    assert(latest.count() == 25)
    assert(latest.filter(col("n_name").endsWith("_UPDATED")).count() == 3)
    // VERSION AS OF 0 unchanged
    assert(VersionedTable.read(spark, path, Some(0))
      .filter(col("n_name").endsWith("_UPDATED")).count() == 0)
  }

  test("history lists one entry per commit with operations") {
    val path = freshPath
    VersionedTable.write(tables.nation, path)
    VersionedTable.upsert(spark, path,
      tables.nation.limit(1), Seq("n_nationkey"))
    VersionedTable.optimize(spark, path, Seq("n_nationkey"), numFiles = 2)
    val h = VersionedTable.history(spark, path)
      .orderBy("version").collect()
    assert(h.map(_.getAs[String]("operation")).toSeq ==
      Seq("WRITE", "MERGE", "OPTIMIZE"))
    assert(h.map(_.getAs[Long]("num_rows")).toSeq == Seq(25L, 25L, 25L))
    // optimize produced the requested file count in the new version
    val files = new java.io.File(s"$path/v=2").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files == 2)
  }
}
