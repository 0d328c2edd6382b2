package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.VersionedTable

/** Day-one SQL verbs a workshop user reaches for next: TRUNCATE,
  * CREATE OR REPLACE, and DML conditions carrying subqueries. */
class GraftSqlSurfaceSpec extends SparkSpec {

  private def fresh = Files.createTempDirectory("graft_sql").toString

  private def withCatalog[T](body: => T): T = {
    spark.conf.set("spark.sql.catalog.graft",
      classOf[GraftCatalog].getName)
    body
  }

  test("TRUNCATE TABLE empties the table as a new commit") {
    withCatalog {
      val path = s"$fresh/t"
      VersionedTable.write(spark.range(100).select(col("id").as("k")), path)
      spark.sql(s"TRUNCATE TABLE graft.`$path`")
      assert(spark.sql(s"SELECT count(*) FROM graft.`$path`")
        .head.getLong(0) == 0)
      // time travel to the pre-truncate snapshot still works
      assert(spark.sql(
        s"SELECT count(*) FROM graft.`$path` VERSION AS OF 0")
        .head.getLong(0) == 100)
    }
  }

  test("CREATE OR REPLACE TABLE AS SELECT swaps the table") {
    withCatalog {
      val path = s"$fresh/t"
      spark.sql(s"CREATE TABLE graft.`$path` AS SELECT 1L AS k")
      spark.sql(
        s"CREATE OR REPLACE TABLE graft.`$path` AS SELECT 2L AS k, 3L AS v")
      val r = spark.sql(s"SELECT * FROM graft.`$path`").head
      assert(r.getLong(0) == 2 && r.getLong(1) == 3)
    }
  }

  test("DELETE and UPDATE conditions with IN (subquery)") {
    withCatalog {
      val path = s"$fresh/t"
      VersionedTable.write(spark.range(100)
        .select(col("id").as("k"), (col("id") % 10).as("g")), path)
      spark.range(3).select(col("id").as("bad"))
        .createOrReplaceTempView("sql_bad_keys")
      spark.sql(s"""
        DELETE FROM graft.`$path`
        WHERE g IN (SELECT bad FROM sql_bad_keys)""")
      assert(spark.sql(s"SELECT count(*) FROM graft.`$path`")
        .head.getLong(0) == 70)
      spark.sql(s"""
        UPDATE graft.`$path` SET k = -1
        WHERE g IN (SELECT bad + 3 FROM sql_bad_keys)""")
      assert(spark.sql(
        s"SELECT count(*) FROM graft.`$path` WHERE k = -1")
        .head.getLong(0) == 30)
    }
  }
}
