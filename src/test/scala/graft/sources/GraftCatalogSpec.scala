package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.VersionedTable

/** The `graft` path catalog: versioned tables behind plain SQL names
  * with time-travel syntax — `graft.`/path`` resolves through the
  * pushdown-wired V2 table, `VERSION AS OF`/`TIMESTAMP AS OF` pin
  * snapshots, INSERT INTO and CTAS run the commit protocol, DROP
  * removes the table. */
class GraftCatalogSpec extends SparkSpec {

  private def fresh = Files.createTempDirectory("graft_cat").toString

  private def withCatalog[T](body: => T): T = {
    spark.conf.set("spark.sql.catalog.graft",
      classOf[GraftCatalog].getName)
    body
  }

  test("SELECT, VERSION AS OF, and TIMESTAMP AS OF on a catalog name") {
    withCatalog {
      val path = s"$fresh/t"
      VersionedTable.write(spark.range(100).select(col("id").as("k"),
        (col("id") % 5).as("v")), path)
      val t0 = VersionedTable.commitTimes(path).last._2
      Thread.sleep(5)
      VersionedTable.delete(spark, path, "k >= 80")
      assert(spark.sql(s"SELECT count(*) FROM graft.`$path`")
        .head.getLong(0) == 80)
      assert(spark.sql(
        s"SELECT count(*) FROM graft.`$path` VERSION AS OF 0")
        .head.getLong(0) == 100)
      // SQL timestamps are micros; the commit instant carries nanos —
      // probe just past it (still well before the v1 commit)
      assert(spark.sql(
        s"SELECT count(*) FROM graft.`$path` " +
          s"TIMESTAMP AS OF '${t0.plusMillis(2)}'")
        .head.getLong(0) == 100)
      // pushdown still applies through the catalog name
      assert(spark.sql(
        s"SELECT v FROM graft.`$path` WHERE k = 17").head.getLong(0)
        == 17 % 5)
    }
  }

  test("INSERT INTO a catalog name commits a new version") {
    withCatalog {
      val path = s"$fresh/t"
      VersionedTable.write(spark.range(10).select(col("id").as("k")), path)
      spark.sql(s"INSERT INTO graft.`$path` SELECT 1000 AS k")
      assert(spark.sql(s"SELECT count(*) FROM graft.`$path`")
        .head.getLong(0) == 11)
      assert(VersionedTable.latestVersion(path).contains(1))
      assert(spark.sql(
        s"SELECT count(*) FROM graft.`$path` VERSION AS OF 0")
        .head.getLong(0) == 10)
    }
  }

  test("CTAS into a catalog name: empty metadata v0 + data v1; DROP " +
    "removes it") {
    withCatalog {
      val path = s"$fresh/ctas"
      spark.sql(s"""
        CREATE TABLE graft.`$path` AS
        SELECT id AS k, id % 3 AS v FROM range(60)""")
      assert(VersionedTable.latestVersion(path).contains(1))
      assert(VersionedTable.operations(path).head == "CREATE TABLE")
      assert(spark.sql(s"SELECT sum(v) FROM graft.`$path`")
        .head.getLong(0) == (0L until 60L).map(_ % 3).sum)
      spark.sql(s"DROP TABLE graft.`$path`")
      assert(VersionedTable.versions(path).isEmpty)
    }
  }

  test("CREATE TABLE (no AS) then INSERT INTO — the day-one DDL " +
    "shape works") {
    withCatalog {
      val path = s"$fresh/ddl"
      spark.sql(s"""
        CREATE TABLE graft.`$path` (k BIGINT, v STRING)
        TBLPROPERTIES ('quality' = 'bronze')""")
      assert(VersionedTable.latestVersion(path).contains(0))
      assert(VersionedTable.tableProperties(path, 0)
        .get("quality").contains("bronze"))
      // the empty table is immediately readable
      assert(spark.sql(s"SELECT count(*) FROM graft.`$path`")
        .head.getLong(0) == 0)
      spark.sql(s"INSERT INTO graft.`$path` VALUES (1, 'a'), (2, 'b')")
      assert(spark.sql(s"SELECT count(*) FROM graft.`$path`")
        .head.getLong(0) == 2)
      // properties survive the first data commit
      val v = VersionedTable.latestVersion(path).get
      assert(VersionedTable.tableProperties(path, v)
        .get("quality").contains("bronze"))
    }
  }

  test("ALTER TABLE: SET/UNSET TBLPROPERTIES, RENAME/ADD/DROP COLUMN " +
    "through SQL") {
    withCatalog {
      val path = s"$fresh/alter"
      VersionedTable.write(spark.range(10)
        .selectExpr("id AS k", "id * 2 AS v"), path)
      spark.sql(s"ALTER TABLE graft.`$path` " +
        "SET TBLPROPERTIES ('quality' = 'silver')")
      val v1 = VersionedTable.latestVersion(path).get
      assert(VersionedTable.tableProperties(path, v1)
        .get("quality").contains("silver"))
      spark.sql(s"ALTER TABLE graft.`$path` RENAME COLUMN v TO amount")
      assert(spark.sql(s"SELECT sum(amount) FROM graft.`$path`")
        .head.getLong(0) == (0L until 10L).map(_ * 2).sum)
      spark.sql(s"ALTER TABLE graft.`$path` ADD COLUMNS (note STRING)")
      assert(spark.sql(
        s"SELECT count(*) FROM graft.`$path` WHERE note IS NULL")
        .head.getLong(0) == 10)
      spark.sql(s"ALTER TABLE graft.`$path` DROP COLUMN note")
      assert(!spark.table(s"graft.`$path`").columns.contains("note"))
      spark.sql(s"ALTER TABLE graft.`$path` " +
        "UNSET TBLPROPERTIES ('quality')")
      val vN = VersionedTable.latestVersion(path).get
      assert(!VersionedTable.tableProperties(path, vN).contains("quality"))
    }
  }
}
