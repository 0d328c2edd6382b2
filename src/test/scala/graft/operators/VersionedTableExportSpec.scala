package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Symlink-manifest export (Delta's symlink_format_manifest shape):
  * `manifest.txt` + linked/materialized parquet must reproduce the
  * snapshot for a reader that knows NOTHING about the format. Clean
  * files link in place (zero copy), DV-carrying files materialize,
  * a renamed-column world materializes everything (data files store
  * physical names an external reader cannot map), and the manifest
  * pins its version against later commits. */
class VersionedTableExportSpec extends SparkSpec {

  private def fresh = Files.createTempDirectory("graft_vte").toString

  private def listed(out: String): Seq[String] =
    Files.readAllLines(Paths.get(out, "manifest.txt"))
      .toArray(Array.empty[String]).toSeq

  private def external(paths: Seq[String]) =
    spark.read.parquet(paths: _*)

  test("clean table: every manifest line links into the pool (zero " +
    "copy) and the external read equals read()") {
    val dir = fresh
    val (path, out) = (s"$dir/t", s"$dir/exp")
    VersionedTable.write(tables.nation.repartition(4), path)
    val paths = VersionedTable.exportManifest(spark, path, out)
    assert(paths.nonEmpty && paths.forall(_.contains("_graft_pool")))
    assert(external(paths).orderBy("n_nationkey").collect().toSeq ==
      VersionedTable.read(spark, path).orderBy("n_nationkey")
        .collect().toSeq)
  }

  test("DV-carrying files materialize; the external read never " +
    "resurrects deleted rows") {
    val dir = fresh
    val (path, out) = (s"$dir/t", s"$dir/exp")
    VersionedTable.write(
      tables.nation.repartitionByRange(5, col("n_nationkey")), path)
    VersionedTable.deleteVectors(spark, path, "n_nationkey = 3")
    val paths = VersionedTable.exportManifest(spark, path, out)
    val (links, mats) = paths.partition(_.contains("_graft_pool"))
    assert(links.nonEmpty, "clean files must link")
    assert(mats.nonEmpty && mats.forall(_.contains("materialized")))
    val ext = external(paths)
    assert(ext.filter(col("n_nationkey") === 3).count() == 0)
    assert(ext.count() == 24)
  }

  test("a renamed-column world materializes everything under LOGICAL " +
    "names") {
    val dir = fresh
    val (path, out) = (s"$dir/t", s"$dir/exp")
    VersionedTable.write(tables.nation.repartition(3), path)
    VersionedTable.renameColumn(spark, path, "n_name", "nation_name")
    val paths = VersionedTable.exportManifest(spark, path, out)
    assert(paths.forall(_.contains("materialized")))
    val ext = external(paths)
    assert(ext.columns.contains("nation_name"))
    assert(ext.count() == 25)
  }

  test("the manifest pins its version: a later append changes " +
    "nothing an already-exported reader sees") {
    val dir = fresh
    val (path, out) = (s"$dir/t", s"$dir/exp")
    VersionedTable.write(tables.nation.filter(col("n_nationkey") < 20),
      path)
    VersionedTable.exportManifest(spark, path, out)
    val before = listed(out)
    VersionedTable.append(spark,
      tables.nation.filter(col("n_nationkey") >= 20), path)
    assert(listed(out) == before)
    assert(external(before).count() == 20)
  }
}
