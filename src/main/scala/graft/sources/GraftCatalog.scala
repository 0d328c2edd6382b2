package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.operators.VersionedTable

/** PATH catalog for the versioned format — the piece that puts the
  * table layer behind plain SQL names with TIME TRAVEL syntax
  * (Delta's `delta.`/path``): register once with
  * `spark.sql.catalog.graft = graft.sources.GraftCatalog` and every
  * versioned table is addressable as
  *
  * {{{
  *   SELECT * FROM graft.`/data/events`                    -- latest
  *   SELECT * FROM graft.`/data/events` VERSION AS OF 3
  *   SELECT * FROM graft.`/data/events` TIMESTAMP AS OF '…'
  *   INSERT INTO graft.`/data/events` SELECT …             -- commit protocol
  *   CREATE TABLE graft.`/new/t` AS SELECT …               -- CTAS
  * }}}
  *
  * The identifier's name IS the filesystem path (no metastore — the
  * commit log under the path is the table's own catalog entry, so the
  * "catalog" is stateless and needs no coordination at any fleet
  * size). Reads resolve through the same pushdown-wired
  * [[GraftTable]] the `graft` format serves; writes run the V1Write
  * commit-protocol shim. DROP deletes the table directory. */
class GraftCatalog extends TableCatalog {

  private var catalogName: String = "graft"

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  private def pathOf(ident: Identifier): String =
    GraftDataSource.normalizePath(
      (ident.namespace() :+ ident.name()).mkString("/"))

  private def require_exists(ident: Identifier): String = {
    val p = pathOf(ident)
    if (VersionedTable.versions(p).isEmpty)
      throw new NoSuchTableException(ident)
    p
  }

  override def listTables(namespace: Array[String]): Array[Identifier] =
    Array.empty // path catalog: tables are not enumerable

  override def tableExists(ident: Identifier): Boolean =
    VersionedTable.versions(pathOf(ident)).nonEmpty

  override def loadTable(ident: Identifier): Table = {
    val p = require_exists(ident)
    new GraftTable(p, VersionedTable.latestVersion(p).get)
  }

  /** `VERSION AS OF` — the version string is the commit number. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val p = require_exists(ident)
    val v = version.trim.toInt
    require(VersionedTable.versions(p).contains(v),
      s"version $v not committed at $p")
    new GraftTable(p, v)
  }

  /** `TIMESTAMP AS OF` — micros since epoch (Spark's contract). */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val p = require_exists(ident)
    val ts = java.time.Instant.EPOCH.plusNanos(timestamp * 1000L)
    val v = VersionedTable.versionAt(p, ts).getOrElse(
      throw new IllegalArgumentException(
        s"no version committed at or before $ts at $p"))
    new GraftTable(p, v)
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: JMap[String, String]): Table = {
    // refuse what we would otherwise silently drop: a PARTITIONED BY
    // clause or user TBLPROPERTIES not honored here would commit an
    // unpartitioned, property-less table with no error — worse than
    // failing (Spark injects bookkeeping keys like provider/owner/
    // location; only USER properties are rejected)
    require(partitions.isEmpty,
      "graft catalog: PARTITIONED BY is not supported through CTAS — " +
        "write with VersionedTable.write(df, path, partitionBy = …) " +
        "or df.write.format(\"graft\").option(\"partitionBy\", …)")
    val reserved = Set(TableCatalog.PROP_PROVIDER, TableCatalog.PROP_OWNER,
      TableCatalog.PROP_LOCATION, TableCatalog.PROP_COMMENT,
      TableCatalog.PROP_EXTERNAL, TableCatalog.PROP_IS_MANAGED_LOCATION)
    val user = {
      import scala.jdk.CollectionConverters._
      properties.asScala.keys.filterNot(k =>
        reserved.contains(k) || k.startsWith("option.")).toSeq.sorted
    }
    require(user.isEmpty,
      s"graft catalog: TBLPROPERTIES ${user.mkString(", ")} are not " +
        "applied through CTAS — set them after creation with " +
        "VersionedTable.setTableProperties")
    // creation is lazy — the first write's commit creates version 0
    // (the CTAS exec loads this table and writes through the V1 shim)
    new GraftTable(pathOf(ident), -1, Some(schema))
  }

  override def alterTable(ident: Identifier,
                          changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "graft catalog: use the VersionedTable API for ALTER verbs")

  override def dropTable(ident: Identifier): Boolean = {
    val p = pathOf(ident)
    val existed = VersionedTable.versions(p).nonEmpty
    if (existed) VersionedTable.destroy(p)
    existed
  }

  override def renameTable(oldIdent: Identifier,
                           newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "graft catalog: tables are paths — move the directory instead")
}
