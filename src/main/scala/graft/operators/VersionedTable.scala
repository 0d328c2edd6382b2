package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Minimal versioned parquet table: every write lands in a new
  * `v=N` directory plus an append-only JSON log — re-expressing the
  * reference's Delta surface (`DESCRIBE HISTORY`, `VERSION AS OF`
  * time travel, `MERGE INTO`, `OPTIMIZE`; reference
  * `1 Data ingestion.py`:189-213, `2 Medaillon architecture.py`:
  * 431-541) without the Delta dependency.
  *
  * Single-writer by design: at production scale the commit step (log
  * append) belongs behind a transactional catalog/log service; the
  * data layout (immutable version directories, full-snapshot
  * versions) is the same shape Delta/Iceberg use for time travel.
  */
object VersionedTable {

  private def logDir(path: String) = Paths.get(path, "_graft_log")

  /** Remove a table directory entirely (test/demo setup). */
  def destroy(path: String): Unit = {
    def rec(f: java.io.File): Unit = {
      val kids = f.listFiles()
      if (kids != null) kids.foreach(rec)
      f.delete(): Unit
    }
    rec(new java.io.File(path))
  }

  /** Committed versions, sorted ascending. */
  def versions(path: String): Seq[Int] = {
    val d = logDir(path)
    if (!Files.exists(d)) Seq.empty
    else {
      val stream = Files.list(d)
      try {
        val it = stream.iterator()
        val buf = scala.collection.mutable.ArrayBuffer[Int]()
        while (it.hasNext) {
          val name = it.next().getFileName.toString
          if (name.endsWith(".json"))
            buf += name.stripSuffix(".json").toInt
        }
        buf.sorted.toSeq
      } finally stream.close()
    }
  }

  def latestVersion(path: String): Option[Int] = versions(path).lastOption

  /** (version, committed_at) pairs from the commit log, ascending.
    * Driver-side: the log is tiny (one line per commit). */
  def commitTimes(path: String): Seq[(Int, java.time.Instant)] = {
    val tsRe = """"committed_at":"([^"]+)"""".r
    versions(path).map { v =>
      val line = Files.readString(logDir(path).resolve(f"$v%06d.json"))
      val ts = tsRe.findFirstMatchIn(line)
        .map(m => java.time.Instant.parse(m.group(1)))
        .getOrElse(throw new IllegalStateException(
          s"no committed_at in log entry $v at $path"))
      v -> ts
    }
  }

  /** TIMESTAMP AS OF resolution: the latest version committed at or
    * before `ts` (reference `1 Data ingestion.py`:203-212). Filters
    * rather than scanning a prefix so a wall-clock wobble between
    * commits can never hide a later-numbered version. */
  def versionAt(path: String, ts: java.time.Instant): Option[Int] =
    commitTimes(path).filter(!_._2.isAfter(ts)).lastOption.map(_._1)

  /** Read the table as of a wall-clock timestamp. */
  def readAsOf(spark: SparkSession, path: String,
               ts: java.time.Instant): DataFrame = {
    val v = versionAt(path, ts).getOrElse(throw new IllegalArgumentException(
      s"no version committed at or before $ts at $path"))
    read(spark, path, Some(v))
  }

  /** JSON string escaping for commit-log fields (quotes, backslashes,
    * control chars) — an operation string like `PIPELINE["x"]` must not
    * corrupt the log that versions()/operations() parse. */
  private[operators] def jsonEscape(s: String): String = {
    val sb = new StringBuilder(s.length)
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  private[operators] def jsonUnescape(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'u' if i + 5 < s.length =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case e => sb.append(e); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Write `df` as the next version (full snapshot). Returns the new
    * version number. The committed row count is captured by an
    * [[org.apache.spark.sql.Observation]] riding the write job itself —
    * one pass over the data, not write-then-recount. */
  def write(df: DataFrame, path: String, operation: String = "WRITE"): Int = {
    val v = latestVersion(path).map(_ + 1).getOrElse(0)
    val target = s"$path/v=$v"
    val obs = org.apache.spark.sql.Observation()
    df.observe(obs, count(lit(1)).as("rows"))
      .write.mode("overwrite").parquet(target)
    val rows = obs.get("rows").asInstanceOf[Long]
    Files.createDirectories(logDir(path))
    val entry =
      s"""{"version":$v,"operation":"${jsonEscape(operation)}","num_rows":$rows,""" +
        s""""committed_at":"${java.time.Instant.now()}"}"""
    Files.write(logDir(path).resolve(f"$v%06d.json"),
      java.util.List.of(entry), StandardOpenOption.CREATE_NEW)
    v
  }

  /** Read the table at `asOf` (VERSION AS OF) or latest. A version
    * whose snapshot dir is absent resolves through the shallow-clone
    * base pointer when one exists ([[shallowClone]]); otherwise it
    * was vacuumed. */
  def read(spark: SparkSession, path: String,
           asOf: Option[Int] = None): DataFrame = {
    val v = asOf.orElse(latestVersion(path)).getOrElse(
      throw new IllegalArgumentException(s"no committed versions at $path"))
    require(versions(path).contains(v), s"version $v not committed at $path")
    val own = s"$path/v=$v"
    val resolved =
      if (Files.exists(Paths.get(own))) own
      else {
        val basePtr = Paths.get(path, "_graft_base")
        if (Files.exists(basePtr)) {
          val bd = s"${Files.readString(basePtr).trim}/v=$v"
          require(Files.exists(Paths.get(bd)),
            s"version $v was vacuumed at $path (and its clone base)")
          bd
        } else {
          require(false, s"version $v was vacuumed at $path")
          own
        }
      }
    spark.read.parquet(resolved)
  }

  /** Delta `SHALLOW CLONE` analog: fork `src` into `dst` by copying
    * METADATA ONLY — the commit log plus a base pointer. Pre-clone
    * versions resolve to the source's snapshot files through
    * [[read]]'s pointer chase (zero data movement — what makes a
    * dev/test fork of a 100 TB production table instant and free),
    * while post-clone commits land under `dst` and never touch the
    * source; the two histories diverge from the fork point exactly
    * like git branches. Vacuuming the SOURCE breaks the clone's
    * pre-fork time travel (Delta's documented shallow-clone hazard —
    * surfaced here as the same read-time error). */
  def shallowClone(src: String, dst: String): Unit = {
    require(versions(src).nonEmpty, s"no committed versions at $src")
    require(Paths.get(src).toAbsolutePath.normalize !=
      Paths.get(dst).toAbsolutePath.normalize, "clone onto itself")
    destroy(dst)
    Files.createDirectories(logDir(dst))
    versions(src).foreach { v =>
      Files.copy(logDir(src).resolve(f"$v%06d.json"),
        logDir(dst).resolve(f"$v%06d.json"))
    }
    Files.writeString(Paths.get(dst, "_graft_base"),
      Paths.get(src).toAbsolutePath.normalize.toString)
  }

  /** VACUUM analog: physically delete all version snapshots except the
    * newest `keepLast`. The commit log is kept — history stays
    * listable, but reads of vacuumed versions fail (exactly Delta's
    * post-VACUUM time-travel behavior). Returns the removed versions. */
  def vacuum(path: String, keepLast: Int): Seq[Int] = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val removed = versions(path).dropRight(keepLast)
    removed.foreach(v => destroy(s"$path/v=$v"))
    removed
  }

  /** DESCRIBE HISTORY analog: the commit log as a DataFrame. */
  def history(spark: SparkSession, path: String): DataFrame =
    spark.read.json(logDir(path).toString)

  /** MERGE INTO analog: upsert `updates` into the latest snapshot on
    * `keys`, committed as a new version. */
  def upsert(spark: SparkSession, path: String, updates: DataFrame,
             keys: Seq[String]): Int = {
    val merged = Medallion.mergeUpsert(read(spark, path), updates, keys)
    write(merged, path, operation = "MERGE")
  }

  /** MERGE with automatic schema evolution (Delta's
    * `schema.autoMerge`): columns present only in `updates` are added
    * to the table (existing rows read them as null), columns the
    * updates lack are kept (update rows get null). The widened union
    * then upserts on `keys` like [[upsert]]. Type changes are NOT
    * evolution — a column present on both sides with a different type
    * fails loudly rather than silently coercing. */
  def upsertEvolve(spark: SparkSession, path: String, updates: DataFrame,
                   keys: Seq[String]): Int = {
    val cur = read(spark, path)
    val conflicts = cur.schema.flatMap { f =>
      updates.schema.find(_.name == f.name).collect {
        case u if u.dataType != f.dataType =>
          s"${f.name}: table ${f.dataType.simpleString} vs update ${u.dataType.simpleString}"
      }
    }
    require(conflicts.isEmpty,
      s"schema evolution cannot change column types — $conflicts")
    val merged = cur.join(updates, keys, "left_anti")
      .unionByName(updates, allowMissingColumns = true)
    write(merged, path, operation = "MERGE[EVOLVE]")
  }

  /** Recency-aware MERGE: union base + updates, keep the latest row
    * per `key` by (`orderCol`, `tieBreaker`). Unlike [[upsert]]
    * (updates win unconditionally), the outcome is independent of how
    * rows were split across update batches — the convergence property
    * a streaming merge sink needs. */
  def upsertLatest(spark: SparkSession, path: String, updates: DataFrame,
                   key: String, orderCol: String, tieBreaker: String,
                   operation: String = "MERGE"): Int = {
    val merged = Medallion.dedupLatest(
      read(spark, path).unionByName(updates), key, orderCol, tieBreaker)
    write(merged, path, operation)
  }

  /** The `operation` strings from the commit log, ascending by
    * version (driver-side; log is tiny). */
  def operations(path: String): Seq[String] = logEntries(path).map(_._2)

  /** Parsed commit-log entries, ascending:
    * (version, operation, num_rows, committed_at). */
  def logEntries(path: String): Seq[(Int, String, Long, String)] = {
    // operation is written escaped — match escape pairs so an embedded
    // (escaped) quote can't truncate the parse
    val opRe = """"operation":"((?:[^"\\]|\\.)*)"""".r
    val rowsRe = """"num_rows":(\d+)""".r
    val tsRe = """"committed_at":"([^"]+)"""".r
    versions(path).map { v =>
      val line = Files.readString(logDir(path).resolve(f"$v%06d.json"))
      (v,
        opRe.findFirstMatchIn(line).map(m => jsonUnescape(m.group(1)))
          .getOrElse(""),
        rowsRe.findFirstMatchIn(line).map(_.group(1).toLong).getOrElse(-1L),
        tsRe.findFirstMatchIn(line).map(_.group(1)).getOrElse(""))
    }
  }

  /** In-place `UPDATE ... SET col = expr WHERE cond` analog (reference
    * `1 Data ingestion.py`:144-173's `UPDATE ... CASE WHEN`): rows
    * matching `conditionSql` get each assignment applied; all other
    * rows pass through unchanged. Committed as a new version, so the
    * pre-update snapshot stays readable (time travel). */
  def update(spark: SparkSession, path: String, conditionSql: String,
             assignments: Seq[(String, String)]): Int = {
    val cur = read(spark, path)
    val cols = cur.columns.toSeq
    assignments.foreach { case (c, _) =>
      require(cols.contains(c), s"UPDATE target column $c not in $cols")
    }
    require(assignments.map(_._1).distinct.size == assignments.size,
      s"duplicate UPDATE target in ${assignments.map(_._1)}")
    // SQL UPDATE semantics: the condition and EVERY assignment RHS are
    // evaluated against the pre-update row — one select, so no
    // assignment can observe another's result (swap-style SET a=b, b=a
    // and condition columns that are themselves assigned both work)
    val assignMap = assignments.toMap
    val updated = cur.select(cols.map { c =>
      assignMap.get(c) match {
        case Some(rhs) =>
          when(expr(conditionSql), expr(rhs)).otherwise(col(c)).as(c)
        case None => col(c)
      }
    }: _*)
    write(updated, path, operation = "UPDATE")
  }

  /** `DELETE FROM ... WHERE cond` analog: rows matching
    * `conditionSql` are removed, committed as a new version (the
    * pre-delete snapshot stays readable — completes the DML verb set
    * next to write/UPDATE/MERGE). */
  def delete(spark: SparkSession, path: String,
             conditionSql: String): Int = {
    val cur = read(spark, path)
    // SQL DELETE semantics: only rows where the condition is TRUE are
    // removed — a NULL condition keeps the row (plain !cond would
    // silently drop it)
    write(cur.filter(!coalesce(expr(conditionSql), lit(false))), path,
      operation = "DELETE")
  }

  /** `ALTER TABLE ADD COLUMN` analog (reference `1 Data
    * ingestion.py`:144-150): appends a column computed by `exprSql`
    * (use a literal/NULL for a plain schema change) as a new version. */
  def addColumn(spark: SparkSession, path: String, name: String,
                exprSql: String): Int = {
    val cur = read(spark, path)
    require(!cur.columns.contains(name), s"column $name already exists")
    write(cur.withColumn(name, expr(exprSql)), path,
      operation = "ADD COLUMN")
  }

  /** Change-data-feed analog (`table_changes`): row-level diff
    * between two committed versions — `_change_type` is `insert` or
    * `delete`; an update surfaces as delete(old) + insert(new).
    * Multiset semantics (`exceptAll`), so duplicate rows diff
    * correctly. */
  def changes(spark: SparkSession, path: String, fromVersion: Int,
              toVersion: Int): DataFrame = {
    val a = read(spark, path, Some(fromVersion))
    val b = read(spark, path, Some(toVersion))
    b.exceptAll(a).withColumn("_change_type", lit("insert"))
      .unionByName(a.exceptAll(b).withColumn("_change_type", lit("delete")))
  }

  /** CDC consumption — the inverse of [[changes]]: applying the
    * change feed between two versions onto the OLDER snapshot
    * reconstructs the newer one exactly (multiset semantics mirror
    * the diff's `exceptAll`). This is how a downstream consumer
    * follows a versioned table without re-reading full snapshots:
    * ship the (typically tiny) feed, apply it locally.
    *
    * Scale shape: `exceptAll` shuffles on the full row — unavoidable
    * for row-level CDC without a declared key, and the shuffled
    * volume is bounded by |snapshot| + |feed| with the feed side
    * proportional to the CHANGE, not the table. A keyed consumer
    * should prefer MERGE ([[upsert]]); this operator is the exact
    * replay path for feeds that may carry duplicate rows. */
  def applyChanges(snapshot: DataFrame, feed: DataFrame): DataFrame = {
    val deletes = feed.filter(col("_change_type") === "delete")
      .drop("_change_type")
    val inserts = feed.filter(col("_change_type") === "insert")
      .drop("_change_type")
    snapshot.exceptAll(deletes).unionByName(inserts)
  }

  /** Git-style THREE-WAY MERGE of two table branches that diverged
    * from a common base snapshot, keyed on `keys`. Per key, with row
    * images B (base), O (ours), T (theirs) — any may be absent:
    * unchanged (O=B=T) keeps B; an edit on exactly one side wins
    * (`ours`/`theirs` — covers inserts, updates AND deletes, since
    * absence is an image); identical edits merge (`both`); divergent
    * edits — including delete-vs-modify — are `conflict` rows with
    * NULL resolved values, left for a policy layer to settle. This is
    * the reconciliation step for branched experimentation on a
    * versioned table (write-audit-publish, dual-pipeline migrations).
    *
    * Determinism: pure null-safe struct comparisons — no ordering,
    * no floats introduced. Scale: three key-equi joins (one shuffle
    * key), row images compared as packed structs; output is
    * |key-universe| rows. */
  def threeWayMerge(base: DataFrame, ours: DataFrame, theirs: DataFrame,
                    keys: Seq[String]): DataFrame = {
    require(ours.columns.sameElements(base.columns) &&
      theirs.columns.sameElements(base.columns),
      "branches must share the base schema")
    val valCols = base.columns.filterNot(keys.contains).toSeq
    def pack(df: DataFrame, tag: String) =
      df.select(keys.map(col) :+
        struct(valCols.map(col): _*).as(tag): _*)
    val j = pack(base, "b")
      .join(pack(ours, "o"), keys, "full_outer")
      .join(pack(theirs, "t"), keys, "full_outer")
    val action =
      when(col("o") <=> col("b") && col("t") <=> col("b"), "unchanged")
        .when(col("o") <=> col("t"), "both")
        .when(col("o") <=> col("b"), "theirs")
        .when(col("t") <=> col("b"), "ours")
        .otherwise("conflict")
    val withAction = j.withColumn("action", action)
    val resolved = when(col("action") === "theirs", col("t"))
      .when(col("action") === "unchanged", col("b"))
      .when(col("action") === "conflict",
        lit(null).cast(withAction.schema("o").dataType))
      .otherwise(col("o"))
    withAction.withColumn("r", resolved)
      .select(keys.map(col) ++ Seq(col("action")) ++
        valCols.map(c => col(s"r.$c").as(c)) :+
        (col("action") === "conflict").as("is_conflict"): _*)
  }

  /** RESTORE TABLE ... TO VERSION AS OF analog: re-commit an old
    * snapshot as the new latest version (history keeps everything). */
  def restore(spark: SparkSession, path: String, toVersion: Int): Int =
    write(read(spark, path, Some(toVersion)), path,
      operation = s"RESTORE[v=$toVersion]")

  /** OPTIMIZE+ZORDER analog: clustered compaction committed as a new
    * version (history preserved — old versions still readable). */
  def optimize(spark: SparkSession, path: String, sortCols: Seq[String],
               numFiles: Int): Int = {
    val clustered = Maintenance.clusteredFrame(read(spark, path),
      sortCols, numFiles)
    write(clustered, path, operation = "OPTIMIZE")
  }

  /** OPTIMIZE ... ZORDER BY (a, b) with the TRUE 2-D curve: the
    * snapshot re-clustered along the Morton key
    * ([[Maintenance.zOrderedFrame]]) and committed as a new version —
    * both dimensions stay prunable in the new layout. */
  def optimizeZOrder(spark: SparkSession, path: String, colA: String,
                     colB: String, numFiles: Int): Int =
    write(Maintenance.zOrderedFrame(read(spark, path), colA, colB,
      numFiles), path, operation = "OPTIMIZE[ZORDER]")
}
