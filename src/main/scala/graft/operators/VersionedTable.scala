package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructField, StructType}
import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}

/** Versioned parquet table with FILE-GRANULAR commits — re-expressing
  * the reference's Delta surface (`DESCRIBE HISTORY`, `VERSION AS OF`
  * time travel, `MERGE INTO`, `UPDATE`, `DELETE`, `OPTIMIZE`,
  * `RESTORE`, `VACUUM`, shallow clone; reference
  * `1 Data ingestion.py`:189-213, `2 Medaillon architecture.py`:
  * 431-541) without the Delta dependency.
  *
  * Layout: immutable data files live in a shared `_graft_pool/`; each
  * commit appends one JSON log line to `_graft_log/` carrying the
  * version's FILE MANIFEST (name + exact footer row count) and schema.
  * A version is the set of files its manifest names — so:
  *
  *  - MERGE / UPDATE / DELETE rewrite ONLY the files that contain
  *    touched rows (found by an exact, column-pruned scan of the key /
  *    condition columns plus `_metadata.file_path`; parquet min-max
  *    stats prune row groups of clustered tables for free) and re-link
  *    every untouched file into the new manifest. A one-row MERGE into
  *    a 100 TB table costs O(delta + one file rewrite), never O(table)
  *    — the same sharing shape Delta/Iceberg use.
  *  - RESTORE re-links an old manifest: zero data written.
  *  - VACUUM is contractual: versions older than the retention are
  *    marked unreadable in the log dir, then pool files referenced by
  *    NO retained version are physically deleted (refcount across
  *    manifests). A file shared with a retained version survives.
  *  - Shallow clone copies the log only; manifest files resolve
  *    through a transitive base-pointer chase (clone-of-clone works),
  *    and post-fork clone commits land in the clone's own pool.
  *
  * Single-writer by design: at production scale the commit step (log
  * append) belongs behind a transactional catalog/log service; the
  * data layout is what scales.
  */
object VersionedTable {

  private def logDir(path: String) = Paths.get(path, "_graft_log")
  private def poolDir(path: String) = Paths.get(path, "_graft_pool")
  // underscore prefix: invisible to Spark's directory listings, like
  // _graft_log itself
  private def vacuumedFile(path: String) = logDir(path).resolve("_vacuumed")
  private def basePtrFile(path: String) = Paths.get(path, "_graft_base")

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

  /** Versions marked unreadable by [[vacuum]] (history stays listable). */
  def vacuumedVersions(path: String): Set[Int] = {
    val f = vacuumedFile(path)
    if (!Files.exists(f)) Set.empty
    else Files.readString(f).split("\\s+").filter(_.nonEmpty)
      .map(_.toInt).toSet
  }

  private def logLine(path: String, v: Int): String =
    Files.readString(logDir(path).resolve(f"$v%06d.json"))

  /** (version, committed_at) pairs from the commit log, ascending.
    * Driver-side: the log is tiny (one line per commit). */
  def commitTimes(path: String): Seq[(Int, java.time.Instant)] = {
    val tsRe = """"committed_at":"([^"]+)"""".r
    versions(path).map { v =>
      val ts = tsRe.findFirstMatchIn(logLine(path, v))
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
    * control chars) — an operation string like `PIPELINE["x"]` or the
    * embedded schema JSON must not corrupt the log. */
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

  // ---------------------------------------------------------------- //
  // manifest / schema plumbing
  // ---------------------------------------------------------------- //

  /** One manifest entry: an immutable pool data file, its LIVE row
    * count, and optionally the DELETION-VECTOR sidecar holding the
    * row positions a merge-on-read DELETE removed from it (the
    * Delta DV shape: the data file is never rewritten; readers
    * anti-join the tiny position set). */
  final case class FileEntry(name: String, dv: Option[String],
                             rows: Long)

  /** The version's full manifest entries. Safe to regex out of the
    * log line because every raw `"` inside the operation/schema
    * fields is escaped at write time. */
  def manifestEntries(path: String, v: Int): Seq[FileEntry] = {
    val filesRe = """"files":\[(.*)\]\}\s*$""".r
    val fileRe =
      """\{"name":"([^"]+)"(?:,"dv":"([^"]+)")?,"rows":(\d+)\}""".r
    filesRe.findFirstMatchIn(logLine(path, v)).map { m =>
      fileRe.findAllMatchIn(m.group(1))
        .map(fm => FileEntry(fm.group(1), Option(fm.group(2)),
          fm.group(3).toLong)).toSeq
    }.getOrElse(Seq.empty)
  }

  /** The version's file manifest: (pool file name, live row count). */
  def manifest(path: String, v: Int): Seq[(String, Long)] =
    manifestEntries(path, v).map(e => e.name -> e.rows)

  /** The schema committed with version `v` (nullable form — what a
    * parquet read reports). Recording it in the log makes empty
    * versions readable and schema evolution metadata-cheap: files
    * lacking an evolved column read it as null. */
  def schemaOf(path: String, v: Int): StructType = {
    val re = """"schema":"((?:[^"\\]|\\.)*)"""".r
    val json = re.findFirstMatchIn(logLine(path, v))
      .map(m => jsonUnescape(m.group(1)))
      .getOrElse(throw new IllegalStateException(
        s"no schema in log entry $v at $path"))
    DataType.fromJson(json).asInstanceOf[StructType]
  }

  /** Data files currently present in the table's OWN pool (not
    * counting files a clone resolves from its base). */
  def poolFiles(path: String): Seq[String] = {
    val d = poolDir(path)
    if (!Files.exists(d)) Seq.empty
    else {
      val s = Files.list(d)
      try {
        val it = s.iterator()
        val buf = scala.collection.mutable.ArrayBuffer[String]()
        while (it.hasNext) buf += it.next().getFileName.toString
        buf.sorted.toSeq
      } finally s.close()
    }
  }

  /** The clone base pointer, if this table is a shallow clone:
    * (source path, fork version). */
  def cloneInfo(path: String): Option[(String, Int)] = {
    val f = basePtrFile(path)
    if (!Files.exists(f)) None
    else {
      val lines = Files.readString(f).trim.linesIterator.toSeq
      Some((lines.head.trim,
        lines.drop(1).headOption.map(_.trim.toInt).getOrElse(Int.MaxValue)))
    }
  }

  /** Resolve a manifest file name: own pool first, then the clone
    * base chain (transitive — a clone of a clone chases through to
    * the grandparent; cycle-guarded). */
  private def resolvePoolFile(path: String, name: String): Option[Path] = {
    var p: Option[String] = Some(path)
    val seen = scala.collection.mutable.Set[String]()
    while (p.isDefined &&
        seen.add(Paths.get(p.get).toAbsolutePath.normalize.toString)) {
      val cand = poolDir(p.get).resolve(name)
      if (Files.exists(cand)) return Some(cand)
      p = cloneInfo(p.get).map(_._1)
    }
    None
  }

  /** Force-nullable form of a schema (recursive). The recorded version
    * schema must accept nulls everywhere a file read can produce them:
    * evolved columns absent from re-linked files, and parquet's own
    * nullable reporting. (StructType.asNullable is private[sql].) */
  private def asNullable(dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.types.DataType = dt match {
    case s: StructType => StructType(s.fields.map(f =>
      f.copy(dataType = asNullable(f.dataType), nullable = true)))
    case a: org.apache.spark.sql.types.ArrayType =>
      a.copy(elementType = asNullable(a.elementType), containsNull = true)
    case m: org.apache.spark.sql.types.MapType =>
      m.copy(keyType = asNullable(m.keyType),
        valueType = asNullable(m.valueType), valueContainsNull = true)
    case other => other
  }

  private def nullableSchema(s: StructType): StructType =
    asNullable(s).asInstanceOf[StructType]

  private def appendLog(path: String, v: Int, operation: String,
                        rows: Long, schema: StructType,
                        files: Seq[FileEntry]): Unit = {
    Files.createDirectories(logDir(path))
    val filesJson = files.map { e =>
      val dvField = e.dv.fold("")(d => s""","dv":"$d"""")
      s"""{"name":"${e.name}"$dvField,"rows":${e.rows}}"""
    }.mkString("[", ",", "]")
    val entry =
      s"""{"version":$v,"operation":"${jsonEscape(operation)}","num_rows":$rows,""" +
        s""""committed_at":"${java.time.Instant.now()}",""" +
        s""""schema":"${jsonEscape(schema.json)}","files":$filesJson}"""
    Files.write(logDir(path).resolve(f"$v%06d.json"),
      java.util.List.of(entry), StandardOpenOption.CREATE_NEW)
  }

  /** Exact row count from the parquet footer — no data pages read, no
    * extra Spark job (the write already happened). */
  private def footerRowCount(p: Path): Long = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(p.toUri),
      new org.apache.hadoop.conf.Configuration())
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try r.getRecordCount finally r.close()
  }

  /** Write `df`'s rows as new immutable pool files (staged, then moved
    * under a commit prefix so provenance is readable and names are
    * globally unique). Returns the manifest entries. */
  private def writeDataFiles(df: DataFrame, path: String, v: Int,
                             tag: String = "c"): Seq[FileEntry] = {
    val stage = Paths.get(path, f"_graft_stage_$tag$v%06d")
    df.write.mode("overwrite").parquet(stage.toString)
    Files.createDirectories(poolDir(path))
    val parts = Option(stage.toFile.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    val out = parts.map { f =>
      val name = f"$tag$v%06d-${f.getName}"
      val dst = poolDir(path).resolve(name)
      Files.move(f.toPath, dst, StandardCopyOption.ATOMIC_MOVE)
      FileEntry(name, None, footerRowCount(dst))
    }.toSeq
    destroy(stage.toString)
    out
  }

  /** Write `df` as the next version (full snapshot — ingest/CTAS
    * shape). Returns the new version number. The exact committed row
    * count comes from the parquet footers of the files just written —
    * no second pass over the data. */
  def write(df: DataFrame, path: String, operation: String = "WRITE"): Int = {
    val v = latestVersion(path).map(_ + 1).getOrElse(0)
    val files = writeDataFiles(df, path, v)
    appendLog(path, v, operation, files.map(_.rows).sum,
      nullableSchema(df.schema), files)
    v
  }

  /** Commit a file-granular rewrite: untouched files of the current
    * version are RE-LINKED into the new manifest; only `newData` (the
    * rewritten touched rows plus inserts) hits disk. */
  private def commitRewrite(spark: SparkSession, path: String,
                            operation: String, newData: DataFrame,
                            touched: Set[String],
                            schema: StructType): Int = {
    val v = latestVersion(path).getOrElse(
      throw new IllegalArgumentException(s"no committed versions at $path"))
    val nv = v + 1
    val keep = manifestEntries(path, v)
      .filterNot(e => touched.contains(e.name))
    val fresh = writeDataFiles(newData, path, nv)
    appendLog(path, nv, operation,
      keep.map(_.rows).sum + fresh.map(_.rows).sum, schema, keep ++ fresh)
    nv
  }

  private def resolveOrFail(path: String, name: String, v: Int): String =
    resolvePoolFile(path, name).getOrElse(throw new IllegalArgumentException(
      s"version $v was vacuumed at $path" +
        (if (cloneInfo(path).isDefined) " (and its clone base)" else "") +
        s": data file $name is gone")).toString

  /** Read a set of manifest entries with an explicit schema (missing
    * evolved columns read as null), APPLYING each entry's deletion
    * vector: DV-carrying files scan with the stable parquet row index
    * and anti-join their sidecar's (file, pos) set — the sidecars are
    * delete-sized, so the join broadcasts; DV-free files take the
    * plain scan path at zero cost. With `lineage`, two extra columns
    * ride along for touched-file discovery and DV construction:
    * `_graft_file` (pool file name) and `_graft_pos` (row position in
    * the physical file). */
  private def readEntries(spark: SparkSession, path: String,
                          entries: Seq[FileEntry], schema: StructType,
                          v: Int, lineage: Boolean = false): DataFrame = {
    val outCols = schema.fieldNames.toIndexedSeq.map(col) ++
      (if (lineage) Seq(col("_graft_file"), col("_graft_pos")) else Nil)
    def scan(es: Seq[FileEntry]) = spark.read.schema(schema)
      .parquet(es.map(e => resolveOrFail(path, e.name, v)): _*)
      .withColumn("_graft_file",
        substring_index(col("_metadata.file_path"), "/", -1))
      .withColumn("_graft_pos", col("_metadata.row_index"))
    if (entries.isEmpty)
      spark.createDataFrame(java.util.List.of[Row](),
        if (lineage) StructType(schema.fields ++ Seq(
          StructField("_graft_file", org.apache.spark.sql.types.StringType),
          StructField("_graft_pos", org.apache.spark.sql.types.LongType)))
        else schema)
    else {
      val (dvd, plain) = entries.partition(_.dv.isDefined)
      val plainDf =
        if (plain.isEmpty) None
        else if (lineage) Some(scan(plain).select(outCols: _*))
        else Some(spark.read.schema(schema)
          .parquet(plain.map(e => resolveOrFail(path, e.name, v)): _*))
      // group DV files by sidecar: one anti-join per sidecar, each
      // against only the (file, pos) rows of the files that point at it
      val dvDfs = dvd.groupBy(_.dv.get).toSeq.sortBy(_._1).map {
        case (sidecar, es) =>
          val positions = spark.read
            .parquet(resolveOrFail(path, sidecar, v))
            .select(col("file").as("_graft_file"),
              col("pos").as("_graft_pos"))
          val sel: Seq[org.apache.spark.sql.Column] =
            if (lineage) outCols
            else schema.fieldNames.toIndexedSeq.map(col)
          scan(es).join(broadcast(positions),
              Seq("_graft_file", "_graft_pos"), "left_anti")
            .select(sel: _*)
      }
      (plainDf.toSeq ++ dvDfs).reduce(_ unionByName _)
    }
  }

  /** Name-subset convenience over [[readEntries]]. */
  private def readFiles(spark: SparkSession, path: String,
                        names: Iterable[String], schema: StructType,
                        v: Int): DataFrame = {
    val want = names.toSet
    readEntries(spark, path,
      manifestEntries(path, v).filter(e => want.contains(e.name)),
      schema, v)
  }

  /** Read the table at `asOf` (VERSION AS OF) or latest. Vacuumed
    * versions refuse cleanly even when their files survive through
    * sharing — Delta's post-VACUUM retention contract. */
  def read(spark: SparkSession, path: String,
           asOf: Option[Int] = None): DataFrame = {
    val v = asOf.orElse(latestVersion(path)).getOrElse(
      throw new IllegalArgumentException(s"no committed versions at $path"))
    require(versions(path).contains(v), s"version $v not committed at $path")
    require(!vacuumedVersions(path).contains(v),
      s"version $v was vacuumed at $path")
    readFiles(spark, path, manifest(path, v).map(_._1), schemaOf(path, v), v)
  }

  /** True when `v` is committed, not vacuumed, and every manifest file
    * still resolves (own pool or clone base). */
  def isReadable(path: String, v: Int): Boolean =
    versions(path).contains(v) && !vacuumedVersions(path).contains(v) &&
      manifestEntries(path, v).forall(e =>
        resolvePoolFile(path, e.name).isDefined &&
          e.dv.forall(d => resolvePoolFile(path, d).isDefined))

  /** Files of the current version that contain at least one row
    * satisfying `hit` — an EXACT shortlist: the scan reads only the
    * columns `hit` needs (Catalyst prunes the rest) plus the file-path
    * metadata column, and pushed-down predicates skip row groups via
    * parquet min-max stats on clustered tables. Driver traffic is one
    * row per touched FILE, never per row. */
  private def touchedFiles(spark: SparkSession, path: String, v: Int,
                           schema: StructType,
                           hit: DataFrame => DataFrame): Set[String] = {
    val files = manifestEntries(path, v)
    if (files.isEmpty) Set.empty
    // a 1-file manifest has nothing to prune — skip the discovery job
    // (the rewrite applies the row-level predicate anyway, so content
    // is identical; only a no-match commit loses a re-link, and THAT
    // table is one file big)
    else if (files.size == 1) Set(files.head.name)
    else {
      val cur = readEntries(spark, path, files, schema, v,
        lineage = true)
      hit(cur).select("_graft_file").distinct().collect()
        .map(_.getString(0)).toSet
    }
  }

  /** APPEND: commit `df` as NEW pool files RE-LINKING the whole
    * current manifest — the O(delta) ingest verb a streaming bronze
    * table needs (under full-snapshot versioning every micro-batch
    * append cost O(table); here it costs the batch). Schema must
    * match the table's (names and types; nullability widens). */
  def append(spark: SparkSession, df: DataFrame, path: String,
             operation: String = "APPEND"): Int = {
    val v = latestVersion(path).getOrElse(
      throw new IllegalArgumentException(s"no committed versions at $path"))
    val schema = schemaOf(path, v)
    require(nullableSchema(df.schema) == schema,
      s"append schema ${df.schema.simpleString} does not match table " +
        s"${schema.simpleString}")
    commitRewrite(spark, path, operation, df, Set.empty, schema)
  }

  /** Per-file [min, max] of a numeric column straight from the
    * parquet FOOTERS of version `v`'s manifest (driver-side, O(files)
    * footer reads) — the column stats Delta/Iceberg persist in their
    * logs; here the immutable footers ARE the stats store, so data
    * skipping costs no format change. `None` when any row group lacks
    * stats or holds only nulls (the file is then unprunable — never a
    * false negative). */
  def fileStats(path: String, v: Int,
                column: String): Seq[(String, Option[(Double, Double)])] = {
    def num(a: Any): Option[Double] = a match {
      case n: java.lang.Number => Some(n.doubleValue())
      case _ => None
    }
    manifest(path, v).map { case (name, _) =>
      val p = resolvePoolFile(path, name).getOrElse(
        throw new IllegalArgumentException(
          s"version $v was vacuumed at $path: data file $name is gone"))
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(p.toUri),
        new org.apache.hadoop.conf.Configuration())
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      val stats = try {
        val blocks = r.getFooter.getBlocks
        var lo = Double.PositiveInfinity
        var hi = Double.NegativeInfinity
        var ok = blocks.size() > 0
        var i = 0
        while (ok && i < blocks.size()) {
          val cols = blocks.get(i).getColumns
          var found = false
          var j = 0
          while (!found && j < cols.size()) {
            val c = cols.get(j)
            if (c.getPath.toDotString == column) {
              found = true
              val s = c.getStatistics
              if (s == null || !s.hasNonNullValue) ok = false
              else (num(s.genericGetMin), num(s.genericGetMax)) match {
                case (Some(mn), Some(mx)) =>
                  lo = math.min(lo, mn); hi = math.max(hi, mx)
                case _ => ok = false
              }
            }
            j += 1
          }
          if (!found) ok = false
          i += 1
        }
        if (ok) Some((lo, hi)) else None
      } finally r.close()
      name -> stats
    }
  }

  /** Stats-pruned read: shortlist version `v`'s files to those whose
    * footer [min, max] for `column` OVERLAPS [lo, hi] (stat-less
    * files always survive — no false negatives), scan only the
    * survivors, and apply the row-level filter — so the result equals
    * the full-scan filter exactly while a clustered layout
    * ([[optimize]] / [[optimizeZOrder]]) touches only the files the
    * range lives in. The versioned-table form of zone-map skipping:
    * what Delta/Iceberg derive from log stats, derived here from the
    * immutable footers. */
  def readWhere(spark: SparkSession, path: String, column: String,
                lo: Double, hi: Double,
                asOf: Option[Int] = None): DataFrame = {
    val v = asOf.orElse(latestVersion(path)).getOrElse(
      throw new IllegalArgumentException(s"no committed versions at $path"))
    require(!vacuumedVersions(path).contains(v),
      s"version $v was vacuumed at $path")
    val keep = fileStats(path, v, column).collect {
      case (n, None) => n
      case (n, Some((mn, mx))) if mx >= lo && mn <= hi => n
    }
    readFiles(spark, path, keep, schemaOf(path, v), v)
      .filter(col(column) >= lo && col(column) <= hi)
  }

  /** (name, bytes) for each data file of version `v` — the sizing
    * input an incremental OPTIMIZE policy reads. */
  def manifestSizes(path: String, v: Int): Seq[(String, Long)] =
    manifest(path, v).map { case (n, _) =>
      val p = resolvePoolFile(path, n).getOrElse(
        throw new IllegalArgumentException(
          s"version $v was vacuumed at $path: data file $n is gone"))
      n -> Files.size(p)
    }

  /** Incremental OPTIMIZE (Delta's file-selection semantics): compact
    * ONLY files smaller than `minFileBytes` into `numFiles` clustered
    * outputs; files already at target size RE-LINK untouched. After a
    * run of streaming appends this pays for the small-file backlog,
    * never the table — the maintenance loop a 100 TB bronze table
    * lives on (append micro-batches → many small files → incremental
    * compaction). A no-op commit is skipped (returns the current
    * version) when fewer than two files are under the threshold. */
  def optimizeIncremental(spark: SparkSession, path: String,
                          sortCols: Seq[String], minFileBytes: Long,
                          numFiles: Int): Int = {
    val v = latestVersion(path).getOrElse(
      throw new IllegalArgumentException(s"no committed versions at $path"))
    val small = manifestSizes(path, v).filter(_._2 < minFileBytes)
      .map(_._1).toSet
    if (small.size < 2) v
    else {
      val schema = schemaOf(path, v)
      val clustered = Maintenance.clusteredFrame(
        readFiles(spark, path, small, schema, v), sortCols, numFiles)
      commitRewrite(spark, path, "OPTIMIZE[INCR]", clustered, small,
        schema)
    }
  }

  /** MERGE INTO analog: upsert `updates` into the latest version on
    * `keys`. File-granular — only files containing matched keys are
    * rewritten (survivor rows anti-joined against the updates), every
    * other file is re-linked; a small update batch against a huge
    * table commits in O(delta). */
  def upsert(spark: SparkSession, path: String, updates: DataFrame,
             keys: Seq[String]): Int = {
    val v = latestVersion(path).getOrElse(
      throw new IllegalArgumentException(s"no committed versions at $path"))
    val schema = schemaOf(path, v)
    val keyFrame = updates.select(keys.map(col): _*).distinct()
    val touched = touchedFiles(spark, path, v, schema,
      _.join(keyFrame, keys, "left_semi"))
    val touchedRows = readFiles(spark, path, touched, schema, v)
    commitRewrite(spark, path, "MERGE",
      Medallion.mergeUpsert(touchedRows, updates, keys), touched, schema)
  }

  /** MERGE with automatic schema evolution (Delta's
    * `schema.autoMerge`): columns present only in `updates` are added
    * to the table schema (rows in every re-linked file read them as
    * null — evolution costs metadata, not a table rewrite), columns
    * the updates lack are kept (update rows get null). Type changes
    * are NOT evolution — a column present on both sides with a
    * different type fails loudly rather than silently coercing. */
  def upsertEvolve(spark: SparkSession, path: String, updates: DataFrame,
                   keys: Seq[String]): Int = {
    val v = latestVersion(path).getOrElse(
      throw new IllegalArgumentException(s"no committed versions at $path"))
    val schema = schemaOf(path, v)
    val conflicts = schema.flatMap { f =>
      updates.schema.find(_.name == f.name).collect {
        case u if u.dataType != f.dataType =>
          s"${f.name}: table ${f.dataType.simpleString} vs update ${u.dataType.simpleString}"
      }
    }
    require(conflicts.isEmpty,
      s"schema evolution cannot change column types — $conflicts")
    val keyFrame = updates.select(keys.map(col): _*).distinct()
    val touched = touchedFiles(spark, path, v, schema,
      _.join(keyFrame, keys, "left_semi"))
    val merged = readFiles(spark, path, touched, schema, v)
      .join(updates, keys, "left_anti")
      .unionByName(updates, allowMissingColumns = true)
    commitRewrite(spark, path, "MERGE[EVOLVE]", merged, touched,
      nullableSchema(merged.schema))
  }

  /** Recency-aware MERGE: keep the latest row per `key` by
    * (`orderCol`, `tieBreaker`) across base ∪ updates. Unlike
    * [[upsert]] (updates win unconditionally), the outcome is
    * independent of how rows were split across update batches — the
    * convergence property a streaming merge sink needs. File-granular:
    * the latest-per-key contest only involves keys present in
    * `updates`, so only files holding those keys are rewritten. */
  def upsertLatest(spark: SparkSession, path: String, updates: DataFrame,
                   key: String, orderCol: String, tieBreaker: String,
                   operation: String = "MERGE"): Int = {
    val v = latestVersion(path).getOrElse(
      throw new IllegalArgumentException(s"no committed versions at $path"))
    val schema = schemaOf(path, v)
    val keyFrame = updates.select(col(key)).distinct()
    val touched = touchedFiles(spark, path, v, schema,
      _.join(keyFrame, Seq(key), "left_semi"))
    val merged = Medallion.dedupLatest(
      readFiles(spark, path, touched, schema, v).unionByName(updates),
      key, orderCol, tieBreaker)
    commitRewrite(spark, path, operation, merged, touched, schema)
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
      val line = logLine(path, v)
      (v,
        opRe.findFirstMatchIn(line).map(m => jsonUnescape(m.group(1)))
          .getOrElse(""),
        rowsRe.findFirstMatchIn(line).map(_.group(1).toLong).getOrElse(-1L),
        tsRe.findFirstMatchIn(line).map(_.group(1)).getOrElse(""))
    }
  }

  /** In-place `UPDATE ... SET col = expr WHERE cond` analog (reference
    * `1 Data ingestion.py`:144-173's `UPDATE ... CASE WHEN`). Only
    * files containing a matching row are rewritten (rows in them that
    * don't match pass through unchanged); all other files re-link.
    * Committed as a new version, so the pre-update snapshot stays
    * readable (time travel). */
  def update(spark: SparkSession, path: String, conditionSql: String,
             assignments: Seq[(String, String)]): Int = {
    val v = latestVersion(path).getOrElse(
      throw new IllegalArgumentException(s"no committed versions at $path"))
    val schema = schemaOf(path, v)
    val cols = schema.fieldNames.toSeq
    assignments.foreach { case (c, _) =>
      require(cols.contains(c), s"UPDATE target column $c not in $cols")
    }
    require(assignments.map(_._1).distinct.size == assignments.size,
      s"duplicate UPDATE target in ${assignments.map(_._1)}")
    val touched = touchedFiles(spark, path, v, schema,
      _.filter(expr(conditionSql)))
    // SQL UPDATE semantics: the condition and EVERY assignment RHS are
    // evaluated against the pre-update row — one select, so no
    // assignment can observe another's result (swap-style SET a=b, b=a
    // and condition columns that are themselves assigned both work)
    val assignMap = assignments.toMap
    val updated = readFiles(spark, path, touched, schema, v)
      .select(cols.map { c =>
        assignMap.get(c) match {
          case Some(rhs) =>
            when(expr(conditionSql), expr(rhs)).otherwise(col(c)).as(c)
          case None => col(c)
        }
      }: _*)
    commitRewrite(spark, path, "UPDATE", updated, touched, schema)
  }

  /** `DELETE FROM ... WHERE cond` analog: rows matching
    * `conditionSql` are removed; only their files are rewritten. The
    * pre-delete snapshot stays readable. */
  def delete(spark: SparkSession, path: String,
             conditionSql: String): Int = {
    val v = latestVersion(path).getOrElse(
      throw new IllegalArgumentException(s"no committed versions at $path"))
    val schema = schemaOf(path, v)
    // SQL DELETE semantics: only rows where the condition is TRUE are
    // removed — a NULL condition keeps the row (plain !cond would
    // silently drop it)
    val hit = coalesce(expr(conditionSql), lit(false))
    val touched = touchedFiles(spark, path, v, schema, _.filter(hit))
    val kept = readFiles(spark, path, touched, schema, v).filter(!hit)
    commitRewrite(spark, path, "DELETE", kept, touched, schema)
  }

  /** Merge-on-read DELETE — the DELETION-VECTOR form (Delta DVs):
    * rows matching `conditionSql` are removed WITHOUT rewriting any
    * data file. The deleted row POSITIONS (stable parquet row
    * indexes) land in one tiny sidecar; every touched entry re-links
    * its data file and points at the sidecar; untouched entries pass
    * through. Where the rewrite-based [[delete]] pays O(touched
    * files), this pays O(deleted rows) — the right verb for
    * SCATTERED deletes (a GDPR erasure touches nearly every file of
    * a 100 TB table; rewriting them all is a table rewrite, the
    * position sidecar is delete-sized). Readers anti-join the
    * broadcast position set per sidecar; a later [[optimize]] /
    * [[optimizeIncremental]] / any rewrite of the file MATERIALIZES
    * the DV back into clean files. Repeated MoR deletes on a file
    * fold the prior sidecar's positions into the new one, so each
    * entry always carries its complete deletion set in ONE sidecar.
    * A file whose rows are all deleted drops out of the manifest
    * entirely. Live row counts in the log stay exact. */
  def deleteVectors(spark: SparkSession, path: String,
                    conditionSql: String): Int = {
    val v = latestVersion(path).getOrElse(
      throw new IllegalArgumentException(s"no committed versions at $path"))
    val schema = schemaOf(path, v)
    val entries = manifestEntries(path, v)
    val hit = coalesce(expr(conditionSql), lit(false))
    val newDel = readEntries(spark, path, entries, schema, v,
        lineage = true)
      .filter(hit)
      .select(col("_graft_file").as("file"), col("_graft_pos").as("pos"))
    val touchedCounts = newDel.groupBy("file")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nv = v + 1
    val newEntries =
      if (touchedCounts.isEmpty) entries
      else {
        val touchedNames = touchedCounts.keySet
        // fold prior sidecars of re-touched files so the new sidecar
        // carries each touched file's COMPLETE position set
        val prior = entries
          .filter(e => touchedNames.contains(e.name)).flatMap(_.dv)
          .distinct.map { s =>
            spark.read.parquet(resolveOrFail(path, s, v))
              .filter(col("file").isin(touchedNames.toSeq: _*))
              .select(col("file"), col("pos"))
          }
        val allDel = (prior :+ newDel).reduce(_ unionByName _)
        val sidecar = writeDataFiles(allDel.repartition(1), path, nv,
          tag = "dv").head.name
        entries.flatMap { e =>
          touchedCounts.get(e.name) match {
            case None => Some(e)
            case Some(n) if e.rows - n <= 0 => None // fully deleted
            case Some(n) =>
              Some(e.copy(dv = Some(sidecar), rows = e.rows - n))
          }
        }
      }
    appendLog(path, nv, "DELETE[MOR]", newEntries.map(_.rows).sum,
      schema, newEntries)
    nv
  }

  /** `ALTER TABLE ADD COLUMN` analog (reference `1 Data
    * ingestion.py`:144-150): appends a column computed by `exprSql` as
    * a new version. When the expression constant-folds to NULL (the
    * plain schema-change case) the commit is METADATA-ONLY — every
    * data file re-links and the explicit-schema read fills the column
    * with nulls, exactly Delta's zero-rewrite ADD COLUMN. A computed
    * column necessarily rewrites every row. */
  def addColumn(spark: SparkSession, path: String, name: String,
                exprSql: String): Int = {
    val v = latestVersion(path).getOrElse(
      throw new IllegalArgumentException(s"no committed versions at $path"))
    val schema = schemaOf(path, v)
    require(!schema.fieldNames.contains(name),
      s"column $name already exists")
    val cur = read(spark, path)
    val withCol = cur.withColumn(name, expr(exprSql))
    val newType = withCol.schema(name).dataType
    // detect a plain-NULL column on the ANALYZED plan (the parsed
    // Column alone is an unresolved node in Spark 4 and can't fold)
    val foldsToNull = try {
      org.apache.spark.sql.graft.GraftBridge.analyzedPlan(withCol) match {
        case p: org.apache.spark.sql.catalyst.plans.logical.Project =>
          p.projectList.exists {
            case a: org.apache.spark.sql.catalyst.expressions.Alias
              if a.name == name =>
              a.child.foldable && a.child.eval(null) == null
            case _ => false
          }
        case _ => false
      }
    } catch { case _: Throwable => false }
    if (foldsToNull) {
      val nv = v + 1
      val files = manifestEntries(path, v)
      appendLog(path, nv, "ADD COLUMN", files.map(_.rows).sum,
        StructType(schema.fields :+ StructField(name, newType, nullable = true)),
        files)
      nv
    } else {
      // computed column: every row gains a value — full rewrite is the
      // honest cost, not an implementation shortcut
      commitRewrite(spark, path, "ADD COLUMN", withCol,
        manifest(path, v).map(_._1).toSet, nullableSchema(withCol.schema))
    }
  }

  /** Change-data-feed analog (`table_changes`): row-level diff
    * between two committed versions — `_change_type` is `insert` or
    * `delete`; an update surfaces as delete(old) + insert(new).
    * Multiset semantics (`exceptAll`), so duplicate rows diff
    * correctly. Files SHARED by both manifests contribute identical
    * multisets to both sides and cancel exactly — the diff reads only
    * the files that differ, so CDF cost tracks the CHANGE, not the
    * table. */
  def changes(spark: SparkSession, path: String, fromVersion: Int,
              toVersion: Int): DataFrame = {
    require(!vacuumedVersions(path).contains(fromVersion) &&
      !vacuumedVersions(path).contains(toVersion),
      s"cannot diff vacuumed versions at $path")
    val sa = schemaOf(path, fromVersion)
    val sb = schemaOf(path, toVersion)
    val ea = manifestEntries(path, fromVersion)
    val eb = manifestEntries(path, toVersion)
    // shared identity is the FULL entry (name AND deletion vector):
    // a file whose DV changed between versions has different live
    // content and must enter the diff on both sides
    val (onlyA, onlyB) =
      if (sa == sb) (ea.filterNot(eb.toSet), eb.filterNot(ea.toSet))
      else
        // schema changed between the versions: every file differs in
        // shape, diff the full frames (exceptAll requires same schema
        // and will refuse — same contract as before)
        (ea, eb)
    val a = readEntries(spark, path, onlyA, sa, fromVersion)
    val b = readEntries(spark, path, onlyB, sb, toVersion)
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
    * snapshot as the new latest version — a pure manifest RE-LINK,
    * zero bytes written (history keeps everything). */
  def restore(spark: SparkSession, path: String, toVersion: Int): Int = {
    require(isReadable(path, toVersion),
      s"cannot restore to unreadable version $toVersion at $path")
    val v = latestVersion(path).get + 1
    val files = manifestEntries(path, toVersion)
    appendLog(path, v, s"RESTORE[v=$toVersion]", files.map(_.rows).sum,
      schemaOf(path, toVersion), files)
    v
  }

  /** Delta `SHALLOW CLONE` analog: fork `src` into `dst` by copying
    * METADATA ONLY — the commit log (with its manifests) plus a base
    * pointer recording the source path AND the fork version. Pre-fork
    * versions resolve to the source's pool files through the
    * transitive pointer chase (zero data movement — what makes a
    * dev/test fork of a 100 TB production table instant and free),
    * while post-clone commits write to `dst`'s own pool and never
    * touch the source; the two histories diverge from the fork point
    * exactly like git branches. Cloning a clone works: the chase
    * follows base pointers through every generation. Vacuuming the
    * SOURCE breaks the clone's pre-fork time travel (Delta's
    * documented shallow-clone hazard — surfaced here as the same
    * read-time error). */
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
    // versions already unreadable at the source stay contractually
    // unreadable in the clone
    if (Files.exists(vacuumedFile(src)))
      Files.copy(vacuumedFile(src), vacuumedFile(dst))
    Files.writeString(basePtrFile(dst),
      Paths.get(src).toAbsolutePath.normalize.toString + "\n" +
        versions(src).last)
  }

  /** VACUUM analog: versions older than the newest `keepLast` are
    * marked unreadable (the retention CONTRACT — exactly Delta's
    * post-VACUUM time-travel behavior; history stays listable), then
    * pool files referenced by NO retained version are physically
    * deleted. A file an old version shares with a retained one — e.g.
    * through a RESTORE re-link — survives; only the clone hazard can
    * strand references (a clone's pointer into this pool is invisible
    * here, as in Delta). Returns the newly vacuumed versions. */
  def vacuum(path: String, keepLast: Int): Seq[Int] = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val all = versions(path)
    val already = vacuumedVersions(path)
    val removed = all.dropRight(keepLast).filterNot(already.contains)
    if (removed.nonEmpty) {
      val gone = already ++ removed
      Files.createDirectories(logDir(path))
      Files.writeString(vacuumedFile(path),
        gone.toSeq.sorted.mkString("", "\n", "\n"))
      def refs(v: Int): Seq[String] = manifestEntries(path, v)
        .flatMap(e => e.name +: e.dv.toSeq)
      val liveFiles = all.filterNot(gone.contains).flatMap(refs).toSet
      val deadFiles = removed.flatMap(refs).toSet -- liveFiles
      // only our OWN pool: files a clone resolves from its base belong
      // to the base table
      deadFiles.foreach { n =>
        val p = poolDir(path).resolve(n)
        if (Files.exists(p)) Files.delete(p)
      }
    }
    removed
  }

  /** DESCRIBE HISTORY analog: the commit log as a DataFrame (now also
    * carrying each version's file manifest and schema). */
  def history(spark: SparkSession, path: String): DataFrame =
    spark.read.json(logDir(path).toString)

  /** OPTIMIZE+ZORDER analog: clustered compaction committed as a new
    * version (history preserved — old versions still readable). A
    * layout rewrite touches every row by definition. */
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
