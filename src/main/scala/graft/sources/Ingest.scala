package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructType, StringType}

/** File-format ingestion (reference: `1 Data ingestion.py`:86-93 CSV
  * options; `2 Medaillon architecture.py`:192-199 JSON; autoloader
  * `_rescued_data` at :262-274).
  *
  * Always explicit-schema (schema inference is a full extra pass —
  * never at 100 TB) with PERMISSIVE parsing: malformed records land
  * in a `_rescued_data` column instead of failing the load, matching
  * the autoloader's rescued-data behavior.
  */
object Ingest {

  val RescueCol = "_rescued_data"

  private def withRescue(schema: StructType): StructType =
    if (schema.fieldNames.contains(RescueCol)) schema
    else schema.add(RescueCol, StringType, nullable = true)

  /** CSV with header/delimiter/quote controls (the reference's exact
    * option set) + rescued-data capture. */
  def csv(spark: SparkSession, path: String, schema: StructType,
          header: Boolean = true, delimiter: String = ",",
          quote: String = "\""): DataFrame =
    spark.read
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .option("quote", quote)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", RescueCol)
      .schema(withRescue(schema))
      .csv(path)

  /** JSON-lines with explicit schema + rescued-data capture. */
  def json(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", RescueCol)
      .schema(withRescue(schema))
      .json(path)

  /** Schema-INFERENCE CSV read (reference `1 Data ingestion.py`:86-93
    * `inferSchema=true`): costs one extra full pass over the data —
    * offered for reference parity; prefer explicit schemas at 100 TB. */
  def csvInferred(spark: SparkSession, path: String,
                  header: Boolean = true,
                  delimiter: String = ","): DataFrame =
    spark.read
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .option("inferSchema", "true")
      .csv(path)

  /** Pruned/pushed parquet scan — the declarative path: Catalyst
    * pushes `filterSql` and the column list into the reader. */
  def parquetPruned(spark: SparkSession, path: String,
                    columns: Seq[String], filterSql: String): DataFrame =
    spark.read.parquet(path).filter(expr(filterSql))
      .select(columns.map(col): _*)

  /** Schema-evolution read: union the schemas of all files (the
    * reference's autoloader `mergeSchema`/schema-evolution behavior);
    * columns absent in older files read as null. */
  def parquetMergeSchema(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  // ---------- schema-location persistence ----------
  // Autoloader `cloudFiles.schemaLocation` + `schemaHints` analog
  // (reference `2 Medaillon architecture.py`:262-274): the schema is
  // inferred ONCE on first open, persisted beside the checkpoint
  // state, and every later open — including restarts — reads the
  // store instead of paying another inference pass over the data.

  private def schemaFile(schemaLocation: String) =
    java.nio.file.Paths.get(schemaLocation, "schema.json")

  /** The persisted schema at `schemaLocation`, if one exists. */
  def loadSchema(schemaLocation: String): Option[StructType] = {
    val f = schemaFile(schemaLocation)
    if (java.nio.file.Files.exists(f))
      Some(org.apache.spark.sql.types.DataType
        .fromJson(java.nio.file.Files.readString(f)).asInstanceOf[StructType])
    else None
  }

  /** Persist `schema` at `schemaLocation` (overwrites). */
  def saveSchema(schemaLocation: String, schema: StructType): Unit = {
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(schemaLocation))
    java.nio.file.Files.writeString(schemaFile(schemaLocation), schema.json)
    ()
  }

  /** JSON read with schema-location persistence: first open infers
    * (one extra pass — paid exactly once per location), applies
    * `hints` (the `schemaHints` analog: pin or add typed columns the
    * sample may under-infer), persists, and reads; every later open
    * reads with the STORED schema — no re-inference, stable columns
    * across restarts. Fields appearing in newer files but absent from
    * the stored schema are ignored until [[evolveSchema]] widens the
    * store (rescue capture stays available via the `_rescued_data`
    * column for malformed rows). */
  def jsonWithSchemaLocation(spark: SparkSession, path: String,
                             schemaLocation: String,
                             hints: Seq[(String, org.apache.spark.sql.types.DataType)] = Nil): DataFrame = {
    val schema = loadSchema(schemaLocation).getOrElse {
      val inferred = spark.read.json(path).schema
      val hinted = StructType(
        inferred.map(f => hints.collectFirst {
          case (n, t) if n == f.name => f.copy(dataType = t)
        }.getOrElse(f)) ++
          hints.collect {
            case (n, t) if !inferred.fieldNames.contains(n) =>
              org.apache.spark.sql.types.StructField(n, t)
          })
      saveSchema(schemaLocation, hinted)
      hinted
    }
    json(spark, path, schema)
  }

  /** Schema evolution for a persisted location: re-infer over the
    * current files, widen the stored schema with any NEW fields
    * (stored types win on conflict — evolution adds columns, never
    * mutates committed ones), persist, return the widened schema.
    * The explicit-evolution step a production autoloader runs when
    * its rescue column starts filling up. */
  def evolveSchema(spark: SparkSession, path: String,
                   schemaLocation: String): StructType = {
    val stored = loadSchema(schemaLocation).getOrElse(
      throw new IllegalStateException(
        s"no persisted schema at $schemaLocation — open the source once first"))
    val inferred = spark.read.json(path).schema
    val widened = StructType(stored ++
      inferred.filterNot(f => stored.fieldNames.contains(f.name)))
    saveSchema(schemaLocation, widened)
    widened
  }

  /** Line-delimited raw-text corpus ingest — the rawest LLM-data
    * format (one document per line, id-prefixed). `spark.read.text`
    * streams lines without any parser; the id/text split is one
    * codegen'd substring pair. At 100 TB this is the splittable,
    * schema-free landing path for text dumps; downstream operators
    * see the same (doc_id, text) frame the parquet tables provide. */
  def textCorpus(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.read.text(path)
      .select(
        substring_index(col("value"), "\t", 1).cast("long").as("doc_id"),
        expr("substring(value, instr(value, '\t') + 1)").as("text"))
  }

  /** Write the (doc_id, text) frame as id-prefixed raw lines —
    * the staging half of [[textCorpus]]. Tab- and newline-free text
    * is a precondition (a tab breaks the id split, a newline splits
    * one doc into two phantom lines) — enforced INLINE in the single
    * write pass via `raise_error`, so staging costs one scan and a
    * violating row fails the job instead of corrupting the format. */
  def writeTextCorpus(df: DataFrame, path: String): Unit = {
    import org.apache.spark.sql.functions._
    // stage into a sibling dir and swap on success: a validation
    // failure must never have destroyed previously staged data (an
    // in-place overwrite deletes the target BEFORE the job runs)
    val tmp = s"$path._staging"
    df.select(
        when(col("text").rlike("[\\t\\n\\r]"),
          raise_error(concat(lit("doc "), col("doc_id").cast("string"),
            lit(" contains tab/newline — not line-safe"))))
          .otherwise(concat(col("doc_id").cast("string"), lit("\t"),
            col("text"))).as("value"))
      .write.mode("overwrite").text(tmp)
    val target = new java.io.File(path)
    org.apache.commons.io.FileUtils.deleteQuietly(target)
    require(!target.exists, s"cannot replace $path")
    require(new java.io.File(tmp).renameTo(target),
      s"failed to move staged corpus into $path")
  }

  /** Round-trip helper backing the `ingest_csv`/`ingest_json` oracle
    * queries: materialize `df` in `format` under `cachePath`, read it
    * back through the rescuing reader, drop the (all-null) rescue
    * column so output matches the source table. */
  def roundTrip(spark: SparkSession, df: DataFrame, format: String,
                cachePath: String): DataFrame = {
    val schema = df.schema
    format match {
      case "csv" =>
        df.write.mode("overwrite").option("header", "true").csv(cachePath)
        csv(spark, cachePath, schema).drop(RescueCol)
      case "json" =>
        df.write.mode("overwrite").json(cachePath)
        json(spark, cachePath, schema).drop(RescueCol)
      case "orc" =>
        df.write.mode("overwrite").orc(cachePath)
        spark.read.schema(schema).orc(cachePath)
      case "xml" =>
        // Spark 4's built-in XML source: one <row> element per record
        df.write.mode("overwrite").option("rowTag", "row")
          .format("xml").save(cachePath)
        spark.read.schema(schema).option("rowTag", "row")
          .format("xml").load(cachePath)
    }
  }
}
