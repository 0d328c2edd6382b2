package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class PipelineSpec extends SparkSpec {

  private def freshDir = Files.createTempDirectory("graft_pipe").toString

  private val bronzeExps = Seq(
    Expectation("user present", "user_id is not null"),
    Expectation("value non-negative", "value >= 0"))

  test("stages chain, materialize as versioned tables, and log metrics") {
    val dir = freshDir
    val res = Pipeline.run(spark, tables.events, Seq(
      Pipeline.Stage("bronze", identity, bronzeExps),
      Pipeline.Stage("silver",
        df => Medallion.dedupLatest(df, "user_id", "ts", "event_id"),
        Seq(Expectation("value sane", "value <= 400")),
        Pipeline.OnViolation.DropRows),
      Pipeline.Stage("gold",
        df => df.groupBy(col("event_type")).agg(count(lit(1)).as("n")))),
      dir)
    // event log: 2 bronze + 1 silver constraints, no gold suite
    val log = res.eventLog.orderBy("stage_seq", "constraint_name").collect()
    assert(log.length == 3)
    assert(log.map(_.getString(1)).toSeq == Seq("bronze", "bronze", "silver"))
    val total = tables.events.count()
    val bronzeUser = log.find(_.getString(2) == "user present").get
    assert(bronzeUser.getLong(3) + bronzeUser.getLong(4) == total)
    // silver dropped its violating rows before materializing
    val silver = res.tables("silver")
    assert(silver.filter(col("value") > 400).count() == 0)
    val sane = log.find(_.getString(2) == "value sane").get
    assert(sane.getLong(3) == silver.count())
    // each stage is a VersionedTable with one PIPELINE commit
    val h = VersionedTable.history(spark, s"$dir/gold").collect()
    assert(h.length == 1 && h.head.getAs[String]("operation") == "PIPELINE[gold]")
    // gold reads the silver TABLE (post-drop): group counts sum to silver rows
    assert(res.tables("gold").agg(sum("n")).collect()(0).getLong(0) ==
      silver.count())
  }

  test("Fail mode aborts the run on a violated constraint") {
    val dir = freshDir
    intercept[ExpectationViolation] {
      Pipeline.run(spark, tables.events, Seq(
        Pipeline.Stage("bronze", identity,
          Seq(Expectation("impossible", "value < -1e9")),
          Pipeline.OnViolation.Fail)), dir)
    }
  }

  test("re-running a pipeline commits new versions, keeping history") {
    val dir = freshDir
    val stages = Seq(Pipeline.Stage("bronze", identity))
    Pipeline.run(spark, tables.nation, stages, dir)
    Pipeline.run(spark, tables.nation, stages, dir)
    assert(VersionedTable.versions(s"$dir/bronze") == Seq(0, 1))
  }

  private val incSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("event_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("ts",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("user_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("event_type",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("value",
      org.apache.spark.sql.types.DoubleType)))

  private val incCols = Seq("event_id", "ts", "user_id", "event_type", "value")

  test("incremental restart processes ONLY new files and converges to the batch truth") {
    val src = freshDir
    val store = freshDir
    val ckpt = freshDir
    val stages = Seq(
      Pipeline.Stage("bronze", identity,
        Seq(Expectation("user present", "user_id is not null"))),
      Pipeline.Stage("silver", identity,
        Seq(Expectation("value sane", "value <= 400")),
        Pipeline.OnViolation.DropRows),
      // COMPLETE-mode gold recomputed from merged silver per batch
      Pipeline.Stage("gold",
        df => df.groupBy(col("event_type")).agg(count(lit(1)).as("n")),
        recompute = true))
    val ev = tables.events.select(incCols.map(col): _*)
    // run 1: first half of the events, several files
    ev.filter(col("event_id") % 2 === 0).repartition(4)
      .write.mode("append").json(src)
    val r1 = Pipeline.runIncremental(spark, src, incSchema, incCols, stages,
      store, ckpt, key = "user_id", orderCol = "ts", tieBreaker = "event_id")
    val v1 = VersionedTable.versions(s"$store/silver").size
    assert(v1 >= 2, s"3-files-per-trigger over 4 files should take ≥2 batches, got $v1")
    // run 2, same checkpoint: only the newly added files are processed
    ev.filter(col("event_id") % 2 === 1).repartition(4)
      .write.mode("append").json(src)
    val r2 = Pipeline.runIncremental(spark, src, incSchema, incCols, stages,
      store, ckpt, key = "user_id", orderCol = "ts", tieBreaker = "event_id")
    val v2 = VersionedTable.versions(s"$store/silver").size
    assert(v2 > v1 && v2 - v1 <= 3,
      s"restart should commit only the new files' batches, got $v1 -> $v2")
    // the merged silver table equals the one-shot batch truth
    val expected = Medallion.dedupLatest(
      ev.filter(col("value") <= 400), "user_id", "ts", "event_id")
    assert(r2.tables("silver").exceptAll(expected).count() == 0)
    assert(expected.exceptAll(r2.tables("silver")).count() == 0)
    // COMPLETE-mode gold = aggregate over final silver, one
    // full-snapshot version per processed batch
    val goldExpected = expected.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
    assert(r2.tables("gold").exceptAll(goldExpected).isEmpty &&
      goldExpected.exceptAll(r2.tables("gold")).isEmpty)
    assert(VersionedTable.versions(s"$store/gold").size ==
      VersionedTable.versions(s"$store/silver").size)
    // the per-batch event log sums to the global audit
    val logSum = r2.eventLog.filter(col("constraint_name") === "user present")
      .agg(sum("passed_records"), sum("failed_records")).collect()(0)
    assert(logSum.getLong(0) == ev.count() && logSum.getLong(1) == 0L)
    // retention: a catch-up run (no new files) with retainVersions=1
    // vacuums old snapshots; history stays listable, latest readable
    val r3 = Pipeline.runIncremental(spark, src, incSchema, incCols, stages,
      store, ckpt, key = "user_id", orderCol = "ts", tieBreaker = "event_id",
      retainVersions = 1)
    assert(VersionedTable.versions(s"$store/silver").size == v2,
      "vacuum must keep the commit history")
    assert(r3.tables("silver").count() == r2.tables("silver").count())
    intercept[IllegalArgumentException] {
      VersionedTable.read(spark, s"$store/silver", Some(0)).count()
    }
  }

  test("incremental curation over document batches matches the batch chain") {
    val src = freshDir
    val store = freshDir
    val ckpt = freshDir
    val docSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("source",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("lang",
        org.apache.spark.sql.types.StringType)))
    val docCols = Seq("doc_id", "text", "source", "lang")
    // the per-doc curation filter (map-only scorers joined 1:1)
    val curate: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      df => {
        val lang = TextAnalysis.langId(df)
          .select(col("doc_id"), col("predicted_lang"))
        val quality = TextAnalysis.quality(df)
          .select(col("doc_id"), col("quality_score"))
        df.join(lang, "doc_id").join(quality, "doc_id")
          .filter(col("predicted_lang") === "en" &&
            col("quality_score") >= 0.1)
          .select(col("doc_id"), col("text"), col("source"), col("lang"))
      }
    val stages = Seq(
      Pipeline.Stage("curated", curate),
      // exact-dedup canonical: merge on the content hash keeping the
      // SMALLEST doc_id — orderCol is the negated id, so the
      // recency-merge min-selects and the result is batch-independent
      Pipeline.Stage("canonical",
        df => df.withColumn("text_hash", sha2(col("text"), 256))
          .withColumn("neg_id", -col("doc_id")),
        merge = Some(("text_hash", "neg_id", "neg_id"))))
    tables.documents.select(docCols.map(col): _*)
      .repartition(5).write.mode("append").json(src)
    val res = Pipeline.runIncremental(spark, src, docSchema, docCols,
      stages, store, ckpt, key = "doc_id", orderCol = "doc_id",
      tieBreaker = "doc_id")
    // batch truth: curate the whole corpus at once, then keep the min
    // doc_id per content hash among the survivors
    val batchCurated = curate(tables.documents.select(docCols.map(col): _*))
    val batchCanon = batchCurated
      .groupBy(sha2(col("text"), 256).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
    val gotCurated = res.tables("curated").select("doc_id")
    assert(gotCurated.exceptAll(batchCurated.select("doc_id")).isEmpty &&
      batchCurated.select("doc_id").exceptAll(gotCurated).isEmpty)
    val gotCanon = res.tables("canonical").select("doc_id")
    assert(gotCanon.exceptAll(batchCanon.select("doc_id")).isEmpty &&
      batchCanon.select("doc_id").exceptAll(gotCanon).isEmpty)
  }

  test("a retried micro-batch id is a no-op (exactly-once per stage)") {
    val store = freshDir
    val stages = Seq(
      Pipeline.Stage("bronze", identity,
        Seq(Expectation("user present", "user_id is not null"))))
    val batch = tables.events.select(incCols.map(col): _*).limit(100)
    Pipeline.incrementalBatch(spark, stages, store, "user_id", "ts",
      "event_id")(batch, 7L)
    val rows1 = VersionedTable.read(spark, s"$store/bronze").count()
    val log1 = Pipeline.incrementalEventLog(spark, store).count()
    // at-least-once delivery retries the same batch id
    Pipeline.incrementalBatch(spark, stages, store, "user_id", "ts",
      "event_id")(batch, 7L)
    assert(VersionedTable.versions(s"$store/bronze").size == 1)
    assert(VersionedTable.read(spark, s"$store/bronze").count() == rows1)
    assert(Pipeline.incrementalEventLog(spark, store).count() == log1)
  }
}
