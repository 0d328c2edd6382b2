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
}
