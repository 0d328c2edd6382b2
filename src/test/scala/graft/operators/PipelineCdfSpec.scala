package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The CDF-fed incremental pipeline ([[Pipeline.runIncrementalCdf]]):
  * silver/gold stages consume a versioned bronze table's change feed
  * as keyed O(change) verbs. Contract under test: updates replay in
  * CDF order (the `_graft_src_version` tag, NOT payload values),
  * full-row bronze deletes propagate to silver and re-snapshot gold,
  * the DONE cursor survives restart (nothing re-applies), and a
  * replayed hop is a no-op step-by-step. */
class PipelineCdfSpec extends SparkSpec {

  private def fresh = Files.createTempDirectory("graft_pcdf").toString

  private def mkStages = Seq(
    Pipeline.Stage("silver", df => df.filter(col("v").isNotNull)),
    Pipeline.Stage("gold", df => df.groupBy("grp")
      .agg(count(lit(1)).as("n"), sum("v").as("sum_v")),
      recompute = true))

  private def seedBronze(bronze: String): Unit = {
    VersionedTable.write(spark.range(100).select(col("id").as("k"),
      (col("id") % 4).as("grp"), col("id").as("v")), bronze)
  }

  test("updates replay in CDF order even when the payload value goes " +
    "DOWN; deletes reach silver and gold re-snapshots") {
    val dir = fresh
    val (bronze, store) = (s"$dir/bronze", s"$dir/store")
    seedBronze(bronze)                                         // v0
    VersionedTable.update(spark, bronze, "k < 10",
      Seq("v" -> "v - 1000"))                                  // v1: values DROP
    VersionedTable.delete(spark, bronze, "k >= 90")            // v2: 10 keys gone
    Pipeline.runIncrementalCdf(spark, bronze, mkStages, store,
      s"$dir/ckpt", "k", "_graft_src_version", "k")
    val silver = VersionedTable.read(spark, s"$store/silver")
    assert(silver.count() == 90, "deleted keys must leave silver")
    // a value-ordered merge would keep the OLD (higher) v; CDF order
    // keeps the update
    assert(silver.filter(col("k") === 5).head.getAs[Long]("v") == -995L)
    val gold = VersionedTable.read(spark, s"$store/gold")
    val expect = VersionedTable.read(spark, bronze)
      .groupBy("grp").agg(count(lit(1)).as("n"), sum("v").as("sum_v"))
    assert(gold.orderBy("grp").collect().toSeq ==
      expect.orderBy("grp").collect().toSeq)
  }

  test("restart resumes from the DONE cursor: pre-restart hops do not " +
    "re-apply, commits landed while down flow through") {
    val dir = fresh
    val (bronze, store) = (s"$dir/bronze", s"$dir/store")
    seedBronze(bronze)
    Pipeline.runIncrementalCdf(spark, bronze, mkStages, store,
      s"$dir/ckpt", "k", "_graft_src_version", "k")
    val silverOps1 = VersionedTable.operations(s"$store/silver")
    assert(silverOps1.exists(_.contains("PIPELINE_CDF_DONE[v=0]")))
    // while "down": an append lands
    VersionedTable.append(spark, spark.range(100, 120)
      .select(col("id").as("k"), (col("id") % 4).as("grp"),
        col("id").as("v")), bronze)
    Pipeline.runIncrementalCdf(spark, bronze, mkStages, store,
      s"$dir/ckpt", "k", "_graft_src_version", "k")
    val silver = VersionedTable.read(spark, s"$store/silver")
    assert(silver.count() == 120)
    val ops = VersionedTable.operations(s"$store/silver")
    // exactly one merge commit per bronze version — v0 did not re-run
    assert(ops.count(_.contains("PIPELINE_INC[silver,batch=0]")) == 1)
    assert(ops.count(_.contains("PIPELINE_INC[silver,batch=1]")) == 1)
  }

  test("a replayed hop is a no-op: re-driving cdfHop for an applied " +
    "version changes no stage table") {
    val dir = fresh
    val (bronze, store) = (s"$dir/bronze", s"$dir/store")
    seedBronze(bronze)
    VersionedTable.delete(spark, bronze, "k >= 95")            // v1
    val stages = mkStages
    Pipeline.cdfHop(spark, bronze, stages, store, "k",
      "_graft_src_version", "k", 0)
    Pipeline.cdfHop(spark, bronze, stages, store, "k",
      "_graft_src_version", "k", 1)
    val sv = VersionedTable.latestVersion(s"$store/silver").get
    val gv = VersionedTable.latestVersion(s"$store/gold").get
    // at-least-once redelivery: replay both hops
    Pipeline.cdfHop(spark, bronze, stages, store, "k",
      "_graft_src_version", "k", 0)
    Pipeline.cdfHop(spark, bronze, stages, store, "k",
      "_graft_src_version", "k", 1)
    assert(VersionedTable.latestVersion(s"$store/silver").get == sv)
    assert(VersionedTable.latestVersion(s"$store/gold").get == gv)
    assert(VersionedTable.read(spark, s"$store/silver").count() == 95)
  }
}
