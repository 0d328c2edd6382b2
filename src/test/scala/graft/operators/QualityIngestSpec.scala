package graft.operators

import graft.SparkSpec
import graft.sources.Ingest
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

class QualityIngestSpec extends SparkSpec {

  test("expectations metrics: one row per constraint, counters sum to total") {
    val out = Expectations.metrics(tables.events, Expectations.EventSuite)
      .collect()
    val total = tables.events.count()
    assert(out.length == Expectations.EventSuite.length)
    out.foreach { r =>
      assert(r.getAs[Long]("passed_records") +
        r.getAs[Long]("failed_records") == total)
    }
    // 'no error events' must report failures on this dataset
    val errs = out.find(_.getString(0) == "no error events").get
    assert(errs.getAs[Long]("failed_records") > 0)
  }

  test("refIntegrity: planted orphans, NULL fks and unreferenced pks " +
    "are counted exactly") {
    import spark.implicits._
    val fact = Seq[(java.lang.Long, String)](
      (1L, "a"), (2L, "b"), (1L, "c"), (99L, "orphan1"),
      (98L, "orphan2"), (null, "nullfk")).toDF("cust_id", "tag")
    val dim = Seq((1L, "one"), (2L, "two"), (3L, "unreferenced"))
      .toDF("id", "name")
    val r = Expectations.refIntegrity(Seq(
      Relation("fact_dim", fact, "cust_id", dim, "id"))).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_fk_rows") == 6L)
    assert(row.getAs[Long]("n_null_fk") == 1L)
    assert(row.getAs[Long]("n_orphan_rows") == 2L)
    assert(row.getAs[Long]("orphan_ppm") == 2000000L / 6L)
    assert(row.getAs[Long]("n_pk_rows") == 3L)
    assert(row.getAs[Long]("n_unreferenced_pk") == 1L)
  }

  test("refIntegrity: the star schema's declared relationships are " +
    "clean on testdata") {
    val t = tables
    val out = Expectations.refIntegrity(Seq(
      Relation("orders_customer", t.orders, "o_custkey",
        t.customer, "c_custkey"),
      Relation("lineitem_orders", t.lineitem, "l_orderkey",
        t.orders, "o_orderkey"))).collect()
    assert(out.length == 2)
    for (r <- out) {
      assert(r.getAs[Long]("n_orphan_rows") == 0L,
        s"${r.getAs[String]("relation")} must have no orphans")
      assert(r.getAs[Long]("n_null_fk") == 0L)
    }
  }

  test("freshnessAudit: lags are relative to the global newest and " +
    "the stale gate splits on the threshold") {
    import spark.implicits._
    val ev = Seq(("a", 1000L), ("a", 5000L), ("b", 2000L), ("c", 4000L))
      .toDF("event_type", "ts")
    val out = Expectations.freshnessAudit(ev, staleUs = 1000L)
      .collect().map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("lag_us"),
          r.getAs[Boolean]("stale")))).toMap
    assert(out("a") == ((2L, 0L, false)))
    assert(out("b") == ((1L, 3000L, true)))
    assert(out("c") == ((1L, 1000L, false)), "lag == threshold is fresh")
  }

  test("dropInvalid + quarantine partition the input") {
    val suite = Expectations.EventSuite
    val kept = Expectations.dropInvalid(tables.events, suite).count()
    val quarantined = Expectations.quarantine(tables.events, suite).count()
    assert(kept + quarantined == tables.events.count())
    assert(quarantined > 0)
  }

  test("NULL predicates count as violations: drop+quarantine still partition") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 5.0), (2L, null), (3L, -1.0))
      .toDF("id", "value")
    val suite = Seq(Expectation("value non-negative", "value >= 0"))
    val kept = Expectations.dropInvalid(df, suite)
    val bad = Expectations.quarantine(df, suite)
    // the NULL row is a violation: dropped from the clean set AND
    // present in quarantine — never lost from both
    assert(kept.collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(bad.collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
    val m = Expectations.metrics(df, suite).head()
    assert(m.getAs[Long]("passed_records") == 1 &&
      m.getAs[Long]("failed_records") == 2)
  }

  test("failOnViolation throws with constraint detail") {
    val e = intercept[ExpectationViolation] {
      Expectations.failOnViolation(tables.events, Expectations.EventSuite)
    }
    assert(e.getMessage.contains("no error events"))
  }

  test("csv ingest rescues malformed rows instead of failing") {
    val dir = Files.createTempDirectory("graft_csv").toFile
    val f = new java.io.File(dir, "data.csv")
    val w = new java.io.PrintWriter(f)
    w.println("id,qty"); w.println("1,10"); w.println("2,not_a_number")
    w.println("3,30"); w.close()
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("qty", LongType)))
    // cache: Spark disallows querying only the corrupt-record column
    // straight off a raw file scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN)
    val out = Ingest.csv(spark, f.getPath, schema).cache()
    assert(out.count() == 3)
    val rescued = out.filter(col(Ingest.RescueCol).isNotNull)
    assert(rescued.count() == 1)
    assert(rescued.head.getAs[String](Ingest.RescueCol).contains("not_a_number"))
  }

  test("json ingest rescues corrupt lines") {
    val dir = Files.createTempDirectory("graft_json").toFile
    val f = new java.io.File(dir, "data.json")
    val w = new java.io.PrintWriter(f)
    w.println("""{"id": 1, "qty": 10}"""); w.println("""{"id": 2, "qty":""")
    w.close()
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("qty", LongType)))
    val out = Ingest.json(spark, f.getPath, schema).cache()
    assert(out.count() == 2)
    assert(out.filter(col(Ingest.RescueCol).isNotNull).count() == 1)
  }

  test("schema location: infer once, restarts reuse the store, evolve widens") {
    val dir = Files.createTempDirectory("graft_schloc").toFile.getPath
    val loc = Files.createTempDirectory("graft_schloc_meta").toFile.getPath
    val w1 = new java.io.PrintWriter(s"$dir/a.json")
    w1.println("""{"id": 1, "qty": 10}"""); w1.close()
    // first open: infers, applies the hint (qty pinned wider than the
    // sample suggests), persists
    val first = Ingest.jsonWithSchemaLocation(spark, dir, loc,
      hints = Seq("qty" -> org.apache.spark.sql.types.DoubleType))
    assert(first.schema("qty").dataType ==
      org.apache.spark.sql.types.DoubleType)
    assert(Ingest.loadSchema(loc).nonEmpty, "schema must be persisted")
    // a wider file lands; the restart does NOT re-infer — the stored
    // schema (no `extra` column) is used as-is
    val w2 = new java.io.PrintWriter(s"$dir/b.json")
    w2.println("""{"id": 2, "qty": 20, "extra": "x"}"""); w2.close()
    val restart = Ingest.jsonWithSchemaLocation(spark, dir, loc)
    assert(!restart.columns.contains("extra"),
      "restart must read the persisted schema, not re-infer")
    assert(restart.count() == 2)
    // explicit evolution widens the store with the new field only;
    // committed columns keep their stored (hinted) types
    val widened = Ingest.evolveSchema(spark, dir, loc)
    assert(widened.fieldNames.contains("extra"))
    assert(widened("qty").dataType == org.apache.spark.sql.types.DoubleType)
    val evolved = Ingest.jsonWithSchemaLocation(spark, dir, loc)
    assert(evolved.columns.contains("extra"))
    // pre-evolution rows read the new column as null
    assert(evolved.filter(col("extra").isNull).count() == 1)
  }

  test("mergeSchema read unions evolving file schemas") {
    val dir = Files.createTempDirectory("graft_evolve").toFile.getPath
    tables.nation.select("n_nationkey", "n_name")
      .write.mode("overwrite").parquet(s"$dir/batch=1")
    tables.nation.select(col("n_nationkey"), col("n_name"),
      col("n_regionkey"))
      .write.mode("overwrite").parquet(s"$dir/batch=2")
    val merged = Ingest.parquetMergeSchema(spark, dir)
    assert(merged.columns.toSet ==
      Set("n_nationkey", "n_name", "n_regionkey", "batch"))
    assert(merged.count() == 50)
    // rows from the pre-evolution file carry null for the new column
    assert(merged.filter(col("batch") === 1 &&
      col("n_regionkey").isNull).count() == 25)
  }

  test("parquetPruned pushes filter and prunes columns at the scan") {
    val df = Ingest.parquetPruned(spark, s"$sfDir/lineitem.parquet",
      Seq("l_orderkey", "l_extendedprice"), "l_orderkey = 42")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_orderkey"))
    assert(plan.contains("ReadSchema") && !plan.contains("l_comment"))
    // only the two requested columns survive
    assert(df.columns.toSeq == Seq("l_orderkey", "l_extendedprice"))
  }

  test("clustered write produces the requested file count, sorted within files") {
    val dir = Files.createTempDirectory("graft_opt").toFile.getPath
    Maintenance.writeClustered(tables.lineitem, dir,
      Seq("l_shipdate", "l_orderkey"), numFiles = 4)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length == 4)
    // range partitioning: per-file shipdate ranges should be disjoint →
    // global sortedness when files ordered by min
    // cast to string: fixed-width ISO renderings compare correctly and
    // sidestep TIMESTAMP vs TIMESTAMP_NTZ read-back differences
    val perFile = files.map { f =>
      val d = spark.read.parquet(f.getPath)
        .agg(min(col("l_shipdate").cast("string")),
          max(col("l_shipdate").cast("string"))).head
      (d.getString(0), d.getString(1))
    }.sortBy(_._1)
    perFile.sliding(2).foreach {
      case Array((_, maxA), (minB, _)) => assert(maxA <= minB)
      case _ =>
    }
  }

  test("z-order layout prunes 2-D range queries better than linear sort") {
    val zdir = Files.createTempDirectory("graft_z").toFile.getPath
    val ldir = Files.createTempDirectory("graft_lin").toFile.getPath
    val li = tables.lineitem
    Maintenance.writeZOrdered(li, zdir, "l_partkey", "l_suppkey",
      numFiles = 16)
    Maintenance.writeClustered(li, ldir, Seq("l_partkey", "l_suppkey"),
      numFiles = 16)
    // box: full partkey range, middle eighth of suppkey — the case the
    // linear (partkey-major) sort cannot prune at all, because every
    // file spans suppkey's whole range
    val mm = li.agg(min(col("l_suppkey")).cast("long"),
      max(col("l_suppkey")).cast("long")).head
    val (sLo, sHi) = (mm.getLong(0), mm.getLong(1))
    val (qLo, qHi) = (sLo + (sHi - sLo) * 7 / 16, sLo + (sHi - sLo) * 9 / 16)
    def overlapping(dir: String): Int =
      new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).count { f =>
          val d = spark.read.parquet(f.getPath)
            .agg(min(col("l_suppkey")).cast("long"),
              max(col("l_suppkey")).cast("long")).head
          !(d.getLong(1) < qLo || d.getLong(0) > qHi)
        }
    val (z, l) = (overlapping(zdir), overlapping(ldir))
    // every linear file overlaps; the Morton rectangles must not
    assert(l == 16, s"expected linear layout to span the box in all files, got $l")
    assert(z < l, s"z-order ($z files) must beat linear ($l files)")
    assert(z <= 12, s"z-order should prune at least a quarter, got $z")
    // layout changes must not change content
    assert(spark.read.parquet(zdir).count() == li.count())
  }

  test("hilbert layout prunes the secondary dimension and round-trips content") {
    val hdir = Files.createTempDirectory("graft_hil").toFile.getPath
    val ldir = Files.createTempDirectory("graft_lin_h").toFile.getPath
    val li = tables.lineitem
    Maintenance.writeHilbert(li, hdir, "l_partkey", "l_suppkey",
      numFiles = 16)
    Maintenance.writeClustered(li, ldir, Seq("l_partkey", "l_suppkey"),
      numFiles = 16)
    // same box as the Morton spec: full partkey range, middle eighth
    // of suppkey — unprunable under the partkey-major linear sort
    val mm = li.agg(min(col("l_suppkey")).cast("long"),
      max(col("l_suppkey")).cast("long")).head
    val (sLo, sHi) = (mm.getLong(0), mm.getLong(1))
    val (qLo, qHi) = (sLo + (sHi - sLo) * 7 / 16, sLo + (sHi - sLo) * 9 / 16)
    def overlapping(dir: String): Int =
      new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).count { f =>
          val d = spark.read.parquet(f.getPath)
            .agg(min(col("l_suppkey")).cast("long"),
              max(col("l_suppkey")).cast("long")).head
          !(d.getLong(1) < qLo || d.getLong(0) > qHi)
        }
    val (h, l) = (overlapping(hdir), overlapping(ldir))
    assert(l == 16, s"expected linear layout to span the box in all files, got $l")
    assert(h < l, s"hilbert ($h files) must beat linear ($l files)")
    assert(h <= 12, s"hilbert should prune at least a quarter, got $h")
    // layout changes must not change content
    assert(spark.read.parquet(hdir).exceptAll(li).isEmpty)
    assert(li.exceptAll(spark.read.parquet(hdir)).isEmpty)
  }

  test("3-D z-order keeps the SECOND and THIRD dimensions prunable") {
    val zdir = Files.createTempDirectory("graft_z3").toFile.getPath
    val ldir = Files.createTempDirectory("graft_lin3").toFile.getPath
    val li = tables.lineitem
    Maintenance.writeZOrdered3(li, zdir, "l_orderkey", "l_partkey",
      "l_suppkey", numFiles = 16)
    Maintenance.writeClustered(li, ldir,
      Seq("l_orderkey", "l_partkey", "l_suppkey"), numFiles = 16)
    // narrow box on the THIRD coordinate only — the orderkey-major
    // linear sort cannot prune it at all
    val mm = li.agg(min(col("l_suppkey")).cast("long"),
      max(col("l_suppkey")).cast("long")).head
    val (sLo, sHi) = (mm.getLong(0), mm.getLong(1))
    val (qLo, qHi) = (sLo + (sHi - sLo) * 7 / 16, sLo + (sHi - sLo) * 9 / 16)
    def overlapping(dir: String): Int =
      new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).count { f =>
          val d = spark.read.parquet(f.getPath)
            .agg(min(col("l_suppkey")).cast("long"),
              max(col("l_suppkey")).cast("long")).head
          !(d.getLong(1) < qLo || d.getLong(0) > qHi)
        }
    val (z, l) = (overlapping(zdir), overlapping(ldir))
    assert(l == 16, s"linear layout should span the box in all files, got $l")
    assert(z < l, s"3-D z-order ($z files) must beat linear ($l)")
    // content survives the 3-D curve layout
    assert(spark.read.parquet(zdir).exceptAll(li).isEmpty)
    assert(li.exceptAll(spark.read.parquet(zdir)).isEmpty)
  }

  test("zone map skips files a clustered range read cannot match") {
    val dir = Files.createTempDirectory("graft_zm").toFile.getPath
    Maintenance.writeClustered(tables.events
      .select("event_id", "ts", "user_id", "event_type", "value"),
      dir, Seq("value"), numFiles = 8)
    Maintenance.writeZoneMap(spark, dir, Seq("value"))
    // a narrow value range must shortlist a strict subset of the files
    val survivors = Maintenance.zoneMapSurvivors(spark, dir, "value",
      10.0, 20.0)
    assert(survivors.nonEmpty && survivors.size < 8,
      s"expected pruning, got ${survivors.size}/8 files")
    // skipping read ≡ full-directory read + filter (zone map may only
    // remove provably-empty files)
    val skipped = Maintenance.readSkipping(spark, dir, "value", 10.0, 20.0)
    val full = spark.read.parquet(dir)
      .filter(col("value") >= 10.0 && col("value") <= 20.0)
    assert(skipped.exceptAll(full).isEmpty && full.exceptAll(skipped).isEmpty)
    // an impossible range survives zero files and returns zero rows
    assert(Maintenance.zoneMapSurvivors(spark, dir, "value",
      1e9, 2e9).isEmpty)
    assert(Maintenance.readSkipping(spark, dir, "value", 1e9, 2e9)
      .count() == 0)
  }

  test("bloom index prunes point lookups and never false-negatives") {
    val dir = Files.createTempDirectory("graft_bfi").toFile.getPath
    Maintenance.writeClustered(tables.events
      .select("event_id", "ts", "user_id", "event_type", "value"),
      dir, Seq("ts"), numFiles = 8)
    Maintenance.writeBloomIndex(spark, dir, "event_id",
      mBits = 65536, k = 4)
    // several probes (taken from the data, so they exist at any SF):
    // pruned result ≡ full filter, and the file shortlist sits
    // strictly below the file count (a unique key lives in one file)
    val probeIds = tables.events.select("event_id").orderBy("event_id")
      .limit(600).collect().map(_.getLong(0)).grouped(250)
      .map(_.head.toString).toSeq
    for (id <- probeIds) {
      val survivors = Maintenance.bloomSurvivors(spark, dir, id,
        mBits = 65536, k = 4)
      assert(survivors.nonEmpty && survivors.size < 8,
        s"expected pruning for event_id=$id, got ${survivors.size}/8")
      val pruned = Maintenance.readBloomPruned(spark, dir, "event_id",
        id, mBits = 65536, k = 4)
      val full = spark.read.parquet(dir)
        .filter(col("event_id") === id.toLong)
      assert(pruned.exceptAll(full).isEmpty &&
        full.exceptAll(pruned).isEmpty)
      assert(pruned.count() == 1L, "event ids are unique")
    }
    // an absent key may survive a few files (false positives) but the
    // residual filter returns zero rows
    assert(Maintenance.readBloomPruned(spark, dir, "event_id",
      "-999", mBits = 65536, k = 4).count() == 0L)
  }

  test("partitioned write enables partition pruning") {
    val dir = Files.createTempDirectory("graft_part").toFile.getPath
    Maintenance.writePartitioned(tables.events, dir, "event_type")
    val read = Maintenance.read(spark, dir)
      .filter(col("event_type") === "click")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("event_type"))
    assert(read.count() > 0)
    // directory layout is hive-style
    assert(new java.io.File(dir).listFiles()
      .exists(_.getName.startsWith("event_type=")))
  }

  test("bucketed tables join without a shuffle exchange") {
    // a stale warehouse dir from a previous JVM makes saveAsTable fail
    // with LOCATION_ALREADY_EXISTS under a fresh in-memory catalog
    for (t <- Seq("li_bucketed", "ord_bucketed")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      graft.operators.VersionedTable.destroy(s"spark-warehouse/$t")
    }
    Maintenance.writeBucketed(tables.lineitem
      .select("l_orderkey", "l_quantity"), "li_bucketed", "l_orderkey", 4)
    Maintenance.writeBucketed(tables.orders
      .select("o_orderkey", "o_orderpriority")
      .withColumnRenamed("o_orderkey", "l_orderkey"), "ord_bucketed",
      "l_orderkey", 4)
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == tables.lineitem.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
  }

  test("bucketed aggregation runs without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS li_bkt_aggspec")
    graft.operators.VersionedTable.destroy("spark-warehouse/li_bkt_aggspec")
    Maintenance.writeBucketed(tables.lineitem
      .select("l_orderkey", "l_quantity"), "li_bkt_aggspec",
      "l_orderkey", 4)
    val agg = spark.table("li_bkt_aggspec").groupBy("l_orderkey")
      .agg(count(lit(1)).as("n"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed aggregation still shuffles:\n$plan")
    assert(agg.agg(sum("n")).head.getLong(0) == tables.lineitem.count())
  }

  test("multimodal decode preserves ids, kinds and emits fixed-width features") {
    implicit val sp = spark
    val media = Multimodal.asMedia(tables.documents)
    val feats = Multimodal.decodeFeatures(media)
    assert(feats.count() == 500)
    val r = feats.collect()
    assert(r.forall(_.feature.length == 8))
    assert(r.forall(f => f.byte_len > 0))
    assert(r.map(_.kind).toSet == Set("image", "audio", "video"))
    // deterministic: decoding twice gives identical features
    val again = Multimodal.decodeFeatures(media).collect()
      .map(f => f.media_id -> f.feature.toSeq).toMap
    assert(r.forall(f => again(f.media_id) == f.feature.toSeq))
    // frame sampling only for video, stride respected
    val frames = Multimodal.sampleFrames(feats, everyK = 500)
    assert(frames.filter(col("frame_idx") % 500 =!= 0).count() == 0)
  }

  test("PNG payloads decode for REAL: exact dimensions and pixel values") {
    implicit val sp = spark
    // byte-level round trip, no Spark: encode → ImageIO decode
    val bytes = Multimodal.pngBytes(33, 17, 250, 7, 128)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assert(img.getWidth == 33 && img.getHeight == 17)
    val px = img.getRGB(16, 8)
    assert(((px >> 16) & 0xff, (px >> 8) & 0xff, px & 0xff) == ((250, 7, 128)))
    // distributed path: decoded dims/pixels match the id-derived truth
    val metas = Multimodal.decodeImages(
      Multimodal.asImages(tables.documents)).collect()
    assert(metas.length == 500)
    assert(metas.forall(m => m.width == Multimodal.imgWidth(m.media_id) &&
      m.height == Multimodal.imgHeight(m.media_id) &&
      m.red == Multimodal.imgRed(m.media_id) &&
      m.green == Multimodal.imgGreen(m.media_id) &&
      m.blue == Multimodal.imgBlue(m.media_id) &&
      m.byte_len > 0))
    // decodeFeatures dispatches image payloads through the real codec:
    // real PNGs report true dims, text payloads fall back to the stub
    val realFeats = Multimodal.decodeFeatures(
      Multimodal.asImages(tables.documents)).collect()
    assert(realFeats.forall(f => f.width == Multimodal.imgWidth(f.media_id) &&
      f.n_frames == 1))
  }

  test("resize box-filters real decoded pixels: corners pure, boundary mixed") {
    implicit val sp = spark
    // byte-level: 10-wide two-band image → thumb 5 wide; xmid block
    // (cols 4,5) straddles the half=5 boundary → channel mean of A,B
    val bytes = Multimodal.pngBytesPattern(10, 8, (100, 40, 200), (30, 90, 7))
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assert(img.getWidth == 10)
    val left = img.getRGB(4, 0)
    val right = img.getRGB(5, 0)
    assert(((left >> 16) & 0xff) == 100 && ((right >> 16) & 0xff) == 30)
    // distributed resample: every probe matches the id-derived truth
    val thumbs = Multimodal.resizeImages(
      Multimodal.asPatternImages(tables.documents)).collect()
    assert(thumbs.length == 500)
    thumbs.foreach { t =>
      val id = t.media_id
      val w = Multimodal.imgWidth(id)
      assert(t.thumb_w == w / 2 && t.thumb_h == Multimodal.imgHeight(id) / 2)
      // top-left block is pure color A, top-right pure color B
      assert((t.tl_red, t.tl_green, t.tl_blue) ==
        ((Multimodal.imgRed(id), Multimodal.imgGreen(id),
          Multimodal.imgBlue(id))))
      assert((t.tr_red, t.tr_green, t.tr_blue) ==
        ((Multimodal.imgRed2(id), Multimodal.imgGreen2(id),
          Multimodal.imgBlue2(id))))
      // the mid block averages exactly per the band membership of its
      // two source columns (truncating integer mean)
      val half = w / 2
      val c0 = 2 * ((w / 2) / 2)
      def mix(a: Int, b: Int) =
        ((if (c0 < half) a else b) * 2 + (if (c0 + 1 < half) a else b) * 2) / 4
      assert(t.mid_red == mix(Multimodal.imgRed(id), Multimodal.imgRed2(id)))
      assert(t.mid_green ==
        mix(Multimodal.imgGreen(id), Multimodal.imgGreen2(id)))
      assert(t.mid_blue ==
        mix(Multimodal.imgBlue(id), Multimodal.imgBlue2(id)))
    }
  }

  test("text corpus round-trips through the raw line format; tabs rejected") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_txt").toFile.getPath + "/c"
    val docs = tables.documents.limit(100).select("doc_id", "text")
    Ingest.writeTextCorpus(docs, dir)
    val back = Ingest.textCorpus(spark, dir)
    assert(back.count() == 100)
    assert(docs.exceptAll(back).count() == 0 &&
      back.exceptAll(docs).count() == 0)
    // a tab or newline in the text would corrupt the line format —
    // the inline raise_error guard must fail the write job
    val tabbed = Seq((1L, "has\ttab")).toDF("doc_id", "text")
    val e1 = intercept[Exception] {
      Ingest.writeTextCorpus(tabbed, dir + "_bad")
    }
    assert(e1.getMessage.contains("not line-safe") ||
      Option(e1.getCause).exists(_.getMessage.contains("not line-safe")))
    val lined = Seq((2L, "has\nnewline")).toDF("doc_id", "text")
    intercept[Exception] {
      Ingest.writeTextCorpus(lined, dir + "_bad2")
    }
  }

  test("image staging is idempotent on a valid drop and re-stages on any mismatch") {
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    val dir = Files.createTempDirectory("graft_png_idem").toFile.getPath
    val docs = tables.documents.limit(20)
    Multimodal.stageImageFiles(docs, dir)
    val f = java.nio.file.Paths.get(dir, "media_0.png")
    val t0 = java.nio.file.Files.getLastModifiedTime(f)
    // valid drop → second call must not rewrite
    Multimodal.stageImageFiles(docs, dir)
    assert(java.nio.file.Files.getLastModifiedTime(f) == t0,
      "idempotent staging rewrote a valid drop")
    // foreign file breaks validity → full clear + re-stage
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "stale.txt"), "x".getBytes)
    Multimodal.stageImageFiles(docs, dir)
    assert(!new java.io.File(dir, "stale.txt").exists,
      "mismatched drop was not cleared")
    // shrunk corpus → old ids must disappear, not linger as phantoms
    Multimodal.stageImageFiles(docs.filter(col("doc_id") < 10), dir)
    assert(Option(new java.io.File(dir).list()).get
      .count(_.matches("media_\\d+\\.png")) == 10)
  }

  test("binaryFile ingestion parses ids off paths and feeds the real decoder") {
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    val dir = Files.createTempDirectory("graft_png").toFile.getPath
    val docs = tables.documents.limit(30)
    Multimodal.stageImageFiles(docs, dir)
    // a non-matching file must be excluded by the glob
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "ignore.txt"), "junk".getBytes)
    val media = Multimodal.ingestImages(dir).collect()
    assert(media.length == 30)
    assert(media.forall(_.kind == "image"))
    // payloads are the REAL staged bytes: they decode to the expected
    // per-id geometry through the shared ImageIO path
    val metas = Multimodal.decodeImages(Multimodal.ingestImages(dir))
      .collect()
    metas.foreach { m =>
      assert(m.width == Multimodal.imgWidth(m.media_id))
      assert(m.height == Multimodal.imgHeight(m.media_id))
      assert(m.red == Multimodal.imgRed(m.media_id))
    }
  }

  test("frame sampling parses the container and slices real frame bytes") {
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    val docs = tables.documents.limit(50)
    val out = Multimodal.sampleVideoFrames(Multimodal.asVideos(docs), stride = 2)
      .collect()
    val byId = out.groupBy(_.media_id)
    assert(byId.size == 50)
    byId.foreach { case (id, frames) =>
      val nf = Multimodal.vidFrames(id)
      // stride-2 sampling: frames 0, 2, 4, ...
      assert(frames.map(_.frame_idx).sorted.toSeq ==
        (0 until nf by 2).toSeq)
      frames.foreach { fr =>
        assert(fr.n_frames == nf)
        assert(fr.ts_ms == fr.frame_idx * 40L)
        // stats recompute from the byte formula — proves the parser
        // sliced the right payload region
        val fl = Multimodal.vidW(id) * Multimodal.vidH(id)
        assert(fr.first_byte == ((id * 31 + fr.frame_idx * 7) % 256).toInt)
        val expectedSum = (0 until fl)
          .map(i => (id * 31 + fr.frame_idx * 7 + i) % 256).sum
        assert(fr.sum_bytes == expectedSum)
      }
    }
    // stride 1 samples every frame
    val all = Multimodal.sampleVideoFrames(Multimodal.asVideos(docs), stride = 1)
      .collect().groupBy(_.media_id)
    all.foreach { case (id, frames) =>
      assert(frames.length == Multimodal.vidFrames(id))
    }
  }

  test("aHash: solid images are all-zero bits; a bright half sets its columns") {
    implicit val sp = spark
    import spark.implicits._
    // uniform luminance: no cell can strictly exceed the mean → 0x00×8
    val solid = Seq(MediaRow(1L, "image",
      Multimodal.pngBytes(16, 16, 10, 10, 10), "s")).toDS()
    assert(Multimodal.imageAHash(solid).collect().head.ahash == "00" * 8)
    // dark left half, bright right half: every row byte = 0xf0
    // (bits cx 4..7), from REAL decoded pixels
    val pat = Seq(MediaRow(2L, "image",
      Multimodal.pngBytesPattern(16, 16, (0, 0, 0), (255, 255, 255)),
      "s")).toDS()
    assert(Multimodal.imageAHash(pat).collect().head.ahash == "f0" * 8)
  }

  test("imagePhashDedup: generative period-256 twins share a hash and " +
    "collapse to the min id") {
    implicit val sp = spark
    // all geometry/color functions have period 256 in doc_id, so doc
    // 0 and doc 256 encode pixel-identical PNGs
    val out = Multimodal.imagePhashDedup(tables.documents)
      .collect().map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(out(0L).getAs[String]("ahash") == out(256L).getAs[String]("ahash"))
    assert(out(256L).getAs[Long]("canonical_id") == 0L)
    assert(out(0L).getAs[Boolean]("is_canonical") &&
      !out(256L).getAs[Boolean]("is_canonical"))
  }

  test("audioFeatures: window aggregates match the sample formula") {
    implicit val sp = spark
    import spark.implicits._
    val id = 7L
    val media = Seq(MediaRow(id, "audio", Multimodal.audioBytes(id), "s"))
      .toDS()
    val n = Multimodal.audSamples(id) // 107
    val rows = Multimodal.audioFeatures(media).collect()
      .map(w => w.window_idx -> w).toMap
    assert(rows.size == (n + 49) / 50)
    def amp(i: Int): Long = (id * 37 + i * 11) % 256
    val w0 = (0 until 50).map(amp)
    assert(rows(0).n_samples == 50L && rows(0).sum_amp == w0.sum &&
      rows(0).min_amp == w0.min && rows(0).max_amp == w0.max)
    val last = rows.keys.max
    assert(rows(last).n_samples == (n - last * 50).toLong)
  }

  test("compactionPlan: contiguous bins by exclusive prefix sum") {
    import spark.implicits._
    val D = 86400000000L
    // day 0: 3 rows, day 1: 2, day 2: 2; target 4 →
    // cum-excl 0/3/5 → bins 0/0/1
    val ev = (Seq.fill(3)(10L) ++ Seq.fill(2)(D + 5L) ++
      Seq.fill(2)(2 * D + 1L)).zipWithIndex
      .map { case (ts, i) => (i.toLong, ts) }.toDF("event_id", "ts")
    val out = Maintenance.compactionPlan(ev, targetRows = 4L)
      .collect().map(r => r.getAs[Long]("day_us") -> r).toMap
    assert(out(0L).getAs[Long]("bin_id") == 0L &&
      out(D).getAs[Long]("bin_id") == 0L &&
      out(2 * D).getAs[Long]("bin_id") == 1L)
    assert(out(0L).getAs[Long]("bin_rows") == 5L &&
      out(0L).getAs[Long]("bin_parts") == 2L)
    assert(out(2 * D).getAs[Long]("bin_rows") == 2L &&
      out(2 * D).getAs[Long]("bin_parts") == 1L)
  }
}
