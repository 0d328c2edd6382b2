package graft.functions

import graft.{GraftFunctions, SparkSpec}
import graft.operators.Dedup
import org.apache.spark.sql.functions._

class NativeExpressionsSpec extends SparkSpec {

  test("graft_dot matches the explicit double fold bit-for-bit") {
    GraftFunctions.ensureRegistered(spark)
    val both = tables.embeddings.limit(50).select(
      VectorFunctions.dot(col("embedding"), col("embedding")).as("native"),
      aggregate(zip_with(VectorFunctions.toDoubleArray(col("embedding")),
        VectorFunctions.toDoubleArray(col("embedding")), _ * _),
        lit(0.0), _ + _).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("native kernels are registered as SQL functions") {
    GraftFunctions.ensureRegistered(spark)
    tables.embeddings.createOrReplaceTempView("emb_v")
    val viaSql = spark.sql(
      "select graft_dot(embedding, embedding) as d from emb_v limit 5")
      .collect()
    assert(viaSql.forall(r => math.abs(r.getDouble(0) - 1.0) < 1e-4))
    val sig = spark.sql(
      "select graft_minhash(array('a b c', 'b c d')) as s").head.getSeq[Long](0)
    assert(sig.length == 64)
    val sh = spark.sql(
      "select graft_simhash(array('x', 'y')) as s").head.getSeq[Int](0)
    assert(sh.length == 4 && sh.forall(v => v >= 0 && v <= 0x7fff))
    val hp = spark.sql(
      "select graft_hyperplanes(cast(array(0.5, -0.25) as array<float>), 2, 6, 16) as s")
      .head.getSeq[Int](0)
    assert(hp.length == 16 && hp.forall(v => v >= 0 && v < 64))
    val bands = spark.sql(
      "select graft_lsh_bands(graft_minhash(array('a b c', 'b c d')), 16, 4) as b")
      .head.getSeq[Long](0)
    assert(bands.length == 16 &&
      bands.forall(v => v >= 0L && v < 2147483648L))
    val proj = spark.sql(
      "select graft_project(cast(array(0.5, -0.25) as array<float>), 2, 8) as p")
      .head.getSeq[Double](0)
    assert(proj.length == 8)
    // a short signature must fail loudly, not read silent garbage
    val e = intercept[Exception] {
      spark.sql("select graft_lsh_bands(array(1L, 2L), 16, 4)").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("need bands*rowsPerBand")))
  }

  test("graft_dot matches zip_with NULL semantics on mismatch/null elements") {
    GraftFunctions.ensureRegistered(spark)
    // length mismatch and null elements both yield NULL, exactly like
    // the HOF fold the optimizer rewrite replaces
    val rows = spark.sql("""
      select
        graft_dot(cast(array(1.0, 2.0) as array<float>),
                  cast(array(1.0) as array<float>)) as mismatch,
        graft_dot(cast(array(1.0, null) as array<float>),
                  cast(array(1.0, 2.0) as array<float>)) as null_elem,
        graft_dot(cast(array(1.0, 2.0) as array<float>),
                  cast(array(3.0, 4.0) as array<float>)) as ok""").head
    assert(rows.isNullAt(0), "length mismatch must be NULL")
    assert(rows.isNullAt(1), "null element must be NULL")
    assert(rows.getDouble(2) == 11.0)
    // parity with the HOF formulation on the same inputs
    val hof = spark.sql("""
      select aggregate(zip_with(
        transform(cast(array(1.0, 2.0) as array<float>), x -> cast(x as double)),
        transform(cast(array(1.0) as array<float>), x -> cast(x as double)),
        (x, y) -> x * y), cast(0.0 as double), (x, y) -> x + y) as d""").head
    assert(hof.isNullAt(0), "HOF fold on mismatched lengths is NULL")
  }

  test("NativeDotRewrite swaps HOF dot folds for the native kernel") {
    import graft.functions.expressions.NativeDotRewrite
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ NativeDotRewrite
    try {
      val hof = tables.embeddings.limit(20).select(
        aggregate(zip_with(VectorFunctions.toDoubleArray(col("embedding")),
          VectorFunctions.toDoubleArray(col("embedding")), _ * _),
          lit(0.0), _ + _).as("d"))
      assert(hof.queryExecution.optimizedPlan.toString.contains("graft_dot"),
        s"rewrite missed:\n${hof.queryExecution.optimizedPlan}")
      // identical values to the direct native call
      val native = tables.embeddings.limit(20).select(
        VectorFunctions.dot(col("embedding"), col("embedding")).as("d"))
      assert(hof.collect().map(_.getDouble(0)).toSeq ==
        native.collect().map(_.getDouble(0)).toSeq)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ == NativeDotRewrite)
    }
  }

  test("GraftExtensions injects all kernel functions") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions().apply(ext)
    // building a session with these extensions would re-register; here
    // we assert the spec list covers the SQL surface
    assert(GraftFunctions.specs.map(_._1).toSet ==
      Set("graft_dot", "graft_minhash", "graft_simhash",
        "graft_lsh_bands", "graft_project",
        "graft_hyperplanes", "graft_sha60"))
  }

  test("table functions expose history and version snapshots in SQL") {
    import graft.operators.VersionedTable
    GraftFunctions.ensureRegistered(spark)
    val path = java.nio.file.Files
      .createTempDirectory("graft_tvf").toString + "/t"
    VersionedTable.write(tables.nation, path)
    VersionedTable.delete(spark, path, "n_regionkey = 0")
    val hist = spark.sql(s"SELECT * FROM graft_history('$path')")
      .orderBy("version").collect()
    assert(hist.map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((0, "WRITE"), (1, "DELETE")))
    assert(hist.map(_.getLong(2)).toSeq == Seq(25L, 20L))
    assert(spark.sql(s"SELECT count(*) FROM graft_version('$path', 0)")
      .head.getLong(0) == 25)
    // snapshots compose with arbitrary SQL (a cross-version join)
    val joined = spark.sql(s"""
      SELECT count(*) FROM graft_version('$path', 1) v
        JOIN graft_version('$path', 0) o ON v.n_nationkey = o.n_nationkey""")
      .head.getLong(0)
    assert(joined == 20)
    // the CDF feed in SQL: the DELETE surfaces as 5 delete rows
    val feed = spark.sql(
      s"SELECT _change_type, count(*) n FROM graft_changes('$path', 0, 1)" +
        " GROUP BY 1").collect()
    assert(feed.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("delete", 5L)))
  }

  test("graft_lookup: the indexed point lookup in SQL") {
    import graft.operators.VersionedTable
    GraftFunctions.ensureRegistered(spark)
    val path = java.nio.file.Files
      .createTempDirectory("graft_tvl").toString + "/t"
    VersionedTable.write(spark.range(2048)
      .selectExpr("id as k", "id % 97 as v").repartition(8), path)
    VersionedTable.setTableProperties(path,
      Map(VersionedTable.bloomColumnsProp -> "k"))
    VersionedTable.buildBloomIndex(spark, path)
    val got = spark.sql(s"SELECT v FROM graft_lookup('$path', 'k', 777)")
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(777L % 97))
    // composes with SQL around it; works without any index too
    assert(spark.sql(
      s"SELECT count(*) FROM graft_lookup('$path', 'v', 5)")
      .head.getLong(0) == spark.range(2048)
        .filter(org.apache.spark.sql.functions.expr("id % 97 = 5"))
        .count())
  }

  test("graft_sha60 equals the built-in conv(substring(sha2)) formulation") {
    GraftFunctions.ensureRegistered(spark)
    val rows = spark.sql("""
      select graft_sha60(s) as native,
        cast(conv(substring(sha2(s, 256), 1, 15), 16, 10) as bigint) as builtin
      from values ('hello world'), (''), ('ünïcödé tøkens') as t(s)""")
      .collect()
    assert(rows.forall(r => r.getLong(0) == r.getLong(1)))
  }

  test("hyperplane signatures survive codegen and interpreted paths identically") {
    import graft.operators.Similarity
    val sig = Similarity.hyperplaneSignatures(col("embedding"), 64, 6, 16)
    val withCodegen = tables.embeddings.limit(20)
      .select(sig.as("s")).collect().map(_.getSeq[Int](0))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interpreted = tables.embeddings.limit(20)
        .select(sig.as("s")).collect().map(_.getSeq[Int](0))
      assert(withCodegen.zip(interpreted).forall { case (a, b) => a == b })
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    assert(withCodegen.forall(s => s.length == 16 && s.forall(v => v >= 0 && v < 64)))
  }

  test("pq codes survive codegen and interpreted paths identically") {
    import org.apache.spark.sql.graft.GraftBridge
    val books = graft.operators.Similarity.trainPqCodebooks(
      tables.embeddings, cacheKey = Some(sfDir))
    val codes = GraftBridge.column(graft.functions.expressions.PqCodes(
      GraftBridge.expression(col("embedding")), books))
    val withCodegen = tables.embeddings.limit(20)
      .select(codes.as("c")).collect().map(_.getSeq[Int](0))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interpreted = tables.embeddings.limit(20)
        .select(codes.as("c")).collect().map(_.getSeq[Int](0))
      assert(withCodegen.zip(interpreted).forall { case (a, b) => a == b })
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    assert(withCodegen.forall(c =>
      c.length == 8 && c.forall(v => v >= 0 && v < 16)))
  }

  test("minhash signature survives codegen and interpreted paths identically") {
    // force both paths: wholeStage on (default) vs off
    val sh = Dedup.shingles(col("text"), 3)
    val withCodegen = tables.documents.limit(20)
      .select(Dedup.minhashSignature(sh, 64).as("sig")).collect()
      .map(_.getSeq[Long](0))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interpreted = tables.documents.limit(20)
        .select(Dedup.minhashSignature(sh, 64).as("sig")).collect()
        .map(_.getSeq[Long](0))
      assert(withCodegen.zip(interpreted).forall { case (a, b) => a == b })
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("lsh band hashes survive codegen/interpreted and match the HOF fold") {
    import org.apache.spark.sql.graft.GraftBridge
    import graft.operators.Dedup
    val sig = Dedup.minhashSignature(Dedup.shingles(col("text"), 3), 64)
    val bandsCol = GraftBridge.column(
      graft.functions.expressions.LshBandHashes(
        GraftBridge.expression(sig), 16, 4))
    val docs = tables.documents.limit(20)
    val withCodegen = docs.select(bandsCol.as("b")).collect()
      .map(_.getSeq[Long](0))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interpreted = docs.select(bandsCol.as("b")).collect()
        .map(_.getSeq[Long](0))
      assert(withCodegen.zip(interpreted).forall { case (a, b) => a == b })
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    // parity with the HOF formulation the kernel replaced
    val hof = docs.select(transform(sequence(lit(0), lit(15)),
      j => aggregate(
        org.apache.spark.sql.functions.slice(sig, j * 4 + 1, lit(4)),
        lit(0L), (acc, v) =>
          (acc * 2654435761L + v.bitwiseAND(0x7fffffffL)) % 2147483648L))
      .as("b")).collect().map(_.getSeq[Long](0))
    assert(withCodegen.zip(hof).forall { case (a, b) => a == b })
    assert(withCodegen.forall(b =>
      b.length == 16 && b.forall(v => v >= 0L && v < 2147483648L)))
  }

  test("hyperplane projections survive codegen/interpreted; sign bits match LSH") {
    import org.apache.spark.sql.graft.GraftBridge
    val proj = GraftBridge.column(
      graft.functions.expressions.HyperplaneProjections(
        GraftBridge.expression(col("embedding")), 64, 6))
    val emb = tables.embeddings.limit(20)
    val withCodegen = emb.select(proj.as("p")).collect()
      .map(_.getSeq[Double](0))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interpreted = emb.select(proj.as("p")).collect()
        .map(_.getSeq[Double](0))
      assert(withCodegen.zip(interpreted).forall { case (a, b) => a == b })
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    // the projections ARE table 0's pre-sign dots: their signs must
    // reproduce the first 6-bit LSH signature exactly
    val sigs = emb.select(graft.operators.Similarity
      .hyperplaneSignatures(col("embedding"), 64, 6, 1).as("s"))
      .collect().map(_.getSeq[Int](0).head)
    withCodegen.zip(sigs).foreach { case (p, s) =>
      val fromProj = p.foldLeft(0)((acc, v) => acc * 2 + (if (v > 0) 1 else 0))
      assert(fromProj == s)
    }
  }

  test("hilbert curve: bijective, unit-step adjacent (unlike Morton), codegen parity") {
    import graft.functions.expressions.HilbertCurve
    // order-5 grid: every cell visited exactly once, and every
    // consecutive pair of indices is GRID-ADJACENT — the locality
    // property that distinguishes Hilbert from Morton
    val order = 5
    val n = 1 << order
    val cells = (for (x <- 0 until n; y <- 0 until n)
      yield HilbertCurve.xy2d(order, x, y) -> (x, y)).toMap
    assert(cells.size == n * n, "hilbert index must be a bijection")
    assert(cells.keys.min == 0L && cells.keys.max == (n * n - 1).toLong)
    (0L until (n * n - 1).toLong).foreach { d =>
      val (x1, y1) = cells(d)
      val (x2, y2) = cells(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"non-adjacent step at d=$d")
    }
    // Morton on the same grid takes non-adjacent jumps (what Hilbert
    // fixes): d=1 → (1,0), d=2 → (0,1) is already a diagonal
    import org.apache.spark.sql.graft.GraftBridge
    import graft.operators.Maintenance
    val grid = spark.range(0, n.toLong * n).select(
      (col("id") % n).as("x"), expr(s"id div $n").as("y"))
    val mortonCells = grid.select(Maintenance.mortonKey(col("x"),
        col("y")).as("d"), col("x"), col("y"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val mortonJumps = (0L until (n * n - 1).toLong).count { d =>
      val (x1, y1) = mortonCells(d)
      val (x2, y2) = mortonCells(d + 1)
      math.abs(x1 - x2) + math.abs(y1 - y2) > 1
    }
    assert(mortonJumps > 0, "Morton should have non-adjacent steps")
    // the Column kernel matches the static math under codegen AND
    // interpreted eval
    val key = GraftBridge.column(graft.functions.expressions.HilbertKey(
      GraftBridge.expression(col("x")), GraftBridge.expression(col("y"))))
    val big = spark.range(0, 2000).select(
      (col("id") * 37 % 65536).as("x"), (col("id") * 101 % 65536).as("y"))
    val withCodegen = big.select(col("x"), col("y"), key.as("d")).collect()
    withCodegen.foreach { r =>
      assert(r.getLong(2) == HilbertCurve.xy2d(16, r.getLong(0), r.getLong(1)))
    }
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interpreted = big.select(key.as("d")).collect().map(_.getLong(0))
      assert(withCodegen.map(_.getLong(2)).sameElements(interpreted))
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }
}
