package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Single-pass table profiling: per-column row/null/distinct counts
  * and min/max, emitted long-form (one row per column) — the
  * data-quality surface a pipeline consults before trusting a new
  * drop (complements the row-level `Expectations` suite, which
  * validates; profiling DESCRIBES).
  *
  * Scale posture: ONE scan. All per-column aggregates live in a
  * single `agg` — Catalyst plans the multiple exact count-distincts
  * as one Expand (factor = #profiled columns) feeding a partial
  * aggregate, so the corpus is read once and the shuffle carries
  * only aggregation state, never rows. The wide one-row result is
  * exploded to long form map-side. At 100 TB the same plan holds;
  * if exact distincts are not worth the Expand factor there,
  * [[tableProfileApprox]] swaps them for HLL sketches (one scan, no
  * Expand) at approx_count_distinct's default 5% relative standard
  * deviation.
  */
object Profile {

  private def isNumeric(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _ => false
  }

  /** Exact profile — oracle-checkable (`table_profile`). */
  def tableProfile(df: DataFrame): DataFrame = profile(df, exact = true)

  /** HLL-distinct profile for scans where the Expand factor is not
    * worth it (rows-only; counts within approx_count_distinct's
    * standard error). */
  def tableProfileApprox(df: DataFrame): DataFrame =
    profile(df, exact = false)

  private def profile(df: DataFrame, exact: Boolean): DataFrame = {
    val fields = df.schema.fields
    val aggs: Seq[Column] = fields.toSeq.flatMap { f =>
      val c = col(f.name)
      val num = isNumeric(f.dataType)
      Seq(
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"${f.name}__nulls"),
        (if (exact) countDistinct(c) else approx_count_distinct(c))
          .as(s"${f.name}__distinct"),
        (if (num) min(c).cast("double") else min(lit(null).cast("double")))
          .as(s"${f.name}__min_num"),
        (if (num) max(c).cast("double") else max(lit(null).cast("double")))
          .as(s"${f.name}__max_num"),
        (if (num) min(lit(null).cast("string")) else min(c).cast("string"))
          .as(s"${f.name}__min_str"),
        (if (num) max(lit(null).cast("string")) else max(c).cast("string"))
          .as(s"${f.name}__max_str"))
    } :+ count(lit(1)).as("__n_rows")
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(fields.toSeq.map(f => struct(
        lit(f.name).as("col_name"),
        col("__n_rows").as("n_rows"),
        col(s"${f.name}__nulls").as("n_nulls"),
        col(s"${f.name}__distinct").as("n_distinct"),
        col(s"${f.name}__min_num").as("min_num"),
        col(s"${f.name}__max_num").as("max_num"),
        col(s"${f.name}__min_str").as("min_str"),
        col(s"${f.name}__max_str").as("max_str"))): _*)).as("p"))
      .select("p.*")
  }

  /** The MERGEABLE profile slice — every statistic an associative
    * fold (row/null counts sum, min/max re-min/max), so shard
    * profiles combine into the exact whole-table profile however the
    * table was split. This is what a STREAMING profile can maintain
    * exactly; `n_distinct` is deliberately absent (not mergeable
    * without carrying sets — [[tableProfileApprox]]'s HLL is the
    * sketch answer when an estimate suffices). One scan, one
    * single-row agg, long form. */
  def mergeableProfile(df: DataFrame): DataFrame = {
    val fields = df.schema.fields
    val aggs: Seq[Column] = fields.toSeq.flatMap { f =>
      val c = col(f.name)
      val num = isNumeric(f.dataType)
      Seq(
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"${f.name}__nulls"),
        (if (num) min(c).cast("double") else min(lit(null).cast("double")))
          .as(s"${f.name}__min_num"),
        (if (num) max(c).cast("double") else max(lit(null).cast("double")))
          .as(s"${f.name}__max_num"),
        (if (num) min(lit(null).cast("string")) else min(c).cast("string"))
          .as(s"${f.name}__min_str"),
        (if (num) max(lit(null).cast("string")) else max(c).cast("string"))
          .as(s"${f.name}__max_str"))
    } :+ count(lit(1)).as("__n_rows")
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(fields.toSeq.map(f => struct(
        lit(f.name).as("col_name"),
        col("__n_rows").as("n_rows"),
        col(s"${f.name}__nulls").as("n_nulls"),
        col(s"${f.name}__min_num").as("min_num"),
        col(s"${f.name}__max_num").as("max_num"),
        col(s"${f.name}__min_str").as("min_str"),
        col(s"${f.name}__max_str").as("max_str"))): _*)).as("p"))
      .select("p.*")
  }

  /** Fold accumulated per-shard mergeable profiles back into one
    * table profile: the associative merge — shuffles only
    * (#shards × #columns) stat rows, never data. */
  def mergeProfiles(shards: DataFrame): DataFrame =
    shards.groupBy(col("col_name")).agg(
      sum(col("n_rows")).as("n_rows"),
      sum(col("n_nulls")).as("n_nulls"),
      min(col("min_num")).as("min_num"),
      max(col("max_num")).as("max_num"),
      min(col("min_str")).as("min_str"),
      max(col("max_str")).as("max_str"))

  /** k-anonymity audit: group sizes over the quasi-identifier
    * columns, flagging groups smaller than `k` — rows in those groups
    * are re-identifiable by the quasi-identifier combination alone
    * (the governance gate run before releasing a dataset; pii_scrub
    * removes direct identifiers, this catches indirect ones).
    * One map-side-combined groupBy on the quasi-identifier key. */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String],
                 k: Long = 5L): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("group_size"))
      .withColumn("at_risk", col("group_size") < k)
  }

  /** l-diversity audit — [[kAnonymity]]'s follow-on gate: a group can
    * be large (k-anonymous) yet still leak if everyone in it shares
    * one sensitive value (a homogeneity attack reads the attribute
    * off the group without re-identifying anyone). Reports, per
    * quasi-identifier group, its size, the count of DISTINCT
    * sensitive values, and the under-`l` flag.
    *
    * Scale shape: one groupBy over (quasi × sensitive) with map-side
    * combine collapses the table to distinct value combinations, then
    * a second tiny groupBy folds those to the group frame — the
    * sensitive column never shuffles raw rows twice.
    *
    * NULL is counted as a sensitive value of its own (privacy-
    * conservative: "value withheld" is itself observable), unlike
    * SQL's `count(DISTINCT …)` which skips NULLs — on a nullable
    * sensitive column the two can differ by one. */
  def lDiversity(df: DataFrame, quasiCols: Seq[String],
                 sensitiveCol: String, l: Long = 2L): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    df.groupBy((quasiCols :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("c"))
      .groupBy(quasiCols.map(col): _*)
      .agg(sum(col("c")).as("group_size"),
        count(lit(1)).as("n_sensitive_values"))
      .withColumn("at_risk", col("n_sensitive_values") < l)
  }

  /** t-closeness audit — the distributional gate after [[kAnonymity]]
    * and [[lDiversity]]: a group can be large AND diverse yet still
    * leak if its sensitive-value DISTRIBUTION skews far from the
    * table's (a skewness attack reads "this group is mostly v" even
    * when several values appear). Reports, per quasi-identifier
    * group, the total-variation distance between the group's and the
    * global sensitive distribution, flagging groups above `t`.
    *
    * Exact-arithmetic design (oracle-portable): with c_gv = count in
    * (group, value), n_g = group size, c_v = global value count,
    * n = table size,
    *   tvd_g = ½·( Σ_{v∈G} |c_gv/n_g − c_v/n|  +  Σ_{v∉G} c_v/n )
    * and the absent-value tail is 1 − Σ_{v∈G} c_v/n, so the whole
    * distance needs ONLY the group's own (group, value) rows — never
    * a groups × values expansion. Numerators are integer
    * (|c_gv·n − c_v·n_g| summed in decimal(38,0), overflow-safe to
    * ~1e18-row tables); doubles appear only in the final fixed op
    * chain, so the result is bit-reproducible across engines.
    *
    * Scale shape: one groupBy collapses the table to (group, value)
    * combinations; the global value frame (sensitive cardinality —
    * bounded for any attribute worth auditing) broadcasts onto it;
    * a window sum and the final fold share one shuffle on the
    * quasi-identifier key. Raw rows shuffle exactly once. */
  def tCloseness(df: DataFrame, quasiCols: Seq[String],
                 sensitiveCol: String, t: Double = 0.3): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    val quasi = quasiCols.map(col)
    val gv = df.groupBy((quasiCols :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("c_gv"))
    // global value counts and the table total both FOLD OUT of the
    // combo frame — no second scan of df (the gv exchange is shared
    // via ReuseExchange), and no collect_list single-row bottleneck:
    // the value frame stays a distributed |values|-row frame that is
    // broadcast only at the join
    val vCounts = gv.groupBy(col(sensitiveCol))
      .agg(sum(col("c_gv")).as("c_v"))
    val tot = vCounts.agg(sum(col("c_v")).as("n"))
    val byGroup = org.apache.spark.sql.expressions.Window
      .partitionBy(quasi: _*)
    val dec = (c: Column) => c.cast("decimal(38,0)")
    // null-safe value match: NULL is its own observable sensitive
    // value (the lDiversity convention) and must carry its global
    // count like any other
    gv.join(broadcast(vCounts.withColumnRenamed(sensitiveCol, "__v")),
        col(sensitiveCol) <=> col("__v"))
      .drop("__v")
      .crossJoin(broadcast(tot))
      .withColumn("n_g", sum(col("c_gv")).over(byGroup))
      .groupBy(quasi: _*)
      .agg(first(col("n_g")).as("group_size"),
        sum(abs(dec(col("c_gv")) * dec(col("n")) -
          dec(col("c_v")) * dec(col("n_g")))).as("s_num"),
        sum(col("c_v")).as("s_cov"),
        first(col("n")).as("n"))
      .withColumn("tvd",
        lit(0.5) * (col("s_num").cast("double") /
          (col("group_size").cast("double") * col("n").cast("double")) +
          (lit(1.0) - col("s_cov").cast("double") / col("n").cast("double"))))
      .withColumn("at_risk", col("tvd") > t)
      .select((quasi :+ col("group_size") :+ col("tvd") :+
        col("at_risk")): _*)
  }

  /** Snapshot drift report: the profiles of two table versions (the
    * committed drop vs the incoming one) full-joined per column —
    * added/removed columns, null-fraction drift, and numeric-range
    * widening. This is the schema+stats gate a pipeline runs BEFORE
    * merging a new drop: expectations validate rows, the profile diff
    * catches distribution shifts no row-level rule expresses.
    *
    * Scale: each side is one [[tableProfile]] scan collapsing to
    * |columns| rows; the diff join is over those tiny frames. */
  /** Chi-square independence audit between two categorical columns —
    * the contingency-table complement of the KS drift gate (KS reads
    * a numeric distribution; this reads whether two discrete
    * attributes are associated, e.g. "is language mix independent of
    * source?"). Per cell (a, b): observed count, both marginals, and
    * the exact deviation algebra (O − E)²/E rewritten integer-only as
    * (n·O − r·c)² / (n·r·c) — `dev_num`/`dev_den` ship as exact
    * decimal(38,0), the per-cell χ² is ONE fixed IEEE chain (two
    * decimal→double casts, one multiply, one divide) so both engines
    * emit the identical double, and `dependent_99` compares it to the
    * 1-dof 99% critical value. UNOBSERVED cells are included via the
    * category cross join — a naive groupBy misses exactly the empty
    * cells that scream dependence.
    *
    * Scale: one pass groupBy(a, b) collapses row-space to
    * category-space; marginals, the total and the cross join all live
    * on that tiny frame (broadcast). Exactness envelope: n·r·c and
    * (n·O − r·c)² must fit decimal(38,0) — holds through n ≈ 10¹²
    * rows for the denominator and n·O ≈ 10¹⁹ for the deviation,
    * far beyond any single audit slice. */
  def chi2Independence(df: DataFrame, aCol: String,
                       bCol: String): DataFrame = {
    val cells = df.groupBy(col(aCol), col(bCol))
      .agg(count(lit(1)).as("observed"))
    val aTot = cells.groupBy(col(aCol))
      .agg(sum("observed").as("row_total"))
    val bTot = cells.groupBy(col(bCol))
      .agg(sum("observed").as("col_total"))
    val totals = cells.agg(sum("observed").as("n_total"))
    val full = aTot.crossJoin(broadcast(bTot))
      .crossJoin(broadcast(totals))
      .join(cells, Seq(aCol, bCol), "left")
      .withColumn("observed", coalesce(col("observed"), lit(0L)))
    val devNum = (col("n_total").cast("decimal(19,0)") *
        col("observed").cast("decimal(12,0)") -
      col("row_total").cast("decimal(19,0)") *
        col("col_total").cast("decimal(12,0)")).cast("decimal(38,0)")
    val devDen = ((col("n_total").cast("decimal(19,0)") *
        col("row_total").cast("decimal(12,0)")).cast("decimal(26,0)") *
      col("col_total").cast("decimal(12,0)")).cast("decimal(38,0)")
    val chi = (col("dev_num").cast("double") *
      col("dev_num").cast("double")) / col("dev_den").cast("double")
    full.select(col(aCol), col(bCol), col("observed"),
        col("row_total"), col("col_total"), col("n_total"),
        devNum.as("dev_num"), devDen.as("dev_den"))
      .withColumn("cell_chi2", chi)
      .withColumn("dependent_99", col("cell_chi2") > lit(6.635))
  }

  def profileDiff(prev: DataFrame, cur: DataFrame): DataFrame = {
    val p = tableProfile(prev).select(col("col_name"),
      col("n_rows").as("rows_prev"), col("n_nulls").as("nulls_prev"),
      col("n_distinct").as("distinct_prev"),
      col("min_num").as("min_prev"), col("max_num").as("max_prev"))
    val c = tableProfile(cur).select(col("col_name"),
      col("n_rows").as("rows_cur"), col("n_nulls").as("nulls_cur"),
      col("n_distinct").as("distinct_cur"),
      col("min_num").as("min_cur"), col("max_num").as("max_cur"))
    p.join(c, Seq("col_name"), "full_outer")
      .withColumn("status",
        when(col("rows_prev").isNull, "added")
          .when(col("rows_cur").isNull, "removed").otherwise("common"))
      .withColumn("null_frac_drift",
        when(col("status") === "common",
          col("nulls_cur").cast("double") / col("rows_cur") -
            col("nulls_prev").cast("double") / col("rows_prev")))
      .withColumn("range_widened",
        when(col("status") === "common",
          coalesce(col("min_cur") < col("min_prev"), lit(false)) ||
            coalesce(col("max_cur") > col("max_prev"), lit(false))))
      .select("col_name", "status", "rows_prev", "rows_cur",
        "nulls_prev", "nulls_cur", "distinct_prev", "distinct_cur",
        "null_frac_drift", "range_widened")
  }

  /** k-anonymity REPAIR — the action the k/l/t audit trio gates on.
    * Global-recoding generalization over the (nation, account-balance)
    * quasi-identifiers on a fixed 5-step ladder: each level coarsens
    * one dimension (balance 100s → 1000s, nation → 5-nation band →
    * suppressed, then full suppression), and the table is re-released
    * at the SMALLEST level whose minimum group size reaches k — one
    * global level, never per-row cell suppression, so the released
    * schema stays uniformly interpretable and the choice is a pure
    * deterministic function of the data.
    *
    * Scale: all five candidate ladders are costed in ONE scan + ONE
    * shuffle — the level keys are projected side by side and counted
    * under GROUPING SETS (Expand ×5 collapses map-side to group
    * counts), then min-size per grouping id is a 5-row driver scalar
    * (the same bounded-scalar budget as the cluster-convergence
    * checks). The release itself is a map-only projection at the
    * chosen level. Generalized values are released as strings
    * (`"12"`, `"10-14"`, `"*"`) built from integer casts only, so
    * the oracle reproduces them byte-for-byte.
    */
  def anonymizeGeneralize(customer: DataFrame, k: Long): DataFrame = {
    val spark = customer.sparkSession
    val qi = customer.select(col("c_custkey"),
      col("c_nationkey").cast("long").as("nat"),
      floor(col("c_acctbal") / 100.0).cast("long").as("b100"),
      floor(col("c_acctbal") / 1000.0).cast("long").as("b1000"),
      (col("c_nationkey").cast("long") / 5).cast("long").as("n5"))
    val view = s"graft_anon_${System.identityHashCode(customer)}"
    qi.createOrReplaceTempView(view)
    // ladder levels → grouping sets, one Expand-scan; gid encodes
    // which columns are live (grouping() bit per column)
    val sizes = spark.sql(s"""
      SELECT gid, min(cnt) as min_size
      FROM (SELECT cast(grouping(nat) * 8 + grouping(b100) * 4
                + grouping(b1000) * 2 + grouping(n5) as int) as gid,
              count(*) as cnt
            FROM $view
            GROUP BY GROUPING SETS ((nat, b100), (nat, b1000),
              (n5, b1000), (n5), ()))
      GROUP BY 1""").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // gid: L0 (nat,b100)=0b0011=3, L1 (nat,b1000)=0b0101=5,
    // L2 (n5,b1000)=0b1100=12, L3 (n5)=0b1110=14, L4 ()=0b1111=15
    val ladder = Seq(3, 5, 12, 14, 15)
    val level = ladder.indexWhere(g => sizes.getOrElse(g, 0L) >= k) match {
      case -1 => 4 // corpus smaller than k: full suppression
      case l => l
    }
    val natCol = level match {
      case 0 | 1 => col("nat").cast("string")
      case 2 | 3 => concat(
        (col("n5") * 5).cast("string"), lit("-"),
        (col("n5") * 5 + 4).cast("string"))
      case _ => lit("*")
    }
    val balCol = level match {
      case 0 => (col("b100") * 100).cast("string")
      case 1 | 2 => (col("b1000") * 1000).cast("string")
      case _ => lit("*")
    }
    qi.select(col("c_custkey"), natCol.as("qi_nation"),
      balCol.as("qi_acctbal"), lit(level).cast("int").as("gen_level"))
  }

  /** Differentially-private count release via randomized response —
    * the MECHANISM the k/l/t audit trio motivates: instead of
    * generalizing until groups are safe, each individual's sensitive
    * bit is reported truthfully only with probability
    * p = 1 − 1/flipDenom (flip otherwise), giving every respondent
    * ε = ln(p/(1−p)) deniability, and the released per-group counts
    * are debiased with the standard unbiased estimator
    * est = (obs − n·q) / (1 − 2q), q = 1/flipDenom.
    *
    * The coin is the engine-portable salted content hash (the
    * corpus_sample idiom): membership of a row in the flip set is a
    * pure function of (salt, id), so the release is byte-for-byte
    * reproducible — a re-run releases the SAME noise, which is
    * exactly what a privacy audit trail needs (fresh randomness per
    * run would let an observer average the noise away).
    *
    * Determinism: flip decisions are integer hash comparisons;
    * counts are integers; the estimator is one fixed double op
    * chain. `flipDenom` must be a power of two so q is an exact
    * double and the SQL literal round-trips.
    *
    * Scale shape: map-only hash + flip, then one map-side-combined
    * groupBy on the release key. Nothing is collected; the noise
    * needs no driver-side RNG state.
    *
    * `n_true` is emitted ONLY so the oracle can verify the mechanism
    * end-to-end; a production release would drop that column (and
    * the per-row `__truth`/`__report` bits never leave the
    * aggregation).
    */
  def dpRelease(df: DataFrame, idCol: String, sensitive: Column,
                groupCols: Seq[String], flipDenom: Int = 4,
                salt: String = "dp"): DataFrame = {
    require(flipDenom >= 4 && (flipDenom & (flipDenom - 1)) == 0,
      "flipDenom must be a power of two >= 4 (q exact in double)")
    require(groupCols.nonEmpty, "need at least one release key column")
    val sha60 = org.apache.spark.sql.graft.GraftBridge.column(
      graft.functions.expressions.Sha60(
        org.apache.spark.sql.graft.GraftBridge.expression(
          concat(lit(s"$salt:"), col(idCol).cast("string")))))
    val q = 1.0 / flipDenom
    val flipped = df
      .withColumn("__truth", sensitive.cast("boolean"))
      .withColumn("__flip", pmod(sha60, lit(flipDenom)) === 0)
      .withColumn("__report", col("__truth") =!= col("__flip"))
    flipped.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col("__truth").cast("long")).as("n_true"),
        sum(col("__report").cast("long")).as("n_reported"))
      .withColumn("n_estimated",
        (col("n_reported").cast("double") -
          col("n").cast("double") * lit(q)) / lit(1.0 - 2 * q))
  }

  /** Reproducible dataset fingerprint — the provenance row a training
    * run pins in its data card: per source, exact doc and token mass,
    * the number of DISTINCT content rows, and an ORDER-INDEPENDENT
    * content checksum (decimal(38,0) sum of each row's
    * sha60(doc_id‖':'‖text)). Sums of per-row hashes are associative
    * and commutative, so any permutation, partitioning, or engine
    * re-derives the identical value — two snapshots are row-identical
    * iff (n_docs, content_sum, n_distinct_rows) all match, and a
    * single changed/duplicated/dropped row moves the checksum.
    * One map-side-combined groupBy over #sources keys; decimal sum
    * can't overflow (n·2⁶⁰ ≪ 10³⁸ for any real corpus). */
  def datasetFingerprint(documents: DataFrame): DataFrame = {
    val h = org.apache.spark.sql.graft.GraftBridge.column(
      graft.functions.expressions.Sha60(
        org.apache.spark.sql.graft.GraftBridge.expression(
          concat(col("doc_id").cast("string"), lit(":"), col("text")))))
    documents.select(col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        h.as("h"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("h").cast("decimal(38,0)")).as("content_sum"),
        countDistinct(col("h")).as("n_distinct_rows"))
  }

  /** The mergeable core of [[datasetFingerprint]]: per-source shard
    * (n_docs, n_tokens, content_sum) — associative long/decimal sums
    * any batch split re-merges to the global fingerprint, which is
    * what lets a STREAM maintain the data-card row per micro-batch.
    * The distinct-rows count is deliberately NOT in the shard
    * (distincts don't merge); the batch operator reports it from its
    * one full scan. */
  def rawFingerprint(documents: DataFrame): DataFrame = {
    val h = org.apache.spark.sql.graft.GraftBridge.column(
      graft.functions.expressions.Sha60(
        org.apache.spark.sql.graft.GraftBridge.expression(
          concat(col("doc_id").cast("string"), lit(":"), col("text")))))
    documents.select(col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        h.as("h"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("h").cast("decimal(38,0)")).as("content_sum"))
  }

  /** Fold fingerprint shards back to one row per source (associative
    * sums), exposed for the streaming monitor. */
  def mergeFingerprint(shards: DataFrame): DataFrame =
    shards.groupBy(col("source"))
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("content_sum")).cast("decimal(38,0)").as("content_sum"))

  /** Mergeable grouped moment statistics over an integer measure
    * (here: whitespace token counts per document, grouped by
    * `groupCol`): the raw power sums (n, Σx, Σx², Σx³) are exact
    * 63-bit integers — associative, commutative, retry-safe — so any
    * shard layout merges to the same global answer, which is the
    * whole trick behind single-pass distributed variance. Mean and
    * variance are derived LAST: variance's numerator n·Σx² − (Σx)²
    * stays an exact bigint and only the final division is a double
    * (one fixed op — bit-identical in any engine), and the skewness
    * direction is reported as the exact integer SIGN of the third
    * central moment's numerator n²Σx³ − 3nΣxΣx² + 2(Σx)³ — no cube
    * roots, no float pipeline.
    *
    * Scale: one map-side combined groupBy over #groups keys. The RAW
    * power sums overflow 63 bits only past ~10¹⁸ token-cubed mass per
    * group, but the DERIVED skew numerator n²·s3 − 3n·s1·s2 + 2·s1³
    * wraps much earlier (n≈10⁶ docs of ~100 tokens → s3≈10¹² →
    * n²·s3≈10²⁴), so [[deriveMoments]] widens every derived numerator
    * through decimal(38,0) before sign/division — safe to ~10³⁸
    * numerator mass, i.e. any corpus whose raw sums still fit a
    * long. */
  def groupedMoments(documents: DataFrame,
                     groupCol: String = "source"): DataFrame =
    deriveMoments(rawMoments(documents, groupCol), groupCol)

  /** The mergeable core of [[groupedMoments]]: exact integer power
    * sums per group — the shard any arrival slice can land and any
    * union of shards can re-sum to the global answer. */
  def rawMoments(documents: DataFrame, groupCol: String): DataFrame = {
    val x = size(split(col("text"), " ")).cast("long")
    documents.select(col(groupCol), x.as("x"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("s1"),
        sum(col("x") * col("x")).as("s2"),
        sum(col("x") * col("x") * col("x")).as("s3"))
  }

  /** Fold power-sum shards back to one row per group (associative
    * long sums), exposed for the streaming monitor. */
  def mergeMoments(shards: DataFrame, groupCol: String): DataFrame =
    shards.groupBy(groupCol).agg(sum("n").as("n"), sum("s1").as("s1"),
      sum("s2").as("s2"), sum("s3").as("s3"))

  /** Derive mean/variance/skew-sign from exact power sums — shared
    * by the batch operator and the streaming merge so both emit the
    * identical final row. The derived numerators (n·s2 − s1² and
    * n²·s3 − 3n·s1·s2 + 2·s1³) are computed in decimal(38,0), NOT
    * long: they wrap 63 bits around ~10⁶ average-length docs per
    * group even when the raw sums are nowhere near overflow. The
    * exact decimal sign (no double round-trip) is the skew
    * direction; var_num ships as decimal(38,0) and only the final
    * variance division is a double. */
  def deriveMoments(sums: DataFrame, groupCol: String): DataFrame = {
    val d = (c: String) => col(c).cast("decimal(38,0)")
    val varNum = d("n") * d("s2") - d("s1") * d("s1")
    val skewNum = d("n") * d("n") * d("s3") -
      lit(3).cast("decimal(38,0)") * d("n") * d("s1") * d("s2") +
      lit(2).cast("decimal(38,0)") * d("s1") * d("s1") * d("s1")
    sums.select(col(groupCol), col("n"), col("s1"), col("s2"), col("s3"),
      (col("s1").cast("double") / col("n").cast("double"))
        .as("mean_tokens"),
      varNum.as("var_num"),
      (varNum.cast("double") /
        (col("n").cast("double") * col("n").cast("double")))
        .as("var_tokens"),
      when(skewNum > 0, 1L).when(skewNum < 0, -1L).otherwise(0L)
        .as("skew_sign"))
  }

  /** Equi-width histogram shard: exact per-(group, bin) counts with
    * bin = floor(value / width). `width` must be a power of two so
    * the division is exact for every double and the binning is
    * bit-identical in any engine. Counts are associative longs — any
    * arrival slice can land a shard and any union of shards re-sums
    * to the one-shot histogram (the mergeable quantile-sketch core:
    * unlike t-digest/KLL, the merge is EXACT, the only approximation
    * is the fixed bin width). */
  def histShard(events: DataFrame, groupCol: String = "event_type",
                valueCol: String = "value",
                width: Double = 4.0): DataFrame = {
    require(width > 0 && java.lang.Math.getExponent(width) >= -500 &&
      width == java.lang.Math.scalb(1.0, java.lang.Math.getExponent(width)),
      "width must be a positive power of two (exact division)")
    events.select(col(groupCol),
        floor(col(valueCol) / lit(width)).cast("long").as("bin"))
      .groupBy(col(groupCol), col("bin"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Fold histogram shards back to one row per (group, bin) —
    * associative long sums, exposed for the streaming monitor. */
  def mergeHist(shards: DataFrame, groupCol: String): DataFrame =
    shards.groupBy(col(groupCol), col("bin")).agg(sum("cnt").as("cnt"))

  /** Quantile readout from a merged histogram: for each q in the
    * ppm ladder, the bin holding the ⌈q·n/10⁶⌉-th order statistic of
    * the group — so the TRUE quantile provably lies in
    * [bin_lo, bin_lo + width) by construction; the histogram answer
    * is exact at bin granularity, no error estimate needed. All
    * selection arithmetic is integer (ceil as (q·n + 999999) div 10⁶,
    * cumulative counts as longs); the only double is bin_lo =
    * bin·width, one exact power-of-two multiply. Runs entirely on the
    * ≤|groups|·|bins|-row histogram frame — the windows are
    * group-partitioned hash exchanges, never a global funnel. */
  def histQuantiles(hist: DataFrame, groupCol: String,
                    qPpm: Seq[Long] = Seq(250000L, 500000L, 750000L,
                      900000L, 990000L),
                    width: Double = 4.0): DataFrame = {
    require(qPpm.nonEmpty && qPpm.forall(q => q > 0 && q <= 1000000L),
      "quantile ladder entries are ppm in (0, 1000000]")
    val wOrd = Window.partitionBy(col(groupCol)).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy(col(groupCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    mergeHist(hist, groupCol)
      .withColumn("cum", sum(col("cnt")).over(wOrd))
      .withColumn("n", sum(col("cnt")).over(wAll))
      .withColumn("q_ppm", explode(array(qPpm.map(lit(_)): _*)))
      .withColumn("k", expr("(q_ppm * n + 999999) div 1000000"))
      .filter(col("cum") >= col("k") &&
        col("cum") - col("cnt") < col("k"))
      .select(col(groupCol), col("q_ppm"), col("n"), col("k"),
        col("bin"),
        (col("bin").cast("double") * lit(width)).as("bin_lo"))
  }

  /** Pairwise Pearson correlation over money-scaled numeric columns —
    * the multi-column dependence profile (feature redundancy, derived
    * columns, plausibility: price SHOULD track quantity) that sits
    * next to [[tableProfile]]'s per-column stats. Values are fixed to
    * cents (`decimal(12,2) · 100 → long` — exact, no float rounding),
    * so all five power sums per pair are ORDER-INDEPENDENT integer
    * sums carried in decimal(38,0); corr is derived from the exact
    * sums in ONE fixed IEEE chain `(n·Σxy − Σx·Σy) / (√(n·Σx²−Σx²̂)·
    * √(n·Σy²−Σy²̂))` with a NULL guard on zero variance — the sums
    * hash-check exactly, the chain bit-replicates.
    *
    * Envelope: per-row cents ≤ 10⁹ keeps the per-row product ≤ 10¹⁸
    * (long-safe); sums are exact in decimal(38,0) to ~10¹⁹ rows; the
    * derived chain is double arithmetic on bit-identical inputs at
    * any scale. Scale shape: ONE scan, one 1-row aggregate carrying
    * 4 + 5·|pairs| sums (map-side combined), the long-form explode is
    * driver-side arithmetic on that single row. */
  def columnCorr(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns to correlate")
    val cents: Map[String, Column] = cols.map(c =>
      c -> (col(c).cast(DecimalType(12, 2)) * lit(100))
        .cast("long")).toMap
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    def d38(c: Column): Column = c.cast(DecimalType(38, 0))
    val sumCols: Seq[Column] =
      count(lit(1)).as("n") +:
      cols.map(c => d38(sum(d38(cents(c)))).as(s"s_$c")) ++:
      cols.map(c => d38(sum(d38(cents(c) * cents(c)))).as(s"ss_$c")) ++:
      pairs.map { case (x, y) =>
        d38(sum(d38(cents(x) * cents(y)))).as(s"sp_${x}__$y") }
    val one = df.agg(sumCols.head, sumCols.tail: _*)
    val legs = pairs.map { case (x, y) =>
      struct(lit(x).as("col_x"), lit(y).as("col_y"),
        col("n").as("n"),
        col(s"s_$x").as("sum_x"), col(s"s_$y").as("sum_y"),
        col(s"ss_$x").as("sum_x2"), col(s"ss_$y").as("sum_y2"),
        col(s"sp_${x}__$y").as("sum_xy"))
    }
    val nd = col("n").cast("double")
    val (sx, sy) = (col("sum_x").cast("double"), col("sum_y").cast("double"))
    val vx = nd * col("sum_x2").cast("double") - sx * sx
    val vy = nd * col("sum_y2").cast("double") - sy * sy
    one.select(explode(array(legs: _*)).as("p")).select(col("p.*"))
      .withColumn("corr",
        when(vx > 0.0 && vy > 0.0,
          (nd * col("sum_xy").cast("double") - sx * sy) /
            (sqrt(vx) * sqrt(vy))))
  }
}
