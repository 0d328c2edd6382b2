package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the latest right row with
  * right.ts <= left.ts within the same key — the temporal-lookup
  * operator Spark lacks natively (DuckDB: `ASOF JOIN`).
  *
  * Implemented by COMPOSITION (no custom physical operator needed):
  * union both sides tagged, sort per key by (ts, side), and carry the
  * last right payload forward with `last(_, ignoreNulls)` over an
  * unbounded-preceding window. ONE shuffle on the key — never a
  * range cross-join, so it scales like any windowed aggregation
  * (AQE handles skewed keys).
  *
  * Ties: a right row at exactly left.ts IS visible (side ordering
  * puts right before left at equal ts), matching ASOF `>=` semantics.
  */
object AsOf {

  /** Left-outer as-of join. `rightCols` are carried (prefixed
    * `matched_`); right side must be unique per (key, ts) — pre-dedup
    * if not. `toleranceUs` bounds the lookback (pandas
    * `merge_asof(tolerance=...)` semantics): a right row older than
    * `left.ts − tolerance` does not match — the row stays, its
    * matched columns go null. The bound is applied AFTER the window
    * (the carried payload embeds the right timestamp), so it adds no
    * shuffle. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               tsCol: String, rightCols: Seq[String],
               toleranceUs: Option[Long] = None): DataFrame = {
    val payload = struct(rightCols.map(col) :+ col(tsCol).as("__rts"): _*)
    val l = left.withColumn("__side", lit(1)).withColumn("__r", lit(null)
      .cast(right.select(rightCols.map(col) :+ col(tsCol).as("__rts"): _*)
        .schema.fields
        .foldLeft(new org.apache.spark.sql.types.StructType())(
          (s, f) => s.add(f))))
    val r = right.select(col(key), col(tsCol), payload.as("__r"))
      .withColumn("__side", lit(0))
    // align schemas: left keeps all its columns; right contributes
    // only key/ts/payload with nulls elsewhere
    val lAligned = l.select(
      (left.columns.toIndexedSeq.map(col) :+ col("__side") :+ col("__r")): _*)
    val rAligned = {
      val nulls = left.columns.filterNot(c => c == key || c == tsCol)
        .map(c => lit(null).cast(left.schema(c).dataType).as(c))
      val base = r.select((Seq(col(key), col(tsCol)) ++ nulls) :+
        col("__side") :+ col("__r"): _*)
      base.select(lAligned.columns.toIndexedSeq.map(col): _*)
    }
    val w = Window.partitionBy(col(key))
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lAligned.unionByName(rAligned)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__side", "__r")
    val bounded = toleranceUs.fold(matched)(tol =>
      matched.withColumn("__match",
        when(col("__match.__rts") >= col(tsCol) - tol, col("__match"))))
    bounded.select((left.columns.toIndexedSeq.map(col) ++
      rightCols.map(c => col(s"__match.$c").as(s"matched_$c"))): _*)
  }

  /** The same backward as-of join through the NATIVE physical
    * operator ([[graft.plans.AsofJoinExec]]): each side shuffles at
    * its own width and one streaming merge per partition replaces the
    * union+window — semantics identical to [[asofJoin]] (same oracle),
    * plan shape different. The strategy self-installs on sessions
    * built without `spark.sql.extensions`. Output matches
    * [[asofJoin]]: left.* ++ matched_<rightCols>. */
  def asofJoinNative(left: DataFrame, right: DataFrame, key: String,
                     tsCol: String, rightCols: Seq[String]): DataFrame = {
    import graft.plans.{AsofJoin, AsofJoinStrategy}
    import org.apache.spark.sql.graft.GraftBridge
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy
    // right child carries key/ts under reserved names plus the
    // payload pre-named matched_* — every output name unique, every
    // right-side attribute freshly aliased (self-join safe)
    val r2 = right.select(col(key).as("__asof_k") +:
      col(tsCol).as("__asof_t") +:
      rightCols.map(c => col(c).as(s"matched_$c")): _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = r2.queryExecution.analyzed
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
             n: String) = p.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"column $n not found"))
    val plan = AsofJoin(lPlan, rPlan,
      attr(lPlan, key), attr(rPlan, "__asof_k"),
      attr(lPlan, tsCol), attr(rPlan, "__asof_t"))
    GraftBridge.dataset(spark, plan).drop("__asof_k", "__asof_t")
  }

  /** FORWARD as-of through the same native exec by TIME REVERSAL:
    * "earliest right with rts >= lts" is exactly "latest right with
    * rts' <= lts'" under t' = −t, so both sides gain a negated
    * timestamp, ride [[asofJoinNative]] unchanged, and drop the
    * helper column — one exec covers both directions instead of a
    * mirrored twin. Ties (right at exactly left.ts) stay visible,
    * matching [[asofJoinForward]]'s `<=` semantics. */
  def asofJoinNativeForward(left: DataFrame, right: DataFrame,
                            key: String, tsCol: String,
                            rightCols: Seq[String]): DataFrame = {
    // negate() resolves only for numeric types — temporal columns
    // first map to epoch micros (an exact, monotonic bijection, so
    // the reversal argument is unchanged); the helper column is
    // dropped either way, and the composed asofJoinForward accepts
    // the same temporal types
    import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}
    def rev(df: DataFrame) = {
      val c = df.schema(tsCol).dataType match {
        case TimestampType => unix_micros(col(tsCol))
        case TimestampNTZType | DateType =>
          unix_micros(col(tsCol).cast(TimestampType))
        case _ => col(tsCol)
      }
      df.withColumn("__asof_rev", negate(c))
    }
    asofJoinNative(rev(left), rev(right), key, "__asof_rev", rightCols)
      .drop("__asof_rev")
  }

  /** The FORWARD as-of join: for each left row, the EARLIEST right
    * row with right.ts >= left.ts on the same key — "what happened
    * next" (the first purchase after a click, the next quote after an
    * order), the mirror DuckDB writes as `ASOF ... ON l.ts <= r.ts`.
    * Same composition, mirrored: sides sort left-before-right at
    * equal ts (a right row exactly at left.ts IS visible, `<=`
    * semantics) and the first right payload is pulled BACKWARD from
    * an unbounded-following window. Still ONE shuffle on the key.
    * `toleranceUs` bounds the look-AHEAD: a right row later than
    * left.ts + tolerance does not match. */
  def asofJoinForward(left: DataFrame, right: DataFrame, key: String,
                      tsCol: String, rightCols: Seq[String],
                      toleranceUs: Option[Long] = None): DataFrame = {
    val payload = struct(rightCols.map(col) :+ col(tsCol).as("__rts"): _*)
    val l = left.withColumn("__side", lit(0)).withColumn("__r", lit(null)
      .cast(right.select(rightCols.map(col) :+ col(tsCol).as("__rts"): _*)
        .schema.fields
        .foldLeft(new org.apache.spark.sql.types.StructType())(
          (s, f) => s.add(f))))
    val r = right.select(col(key), col(tsCol), payload.as("__r"))
      .withColumn("__side", lit(1))
    val lAligned = l.select(
      (left.columns.toIndexedSeq.map(col) :+ col("__side") :+ col("__r")): _*)
    val rAligned = {
      val nulls = left.columns.filterNot(c => c == key || c == tsCol)
        .map(c => lit(null).cast(left.schema(c).dataType).as(c))
      val base = r.select((Seq(col(key), col(tsCol)) ++ nulls) :+
        col("__side") :+ col("__r"): _*)
      base.select(lAligned.columns.toIndexedSeq.map(col): _*)
    }
    val w = Window.partitionBy(col(key))
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val matched = lAligned.unionByName(rAligned)
      .withColumn("__match", first(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
      .drop("__side", "__r")
    val bounded = toleranceUs.fold(matched)(tol =>
      matched.withColumn("__match",
        when(col("__match.__rts") <= col(tsCol) + tol, col("__match"))))
    bounded.select((left.columns.toIndexedSeq.map(col) ++
      rightCols.map(c => col(s"__match.$c").as(s"matched_$c"))): _*)
  }
}
