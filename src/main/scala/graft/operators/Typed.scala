package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import java.math.{BigDecimal => JBigDecimal, MathContext}

/** Typed Dataset surface: case-class rows + a custom `Aggregator` —
  * the type-safe API tier (`Dataset[T]`, `KeyValueGroupedDataset`)
  * for pipelines where compile-time row types matter.
  *
  * The revenue Aggregator mirrors the SQL-side exact-decimal math
  * (`cast(price as decimal(12,2)) * (1 - cast(disc as decimal(4,2)))`)
  * with explicit-scale JVM BigDecimals, so its output hash-matches
  * the same DuckDB oracle as the untyped queries.
  */
final case class LineItemRow(l_returnflag: String, l_linestatus: String,
                             l_extendedprice: Double, l_discount: Double)

final case class FlagRevenue(l_returnflag: String, l_linestatus: String,
                             revenue: Double, n_lines: Long)

object Typed {

  /** Exact decimal revenue term — same rounding as the SQL cast
    * (HALF_UP to the target scale). */
  private[operators] def revenueTerm(price: Double, discount: Double): JBigDecimal = {
    val p = new JBigDecimal(price, MathContext.UNLIMITED)
      .setScale(2, java.math.RoundingMode.HALF_UP)
    val d = new JBigDecimal(discount, MathContext.UNLIMITED)
      .setScale(2, java.math.RoundingMode.HALF_UP)
    p.multiply(JBigDecimal.ONE.subtract(d))
  }

  /** Custom typed Aggregator: exact-decimal revenue sum + line count
    * per group. Buffer is (unscaled-sum-string, count) to keep the
    * Encoder simple and the arithmetic exact. */
  object RevenueAgg extends Aggregator[LineItemRow, (String, Long), (Double, Long)] {
    override def zero: (String, Long) = ("0.0000", 0L)
    override def reduce(b: (String, Long), r: LineItemRow): (String, Long) =
      (new JBigDecimal(b._1)
        .add(revenueTerm(r.l_extendedprice, r.l_discount)).toPlainString,
        b._2 + 1)
    override def merge(a: (String, Long), b: (String, Long)): (String, Long) =
      (new JBigDecimal(a._1).add(new JBigDecimal(b._1)).toPlainString,
        a._2 + b._2)
    override def finish(b: (String, Long)): (Double, Long) =
      (new JBigDecimal(b._1).doubleValue(), b._2)
    override def bufferEncoder: Encoder[(String, Long)] =
      Encoders.tuple(Encoders.STRING, Encoders.scalaLong)
    override def outputEncoder: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  }

  /** Typed pipeline: DataFrame → Dataset[LineItemRow] → groupByKey →
    * custom Aggregator → typed result. */
  def revenueByFlag(lineitem: DataFrame)
                   (implicit spark: SparkSession): Dataset[FlagRevenue] = {
    import spark.implicits._
    lineitem
      .select("l_returnflag", "l_linestatus", "l_extendedprice", "l_discount")
      .as[LineItemRow]
      .groupByKey(r => (r.l_returnflag, r.l_linestatus))
      .agg(RevenueAgg.toColumn.name("rev"))
      .map { case ((flag, status), (rev, n)) =>
        FlagRevenue(flag, status, rev, n)
      }
  }
}
