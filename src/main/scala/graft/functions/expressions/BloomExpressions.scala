package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** `bloom.mightContainLong(key)` as a native codegen expression — the
  * probe side of a runtime semi-join filter (the mechanism behind
  * Spark's own `InjectRuntimeFilter`, exposed as an explicit,
  * guaranteed operator; see `operators/RuntimeFilter`).
  *
  * The filter is carried as its serialized `spark-sketch` byte form
  * (the case-class child of the expression stays a plain value) and
  * deserialized ONCE per executor via a plan reference object — the
  * per-row cost is two hash mixes and `k` bit probes on a local
  * bitset, cheap enough to sit inside whole-stage codegen upstream of
  * an exchange.
  */
case class LongBloomMightContain(child: Expression, bloomBytes: Array[Byte])
  extends UnaryExpression {

  // probe key must be LongType (callers pass bigint join keys)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT key, got ${child.dataType.sql}")
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(bloomBytes)

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the deserialized filter rides the codegen references array
    // (BloomFilterImpl is Serializable), so generated code probes the
    // executor-local bitset directly
    val ref = ctx.addReferenceObj("graftBloom", bloom,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.mightContainLong($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
