package graft.functions.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** `bloom.mightContainLong(key)` as a native codegen expression — the
  * probe side of a runtime semi-join filter (the mechanism behind
  * Spark's own `InjectRuntimeFilter`, exposed as an explicit,
  * guaranteed operator; see `operators/RuntimeFilter`).
  *
  * The filter rides a TORRENT BROADCAST, not the expression tree: a
  * serialized megabyte-class filter embedded in the plan is re-shipped
  * inside every stage's task binary (the bench logged 1-3 MiB task
  * binaries, one serialize+compress per stage per job), while the
  * broadcast moves the bytes to each executor exactly once per query
  * and the plan carries only the handle. Each expression instance
  * deserializes the executor-local bytes once; the per-row cost is two
  * hash mixes and `k` bit probes on a local bitset, cheap enough to
  * sit inside whole-stage codegen upstream of an exchange.
  */
case class LongBloomMightContain(child: Expression,
                                 bloomBc: Broadcast[Array[Byte]])
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
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloomBc.value))

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // only the broadcast HANDLE enters the codegen references array;
    // the filter deserializes lazily from executor-local broadcast
    // bytes, once per expression instance
    val bloomCls = classOf[BloomFilter].getName
    val bcRef = ctx.addReferenceObj("graftBloomBc", bloomBc,
      classOf[Broadcast[_]].getName)
    val filterVar = ctx.addMutableState(bloomCls, "graftBloomFilter")
    nullSafeCodeGen(ctx, ev, v => s"""
      if ($filterVar == null) {
        try {
          $filterVar = $bloomCls.readFrom(
            new java.io.ByteArrayInputStream((byte[]) $bcRef.value()));
        } catch (java.io.IOException e) {
          throw new RuntimeException(e);
        }
      }
      ${ev.value} = $filterVar.mightContainLong($v);""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
