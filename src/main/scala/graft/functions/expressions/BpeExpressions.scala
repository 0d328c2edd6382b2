package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE encoding kernel: apply a frozen merge table to each word's
  * character sequence, one merge rule per pass, each pass a single
  * left-to-right non-overlapping fold (the piece list's tail merges
  * with the incoming piece when they match the rule). These are
  * EXACTLY the semantics of a chained `list_reduce` in the SQL
  * oracle, so encodings are byte-reproducible across engines.
  */
object BpeKernel {

  /** word → BPE pieces under `merges` (applied in rank order). */
  def encodeWord(word: String, mergesA: Array[String],
                 mergesB: Array[String]): Array[String] = {
    var pieces: Array[String] = {
      val out = new Array[String](word.length)
      var i = 0
      while (i < word.length) { out(i) = String.valueOf(word.charAt(i)); i += 1 }
      out
    }
    var m = 0
    while (m < mergesA.length && pieces.length > 1) {
      val a = mergesA(m)
      val b = mergesB(m)
      val out = new Array[String](pieces.length)
      var n = 0
      var i = 0
      while (i < pieces.length) {
        if (n > 0 && out(n - 1) == a && pieces(i) == b) out(n - 1) = a + b
        else { out(n) = pieces(i); n += 1 }
        i += 1
      }
      pieces = java.util.Arrays.copyOf(out, n)
      m += 1
    }
    pieces
  }

  /** doc text → words space-joined, each word's pieces '|'-joined.
    * Precondition: text contains no '|' (the piece delimiter). */
  def encodeDoc(text: String, mergesA: Array[String],
                mergesB: Array[String]): String = {
    val words = text.split(" ", -1)
    val sb = new java.lang.StringBuilder(text.length * 2)
    var w = 0
    while (w < words.length) {
      if (w > 0) sb.append(' ')
      val pieces = encodeWord(words(w), mergesA, mergesB)
      var p = 0
      while (p < pieces.length) {
        if (p > 0) sb.append('|')
        sb.append(pieces(p))
        p += 1
      }
      w += 1
    }
    sb.toString
  }
}

/** text → BPE-encoded text (words space-joined, pieces '|'-joined)
  * under a frozen merge table baked into the plan. */
case class BpeEncodeDoc(child: Expression, merges: Seq[(String, String)])
  extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_bpe_encode"

  private lazy val mergesA = merges.map(_._1).toArray
  private lazy val mergesB = merges.map(_._2).toArray

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(BpeKernel.encodeDoc(
      input.asInstanceOf[UTF8String].toString, mergesA, mergesB))

  // iterative string algorithm: call back into eval from generated
  // code (same pattern as NearestCentroids)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj("bpeEncode", this, this.getClass.getName)
      s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $self.nullSafeEval($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeDoc =
    copy(child = newChild)
}
