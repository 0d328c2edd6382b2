package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions (with `doGenCode`) for graft's hot
  * per-row kernels. The `functions._` higher-order-function versions
  * run interpreted (HOFs are CodegenFallback) with per-element Column
  * evaluation; these compile to tight primitive loops inside
  * whole-stage codegen — the preferred Spark extension point when
  * built-ins can't express the kernel efficiently.
  *
  * Inputs are non-null element arrays (enforced upstream: split()/
  * transform() never emit null elements; embeddings are dense).
  */

/** Sequential-fold dot product over two `array<float>` columns,
  * accumulated in double — bit-identical to both the HOF
  * formulation and DuckDB's `list_dot_product(a::DOUBLE[], ...)`
  * (same element order, same promotion). Returns NULL on length
  * mismatch or any null element, matching the zip_with formulation
  * exactly (zip_with pads the shorter array with nulls; a null
  * product makes the aggregate sum NULL) — so the optimizer rewrite
  * is semantics-preserving for every input. */
case class FloatDotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  // null on length mismatch even when both inputs are non-null
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Sequential-fold dot product over two `array<double>` columns —
  * the [[FloatDotProduct]] kernel for inputs that are already double
  * (e.g. a float vector lifted via `transform(_.cast("double"))`
  * against an exact-mean centroid literal, which is NOT float-
  * representable). Same element order and accumulation as DuckDB's
  * `list_dot_product(a::DOUBLE[], b::DOUBLE[])`; NULL on length
  * mismatch or null elements, like the zip_with formulation. */
case class DoubleDotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  // null on length mismatch even when both inputs are non-null
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ddot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DoubleDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Mixed-type sequential-fold dot product: `array<float>` left ×
  * `array<double>` right, accumulated in double — the raw-embedding ×
  * exact-mean-centroid case, WITHOUT an interpreted `transform()`
  * lift of the float side (HOFs are CodegenFallback; this stays
  * inside whole-stage codegen). Element promotion float→double is
  * exact, so the result is bit-identical to lifting first. */
case class FloatDoubleDotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  // null on length mismatch even when both inputs are non-null
  override def nullable: Boolean = true
  override def prettyName: String = "graft_fddot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ((double) $a.getFloat($i)) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDoubleDotProduct =
    copy(left = newLeft, right = newRight)
}

object MinHashConstants {
  /** Per-permutation xor constants (splitmix64 of the index) —
    * literals baked into the plan, no executor RNG state. The VALUES
    * are embedded verbatim in the DuckDB oracle SQL (TextOracleSql),
    * so the mix itself only needs xor/mask/multiply — all 63-bit-safe. */
  val PermConsts: Array[Long] = Array.tabulate(64) { i =>
    var z = i.toLong + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}

/** Engine-portable 60-bit text hash: the first 15 hex chars of
  * sha256(utf8 bytes), i.e. `('0x' || substr(sha256(s),1,15))::BIGINT`
  * in DuckDB — one shared content hash for minhash / simhash /
  * fingerprinting so their outputs are oracle-checkable. A keyed
  * xxHash64 would be ~3× faster but is not replicable in external SQL
  * engines; these kernels are verify-everything first. */
object TextHash {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("SHA-256")
  }

  def sha60(u: org.apache.spark.unsafe.types.UTF8String): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(u.getBytes)
    var acc = 0L
    var i = 0
    while (i < 8) { acc = (acc << 8) | (d(i) & 0xffL); i += 1 }
    acc >>> 4
  }
}

/** The portable 60-bit content hash as a scalar expression: equals
  * `conv(substring(sha2(s,256),1,15),16,10)` but goes digest→long
  * directly (no hex-string round-trip). */
case class Sha60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sha60"

  override def nullSafeEval(input: Any): Any =
    TextHash.sha60(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.expressions.TextHash.sha60($a);")

  override protected def withNewChildInternal(newChild: Expression): Sha60 =
    copy(child = newChild)
}

/** MinHash signature over an `array<string>` of shingles: one portable
  * 60-bit content hash per shingle + numPerm xor-multiply-shift mixes,
  * element-wise min. Matches graft.operators.Dedup's mix exactly
  * (31-bit masked operand × 32-bit constant keeps ANSI-safe 63-bit
  * products). */
case class MinHashSignature(child: Expression, numPerm: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val consts = MinHashConstants.PermConsts
    val mins = Array.fill(numPerm)(Long.MaxValue)
    var s = 0
    val n = arr.numElements()
    while (s < n) {
      val u = arr.getUTF8String(s)
      val h = TextHash.sha60(u)
      var i = 0
      while (i < numPerm) {
        val x = ((h ^ consts(i)) & 0x7fffffffL) * 0x9E3779B1L
        val m = x ^ (x >>> 31)
        if (m < mins(i)) mins(i) = m
        i += 1
      }
      s += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val consts = ctx.addReferenceObj("permConsts",
        MinHashConstants.PermConsts, "long[]")
      val mins = ctx.freshName("mins")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val x = ctx.freshName("x")
      val m = ctx.freshName("m")
      s"""
         |long[] $mins = new long[$numPerm];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |int $n = $a.numElements();
         |for (int $s = 0; $s < $n; $s++) {
         |  long $h = graft.functions.expressions.TextHash
         |    .sha60($a.getUTF8String($s));
         |  for (int $i = 0; $i < $numPerm; $i++) {
         |    long $x = (($h ^ $consts[$i]) & 0x7fffffffL) * 0x9E3779B1L;
         |    long $m = $x ^ ($x >>> 31);
         |    if ($m < $mins[$i]) $mins[$i] = $m;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** Banded-LSH band hashes for a MinHash signature (`array<long>`):
  * band j = the 31-bit multiply-accumulate fold of signature values
  * [j·rowsPerBand, (j+1)·rowsPerBand) — identical arithmetic to the
  * HOF formulation it replaces (`aggregate(slice(...))`), kept as a
  * native kernel for two reasons: the tight loop beats the
  * interpreted per-element fold, and the expression canonicalizes
  * cleanly (lambda variables carry fresh exprIds that defeat
  * exchange/subexpression reuse, so a guard branch over the HOF form
  * re-signed the whole corpus). */
case class LshBandHashes(child: Expression, bands: Int, rowsPerBand: Int)
  extends UnaryExpression {
  require(bands >= 1 && rowsPerBand >= 1, "bands and rowsPerBand >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_lsh_bands"

  override def nullSafeEval(input: Any): Any = {
    val sig = input.asInstanceOf[ArrayData]
    // the SQL surface can pass any array — an unchecked short read on
    // UnsafeArrayData would return silent garbage, not an error
    if (sig.numElements() < bands * rowsPerBand)
      throw new IllegalArgumentException(
        s"graft_lsh_bands: signature has ${sig.numElements()} elements, " +
          s"need bands*rowsPerBand = ${bands * rowsPerBand}")
    val out = new Array[Long](bands)
    var j = 0
    while (j < bands) {
      var acc = 0L
      var r = 0
      while (r < rowsPerBand) {
        val v = sig.getLong(j * rowsPerBand + r)
        acc = (acc * 2654435761L + (v & 0x7fffffffL)) % 2147483648L
        r += 1
      }
      out(j) = acc
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val r = ctx.freshName("r")
      val acc = ctx.freshName("acc")
      val v = ctx.freshName("v")
      s"""
         |if ($a.numElements() < ${bands * rowsPerBand}) {
         |  throw new IllegalArgumentException(
         |    "graft_lsh_bands: signature has " + $a.numElements() +
         |    " elements, need bands*rowsPerBand = ${bands * rowsPerBand}");
         |}
         |long[] $out = new long[$bands];
         |for (int $j = 0; $j < $bands; $j++) {
         |  long $acc = 0L;
         |  for (int $r = 0; $r < $rowsPerBand; $r++) {
         |    long $v = $a.getLong($j * $rowsPerBand + $r);
         |    $acc = ($acc * 2654435761L + ($v & 0x7fffffffL)) % 2147483648L;
         |  }
         |  $out[$j] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LshBandHashes =
    copy(child = newChild)
}

object HyperplaneConstants {
  /** Deterministic pseudo-hyperplane components in [-1, 1]. The mix is
    * deliberately plain 63-bit-safe integer arithmetic (multiply, mod,
    * xor, shift) so an external SQL engine can replicate every
    * signature bit exactly — that is what makes the LSH oracle
    * checkable. For component index idx = (table·bits + i)·dim + j:
    *   x    = (idx · 2654435761) mod 2³¹          (Knuth multiplicative)
    *   y    = (x xor (x >> 15)) · 2246822519      (xxHash prime mix)
    *   comp = ((y mod 2001) − 1000) / 1000.0
    */
  def component(idx: Long): Double = {
    val x = (idx * 2654435761L) % 2147483648L
    val y = (x ^ (x >> 15)) * 2246822519L
    ((y % 2001L) - 1000L).toDouble / 1000.0
  }

  def components(tables: Int, bits: Int, dim: Int): Array[Double] =
    Array.tabulate(tables * bits * dim)(i => component(i.toLong))
}

/** Multi-table random-hyperplane signatures for an `array<float>`
  * embedding: `tables` independent signatures of `bits` bits each
  * (bit i of table t = sign of the dot product with pseudo-hyperplane
  * (t·bits+i)), packed MSB-first into ints. One tight loop per row in
  * whole-stage codegen — the HOF formulation ran interpreted with
  * bits × dim re-evaluation per element. */
case class HyperplaneSignatures(child: Expression, dim: Int, bits: Int,
                                tables: Int) extends UnaryExpression {
  require(bits >= 1 && bits <= 30, s"bits must be in [1,30], got $bits")
  require(tables >= 1, s"tables must be >= 1, got $tables")

  @transient private lazy val comps: Array[Double] =
    HyperplaneConstants.components(tables, bits, dim)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_hyperplanes"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), dim)
    val sigs = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var sig = 0
      var i = 0
      while (i < bits) {
        val base = (t * bits + i) * dim
        var acc = 0.0
        var j = 0
        while (j < n) { acc += arr.getFloat(j).toDouble * comps(base + j); j += 1 }
        sig = sig * 2 + (if (acc > 0) 1 else 0)
        i += 1
      }
      sigs(t) = sig
      t += 1
    }
    new GenericArrayData(sigs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val compsRef = ctx.addReferenceObj("hyperplaneComps", comps, "double[]")
      val sigs = ctx.freshName("sigs")
      val n = ctx.freshName("n")
      val t = ctx.freshName("t")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val sig = ctx.freshName("sig")
      val base = ctx.freshName("base")
      val acc = ctx.freshName("acc")
      s"""
         |int[] $sigs = new int[$tables];
         |int $n = java.lang.Math.min($a.numElements(), $dim);
         |for (int $t = 0; $t < $tables; $t++) {
         |  int $sig = 0;
         |  for (int $i = 0; $i < $bits; $i++) {
         |    int $base = ($t * $bits + $i) * $dim;
         |    double $acc = 0.0;
         |    for (int $j = 0; $j < $n; $j++) {
         |      $acc += ((double) $a.getFloat($j)) * $compsRef[$base + $j];
         |    }
         |    $sig = $sig * 2 + (($acc > 0) ? 1 : 0);
         |  }
         |  $sigs[$t] = $sig;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sigs);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSignatures =
    copy(child = newChild)
}

/** Johnson-Lindenstrauss dense random projection of an `array<float>`
  * embedding to `outDim` doubles: output r = Σ_j emb[j] ·
  * comp(r·dim + j) over the [[HyperplaneConstants]] component grid —
  * the pre-sign dot products of a 1-table `outDim`-bit
  * [[HyperplaneSignatures]], kept as values instead of collapsed to
  * sign bits. The per-output accumulation is a strict left-to-right
  * fold in index order, so an external engine's sequential
  * `list_dot_product` against the same replicated component list
  * reproduces every double bit-for-bit. One tight codegen'd loop per
  * row. */
case class HyperplaneProjections(child: Expression, dim: Int, outDim: Int)
  extends UnaryExpression {
  require(outDim >= 1, s"outDim must be >= 1, got $outDim")

  @transient private lazy val comps: Array[Double] =
    HyperplaneConstants.components(1, outDim, dim)

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_project"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), dim)
    val out = new Array[Double](outDim)
    var r = 0
    while (r < outDim) {
      val base = r * dim
      var acc = 0.0
      var j = 0
      while (j < n) { acc += arr.getFloat(j).toDouble * comps(base + j); j += 1 }
      out(r) = acc
      r += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val compsRef = ctx.addReferenceObj("projComps", comps, "double[]")
      val out = ctx.freshName("out")
      val n = ctx.freshName("n")
      val r = ctx.freshName("r")
      val j = ctx.freshName("j")
      val base = ctx.freshName("base")
      val acc = ctx.freshName("acc")
      s"""
         |double[] $out = new double[$outDim];
         |int $n = java.lang.Math.min($a.numElements(), $dim);
         |for (int $r = 0; $r < $outDim; $r++) {
         |  int $base = $r * $dim;
         |  double $acc = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    $acc += ((double) $a.getFloat($j)) * $compsRef[$base + $j];
         |  }
         |  $out[$r] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneProjections =
    copy(child = newChild)
}

/** Top-n nearest centroids (by dot product — embeddings are
  * unit-normalized so dot ≈ cosine) for an `array<float>` embedding.
  * Centroids ride along as a plan reference object. Ties break to the
  * lower centroid index; n=1 is cluster assignment, n=nprobe is the
  * IVF probe list. */
case class NearestCentroids(child: Expression,
                            centroids: Array[Array[Double]], n: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_nearest_centroids"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val dim = math.min(arr.numElements(), centroids(0).length)
    val scores = new Array[Double](centroids.length)
    var c = 0
    while (c < centroids.length) {
      var acc = 0.0
      var i = 0
      val cent = centroids(c)
      while (i < dim) { acc += arr.getFloat(i).toDouble * cent(i); i += 1 }
      scores(c) = acc
      c += 1
    }
    val picked = new Array[Int](math.min(n, centroids.length))
    val used = new Array[Boolean](centroids.length)
    var p = 0
    while (p < picked.length) {
      var best = -1
      var bestScore = Double.NegativeInfinity
      var j = 0
      while (j < scores.length) {
        if (!used(j) && scores(j) > bestScore) { best = j; bestScore = scores(j) }
        j += 1
      }
      used(best) = true
      picked(p) = best
      p += 1
    }
    new GenericArrayData(picked)
  }

  // eval is a reference-heavy loop; keep it off codegen (single
  // virtual call per row via CodegenFallback-style generated call)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj("nearestCentroids", this,
        this.getClass.getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.GenericArrayData) $self.nullSafeEval($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)
}

object WordShinglesKernel {
  import org.apache.spark.unsafe.types.UTF8String
  private val Space = UTF8String.fromString(" ")

  /** tokens → word k-shingles; whole-doc fallback below k tokens
    * (same semantics as Dedup.shingles' CASE WHEN). Static so
    * generated code can call it directly. */
  def compute(text: UTF8String, k: Int): GenericArrayData = {
    val toks = text.split(Space, -1)
    if (toks.length >= k) {
      val out = new Array[AnyRef](toks.length - k + 1)
      var i = 0
      while (i < out.length) {
        val slice = new Array[UTF8String](k)
        System.arraycopy(toks, i, slice, 0, k)
        out(i) = UTF8String.concatWs(Space, slice: _*)
        i += 1
      }
      new GenericArrayData(out)
    } else {
      new GenericArrayData(Array[AnyRef](UTF8String.concatWs(Space, toks: _*)))
    }
  }
}

/** Word k-shingles straight from the text column: split + windowed
  * concat in one native kernel (the HOF transform/slice/concat_ws
  * formulation built every shingle through interpreted per-element
  * Column evaluation). */
case class WordShingles(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(input: Any): Any =
    WordShinglesKernel.compute(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.expressions.WordShinglesKernel.compute($a, $k);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** Count of array elements contained in a literal word set (exact
  * occurrences, matching `size(filter(arr, _.isin(words)))`). */
case class WordSetCount(child: Expression, words: Seq[String])
  extends UnaryExpression {

  @transient private lazy val set: java.util.HashSet[org.apache.spark.unsafe.types.UTF8String] = {
    val s = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
    words.foreach(w => s.add(org.apache.spark.unsafe.types.UTF8String.fromString(w)))
    s
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_wordset_count"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var c = 0
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (set.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val setRef = ctx.addReferenceObj("wordSet", set, "java.util.HashSet")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      s"""
         |int $c = 0;
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($setRef.contains($a.getUTF8String($i))) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WordSetCount =
    copy(child = newChild)
}

/** 60-bit SimHash over an `array<string>` of tokens, packed as 4 ×
  * 15-bit chunk ints (MSB-first per chunk) for the pigeonhole
  * candidate join. 60 bits (not 64) because the per-token content
  * hash is the engine-portable sha256-prefix ([[TextHash]]) — every
  * chunk is replicable in the DuckDB oracle. */
case class SimHashChunks(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counters = new Array[Int](60)
    var t = 0
    val n = arr.numElements()
    while (t < n) {
      val u = arr.getUTF8String(t)
      val h = TextHash.sha60(u)
      var b = 0
      while (b < 60) {
        counters(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      t += 1
    }
    val chunks = new Array[Int](4)
    var c = 0
    while (c < 4) {
      var v = 0
      var i = 15 * c + 14
      while (i >= 15 * c) {
        v = v * 2 + (if (counters(i) > 0) 1 else 0)
        i -= 1
      }
      chunks(c) = v
      c += 1
    }
    new GenericArrayData(chunks)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val counters = ctx.freshName("counters")
      val chunks = ctx.freshName("chunks")
      val n = ctx.freshName("n")
      val t = ctx.freshName("t")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val c = ctx.freshName("c")
      val v = ctx.freshName("v")
      val i = ctx.freshName("i")
      s"""
         |int[] $counters = new int[60];
         |int $n = $a.numElements();
         |for (int $t = 0; $t < $n; $t++) {
         |  long $h = graft.functions.expressions.TextHash
         |    .sha60($a.getUTF8String($t));
         |  for (int $b = 0; $b < 60; $b++) {
         |    $counters[$b] += ((($h >>> $b) & 1L) == 1L) ? 1 : -1;
         |  }
         |}
         |int[] $chunks = new int[4];
         |for (int $c = 0; $c < 4; $c++) {
         |  int $v = 0;
         |  for (int $i = 15 * $c + 14; $i >= 15 * $c; $i--) {
         |    $v = $v * 2 + (($counters[$i] > 0) ? 1 : 0);
         |  }
         |  $chunks[$c] = $v;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($chunks);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashChunks =
    copy(child = newChild)
}

/** Product-quantization codes for an `array<float>` embedding: the
  * vector splits into `centroids.length` contiguous subspaces
  * (subspace `j` has `centroids(j)(c).length` dims); each subvector
  * takes the code of the sub-codebook entry minimizing L2 distance,
  * evaluated as argmax of `x·c − c·c/2` (equal to the L2 argmin for
  * fixed x) — the formulation the DuckDB oracle replays with
  * `list_dot_product`. Dots are sequential double folds; ties break
  * to the lower code. Map-only: the 100 TB corpus compresses to
  * m bytes/vector in one scan with the codebooks riding along as a
  * plan reference object. */
case class PqCodes(child: Expression,
                   centroids: Array[Array[Array[Double]]])
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_codes"

  @transient private lazy val halfNorms: Array[Array[Double]] =
    centroids.map(_.map { cent =>
      var acc = 0.0
      var i = 0
      while (i < cent.length) { acc += cent(i) * cent(i); i += 1 }
      0.5 * acc
    })

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = centroids.length
    val out = new Array[Int](m)
    var sub = 0
    var off = 0
    while (sub < m) {
      val book = centroids(sub)
      val hn = halfNorms(sub)
      val dsub = book(0).length
      var best = -1
      var bestScore = Double.NegativeInfinity
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var acc = 0.0
        var i = 0
        while (i < dsub) {
          acc += arr.getFloat(off + i).toDouble * cent(i)
          i += 1
        }
        val s = acc - hn(c)
        if (s > bestScore) { best = c; bestScore = s }
        c += 1
      }
      out(sub) = best
      off += dsub
      sub += 1
    }
    new GenericArrayData(out)
  }

  // reference-heavy loop: call back into eval from generated code
  // (same pattern as NearestCentroids)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj("pqCodes", this, this.getClass.getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.GenericArrayData) $self.nullSafeEval($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)
}

/** Per-query ADC lookup table for PQ search: a flat
  * `array<double>` of length m·ksub ordered by (sub, code), where
  * entry j·ksub+c = q_subvector_j · centroids(j)(c) as a sequential
  * double fold — exactly the values the expression-tree formulation
  * (left-associated products) and DuckDB's `list_dot_product`
  * produce, without a 4096-term codegen method. */
case class PqLut(child: Expression,
                 centroids: Array[Array[Array[Double]]])
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_pq_lut"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = centroids.length
    val ksub = centroids(0).length
    val out = new Array[Double](m * ksub)
    var sub = 0
    var off = 0
    while (sub < m) {
      val book = centroids(sub)
      val dsub = book(0).length
      var c = 0
      while (c < ksub) {
        val cent = book(c)
        var acc = 0.0
        var i = 0
        while (i < dsub) {
          acc += arr.getFloat(off + i).toDouble * cent(i)
          i += 1
        }
        out(sub * ksub + c) = acc
        c += 1
      }
      off += dsub
      sub += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj("pqLut", this, this.getClass.getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.GenericArrayData) $self.nullSafeEval($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

/** Hilbert-curve index math shared by interpreted eval and generated
  * code (the [[Sha60]]/TextHash pattern: a static kernel the codegen
  * calls directly). */
object HilbertCurve {
  /** Order-`order` Hilbert index of (x, y) ∈ [0, 2^order)²: the
    * classic iterative quadrant walk — at each scale s the quadrant
    * id contributes s² steps and the sub-square is rotated/reflected
    * into canonical orientation (the s-masked rotation variant; a
    * spec proves bijection and unit-step adjacency). O(order) integer
    * ops, loop bound is a compile-time constant in practice. */
  def xy2d(order: Int, x0: Long, y0: Long): Long = {
    var x = x0
    var y = y0
    var d = 0L
    var s = 1L << (order - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

/** Order-16 Hilbert-curve key of two 16-bit normalized coordinates —
  * the locality-preserving alternative to [[graft.operators.Maintenance.mortonKey]]:
  * consecutive key values are ALWAYS grid-adjacent (Morton takes long
  * diagonal jumps at power-of-two boundaries), so equal key ranges
  * make slightly tighter (a, b) rectangles. A ~16-iteration integer
  * loop doesn't express as a Column tree; the kernel runs inside
  * whole-stage codegen via a static call. */
case class HilbertKey(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BIGINT coordinates, got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert"

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertCurve.xy2d(16, a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.expressions.HilbertCurve.xy2d(16, $a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertKey =
    copy(left = newLeft, right = newRight)
}
