package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** One-pass signature kernels (SURVEY §2.10 ladder (b)) for the dedup
  * operators' per-row hot loops. The built-in compositions they replace
  * are CORRECT but evaluate as interpreted higher-order chains that
  * re-scan the hash array once per output component:
  *  - SimHash: 32 × `size(filter(th, bit b set))` = 32 passes;
  *  - MinHash: k × `array_min(transform(bh, CW permutation j))` = k
  *    passes, each allocating an intermediate array.
  * The kernels compute all components in one primitive scan with
  * IDENTICAL arithmetic (same long multiply/add/mod, same comparison
  * order), so results are bit-for-bit unchanged and the DuckDB oracles
  * are untouched. Dense arrays assumed (token/shingle hashes are never
  * null). Separate object so Janino calls the static forwarders. */
object SigKernels {

  /** SimHash: bit b set iff hashes with bit b set outnumber the rest
    * (2·cnt − n > 0 — same tie rule as the composition). */
  def simhash(th: ArrayData, bits: Int): Long = {
    val n = th.numElements()
    var result = 0L
    var b = 0
    while (b < bits) {
      var cnt = 0
      var i = 0
      while (i < n) {
        if (((th.getLong(i) >> b) & 1L) == 1L) cnt += 1
        i += 1
      }
      if (2 * cnt - n > 0) result |= (1L << b)
      b += 1
    }
    result
  }

  /** Winnowing fingerprints (Schleimer et al., SIGMOD'03): minima of
    * sliding windows of `w` consecutive hashes, deduplicated in first-
    * occurrence order — exactly `array_distinct(transform(sequence(...),
    * i -> array_min(slice(h, i, w))))` with the short-doc fallbacks, in
    * ONE primitive pass instead of an interpreted slice+min per window. */
  def winnowFingerprints(h: ArrayData, w: Int): ArrayData = {
    val n = h.numElements()
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    if (n < w) {
      var mn = Long.MaxValue
      var i = 0
      while (i < n) { val v = h.getLong(i); if (v < mn) mn = v; i += 1 }
      return new GenericArrayData(Array(mn))
    }
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new Array[Long](n - w + 1)
    var k = 0
    var i = 0
    while (i <= n - w) {
      var mn = h.getLong(i)
      var j = i + 1
      while (j < i + w) { val v = h.getLong(j); if (v < mn) mn = v; j += 1 }
      if (seen.add(mn)) { out(k) = mn; k += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, k))
  }

  /** |A∩B| of two DISTINCT-element long arrays: copy to primitive
    * arrays, dual sort, one merge pass. Replaces
    * `size(array_intersect(a, b))`, which materializes the whole
    * intersection array (plus its hash structures) only to take its
    * length. Equality of counts relies on the distinct-element
    * precondition (every caller builds the arrays via `array_distinct`)
    * — with duplicates `array_intersect` would dedupe where the merge
    * would pair them up.
    *
    * Null ELEMENTS (possible via the session-registered SQL function —
    * internal callers never produce them) follow `array_intersect`
    * semantics: nulls compare equal to each other, so a null present on
    * both sides contributes exactly one intersection element. The
    * engine's own arrays come from `array_distinct`, so a side carries
    * at most one null either way. */
  def intersectSize(a: ArrayData, b: ArrayData): Int = {
    val (xs, aNull) = nonNullLongs(a)
    val (ys, bNull) = nonNullLongs(b)
    mergeCount(xs, ys) + (if (aNull && bNull) 1 else 0)
  }

  /** Fast path for arrays whose TYPE forbids null elements (the
    * engine's internal callers — `containsNull=false` is checked at
    * analysis time by the expression, so the bulk `toLongArray` copy is
    * safe): no per-element null probes. */
  def intersectSizeDense(a: ArrayData, b: ArrayData): Int =
    mergeCount(a.toLongArray(), b.toLongArray())

  private def mergeCount(xs: Array[Long], ys: Array[Long]): Int = {
    java.util.Arrays.sort(xs)
    java.util.Arrays.sort(ys)
    var i = 0; var j = 0; var inter = 0
    while (i < xs.length && j < ys.length) {
      val x = xs(i); val y = ys(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter
  }

  /** The non-null elements of a long array + whether a null was seen.
    * `ArrayData.toLongArray` NPEs on null elements, so walk manually. */
  private def nonNullLongs(a: ArrayData): (Array[Long], Boolean) = {
    val n = a.numElements()
    val out = new Array[Long](n)
    var m = 0; var sawNull = false; var i = 0
    while (i < n) {
      if (a.isNullAt(i)) sawNull = true
      else { out(m) = a.getLong(i); m += 1 }
      i += 1
    }
    (if (m == n) out else java.util.Arrays.copyOf(out, m), sawNull)
  }

  /** MinHash signature over Carter–Wegman permutations of MATERIALIZED
    * base hashes: out(j) = min_i (A_j·bh_i + B_j) mod p. Arithmetic is
    * the same JVM long multiply/add/mod the Catalyst composition
    * performs (operands < 2³¹, no overflow). */
  def minhashSig(bh: ArrayData, as: Array[Long], bs: Array[Long],
      p: Long): ArrayData = {
    val n = bh.numElements()
    val k = as.length
    val out = new Array[Long](k)
    var j = 0
    while (j < k) {
      val a = as(j); val b = bs(j)
      var mn = Long.MaxValue
      var i = 0
      while (i < n) {
        val v = (a * bh.getLong(i) + b) % p
        if (v < mn) mn = v
        i += 1
      }
      out(j) = mn
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** Codegen'd SimHash over a token-hash array column. */
case class SimhashBits(child: Expression, bits: Int)
    extends UnaryExpression {
  // same degenerate-parameter guard class as lshBandHashes/simhashChunks:
  // bits=0 silently gave EVERY doc signature 0 (one mega-bucket, zero
  // pairs after the hot-bucket cap); bits>64 wraps shifts mod 64
  require(bits >= 1 && bits <= 64, s"simhash bits must be 1..64, got $bits")
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_bits"

  override protected def nullSafeEval(input: Any): Any =
    SigKernels.simhash(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SigKernels.simhash($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SimhashBits =
    copy(child = newChild)
}

/** Codegen'd winnowing fingerprints over a shingle-hash array column.
  * Returns null for a null input array (upstream text is never null);
  * the composition it replaces yields an empty array there — callers
  * explode the result, where null and empty behave identically. */
case class WinnowFingerprints(child: Expression, w: Int)
    extends UnaryExpression {
  require(w >= 1, "window must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override protected def nullSafeEval(input: Any): Any =
    SigKernels.winnowFingerprints(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SigKernels.winnowFingerprints($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

/** Codegen'd |A∩B| over two DISTINCT-element long-array columns — the
  * hot half of the Jaccard verify join. Replaces
  * `size(array_intersect(a, b))`: identical counts on distinct arrays
  * (every caller builds them via `array_distinct`), no intersection
  * array or hash structure materialized per pair. The division stays in
  * Catalyst ([[graft.ext.Dedup.jaccard]]) so null-on-zero-divide and
  * type-promotion semantics are exactly the composition's.
  *
  * Null elements: accepted (the function is session-registered SQL, so
  * arbitrary arrays can reach it) with `array_intersect` semantics —
  * nulls compare equal, contributing one element when present on both
  * sides. The null-probing walk is paid ONLY when a child's type says
  * `containsNull=true`; the engine's internal arrays are
  * `containsNull=false`, selecting the bulk-copy fast path at analysis
  * time. */
case class IntersectSizeLong(left: Expression, right: Expression)
    extends BinaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

  override def dataType: DataType = IntegerType
  override def prettyName: String = "intersect_size_long"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"intersect_size_long requires array<bigint> on both sides, " +
          s"got ${l.catalogString} / ${r.catalogString}")
    }

  // resolved once per expression instance, not per row (interpreted
  // eval calls nullSafeEval per pair — the kernel's hot path)
  @transient private lazy val dense: Boolean =
    Seq(left.dataType, right.dataType).forall {
      case ArrayType(_, containsNull) => !containsNull
      case _ => false
    }
  private def kernelName: String =
    if (dense) "intersectSizeDense" else "intersectSize"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    if (dense) SigKernels.intersectSizeDense(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else SigKernels.intersectSize(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SigKernels.$kernelName($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectSizeLong =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd MinHash signature over a base-hash array column. The
  * permutation coefficients are plan-time constants, shared with the
  * generated code through a codegen reference (not re-parsed per row).
  * Returns null for a null input array; callers filter empties upstream
  * (an empty array would otherwise yield MaxValue sentinels where the
  * composition yields nulls). */
case class MinhashSig(child: Expression, as: Seq[Long], bs: Seq[Long],
    p: Long) extends UnaryExpression {
  require(as.length == bs.length, "coefficient arrays must align")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  @transient private lazy val asArr = as.toArray
  @transient private lazy val bsArr = bs.toArray

  override protected def nullSafeEval(input: Any): Any =
    SigKernels.minhashSig(input.asInstanceOf[ArrayData], asArr, bsArr, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("minhashAs", asArr, "long[]")
    val bsRef = ctx.addReferenceObj("minhashBs", bsArr, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SigKernels.minhashSig($c, $asRef, $bsRef, ${p}L)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}
