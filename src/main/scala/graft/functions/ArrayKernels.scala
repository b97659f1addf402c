package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused set-intersection kernels for the candidate-verify hot path.
  *
  * Every candidate→verify operator (d24 calibration, d26 prefix
  * Jaccard, d27 containment confirm) ends in "count the common
  * elements of two distinct-element arrays, millions of times".
  * `array_intersect` answers that by building a hash set PER CALL
  * (~80 µs/pair measured on the d26 verify at sf0.1); over arrays
  * pre-sorted ONCE per document the same count is a single merge
  * pass with zero allocation. Inputs must be sorted ascending by the
  * comparison the kernel uses — `array_sort` order for strings
  * (UTF8String binary compare) and numeric order for longs — and
  * de-duplicated (the operators intersect DISTINCT token/shingle
  * sets; on non-distinct inputs the merge counts min-multiplicity
  * matches, which is still the multiset intersection size).
  *
  * The count is definitionally identical to
  * `size(array_intersect(a, b))` on distinct inputs (bit-parity
  * spec-pinned in OpsSpec), so swapping the kernel in never changes
  * an operator's output or its oracle.
  */
object ArrayKernels {

  def intersectCountStr(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < na && j < nb) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  def intersectCountLong(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  /** Smallest intersection count c in [0, cmax] whose Jaccard
    * `c / (na + nb - c)` clears `t` under the SAME double arithmetic
    * the verify filter applies downstream (correctly-rounded IEEE
    * division is weakly monotone in c, so "all c below the smallest
    * passing c fail" is exact, not approximate). Returns cmax + 1
    * when no count can pass — the caller then skips the merge
    * entirely. Shared by the bounded kernels and their specs.
    */
  def jaccardNeed(na: Int, nb: Int, t: Double): Long = {
    val s = na.toLong + nb.toLong
    val cmax = math.min(na, nb).toLong
    // closed-form start, backed off 2 to absorb rounding, then walk up
    var c = math.max(0L, (t * s / (1.0 + t)).toLong - 2L)
    while (c <= cmax && c.toDouble / (s - c) < t) c += 1
    c
  }

  /** [[intersectCountStr]] with threshold-aware early exit: bails as
    * soon as even a full match of the remaining elements cannot reach
    * the count `need`. For pairs that can still pass it returns the
    * EXACT count; for pairs it bails on, the partial count it returns
    * is below `need`, so a downstream `jaccard >= t` (or
    * `count >= need`) filter drops the row exactly as it would have
    * with the true count — filter-equivalent by construction, proven
    * bit-equivalent on the operator outputs in OpsSpec.
    */
  def intersectCountStrBounded(a: ArrayData, b: ArrayData,
                               need: Long): Long = {
    val na = a.numElements(); val nb = b.numElements()
    if (need > math.min(na, nb)) return 0L
    var i = 0; var j = 0; var c = 0L
    while (i < na && j < nb) {
      if (c + math.min(na - i, nb - j) < need) return c
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  /** Long flavor of [[intersectCountStrBounded]]. */
  def intersectCountLongBounded(a: ArrayData, b: ArrayData,
                                need: Long): Long = {
    val na = a.numElements(); val nb = b.numElements()
    if (need > math.min(na, nb)) return 0L
    var i = 0; var j = 0; var c = 0L
    while (i < na && j < nb) {
      if (c + math.min(na - i, nb - j) < need) return c
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  private def check(e: Expression, elem: DataType,
                    what: String): TypeCheckResult = e.dataType match {
    case ArrayType(t, _) if t == elem => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$what requires array<${elem.catalogString}>, got ${other.catalogString}")
  }

  /** `sorted_intersect_count(a, b)` over lex-sorted string arrays. */
  case class SortedIntersectCountStr(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult =
      check(left, StringType, "sorted_intersect_count_str") match {
        case TypeCheckResult.TypeCheckSuccess =>
          check(right, StringType, "sorted_intersect_count_str")
        case f => f
      }
    override def nullSafeEval(a: Any, b: Any): Any =
      intersectCountStr(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.ArrayKernels$$.MODULE$$.intersectCountStr($a, $b)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** `sorted_intersect_count(a, b)` over ascending long arrays. */
  case class SortedIntersectCountLong(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult =
      check(left, LongType, "sorted_intersect_count_long") match {
        case TypeCheckResult.TypeCheckSuccess =>
          check(right, LongType, "sorted_intersect_count_long")
        case f => f
      }
    override def nullSafeEval(a: Any, b: Any): Any =
      intersectCountLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.ArrayKernels$$.MODULE$$.intersectCountLong($a, $b)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Per-pair entry point for the Jaccard-thresholded verify: derives
    * the needed count from the pair's sizes, then merges with early
    * exit. Exact for every pair whose Jaccard can reach `t`; below
    * `t` for every pair that cannot (see [[intersectCountStrBounded]]).
    */
  def intersectCountStrJaccard(a: ArrayData, b: ArrayData,
                               t: Double): Long =
    intersectCountStrBounded(a, b,
      jaccardNeed(a.numElements(), b.numElements(), t))

  /** Containment flavor (d27): need = smallest c with c/na >= t under
    * double arithmetic; na is the LEFT (contained-doc) array size.
    */
  def containNeed(na: Int, t: Double): Long = {
    var c = math.max(0L, (t * na).toLong - 2L)
    while (c <= na && c.toDouble / na < t) c += 1
    c
  }

  def intersectCountLongContain(a: ArrayData, b: ArrayData,
                                t: Double): Long =
    intersectCountLongBounded(a, b, containNeed(a.numElements(), t))

  /** Early-exit verify kernel for `jaccard(a, b) >= t` filters over
    * lex-sorted string arrays — same contract as
    * [[SortedIntersectCountStr]] for passing pairs, below-threshold
    * partial counts for failing ones.
    */
  case class SortedIntersectJaccardStr(left: Expression, right: Expression,
                                       t: Double)
      extends BinaryExpression {
    // t is string-interpolated into generated Java source in doGenCode;
    // NaN/Infinity would emit uncompilable code (ADVICE r18)
    require(java.lang.Double.isFinite(t),
      s"sorted_intersect_jaccard_str threshold must be finite, got $t")
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult =
      check(left, StringType, "sorted_intersect_jaccard_str") match {
        case TypeCheckResult.TypeCheckSuccess =>
          check(right, StringType, "sorted_intersect_jaccard_str")
        case f => f
      }
    override def nullSafeEval(a: Any, b: Any): Any =
      intersectCountStrJaccard(a.asInstanceOf[ArrayData],
        b.asInstanceOf[ArrayData], t)
    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.ArrayKernels$$.MODULE$$.intersectCountStrJaccard($a, $b, $t)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Early-exit verify kernel for `c / size(a) >= t` containment
    * filters over ascending long arrays.
    */
  case class SortedIntersectContainLong(left: Expression, right: Expression,
                                        t: Double)
      extends BinaryExpression {
    // t is string-interpolated into generated Java source in doGenCode;
    // NaN/Infinity would emit uncompilable code (ADVICE r18)
    require(java.lang.Double.isFinite(t),
      s"sorted_intersect_contain_long threshold must be finite, got $t")
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult =
      check(left, LongType, "sorted_intersect_contain_long") match {
        case TypeCheckResult.TypeCheckSuccess =>
          check(right, LongType, "sorted_intersect_contain_long")
        case f => f
      }
    override def nullSafeEval(a: Any, b: Any): Any =
      intersectCountLongContain(a.asInstanceOf[ArrayData],
        b.asInstanceOf[ArrayData], t)
    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.ArrayKernels$$.MODULE$$.intersectCountLongContain($a, $b, $t)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def sortedIntersectCountStr(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCountStr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def sortedIntersectCountLong(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCountLong(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def sortedIntersectJaccardStr(a: Column, b: Column, t: Double): Column =
    ColumnBridge.column(SortedIntersectJaccardStr(
      ColumnBridge.expression(a), ColumnBridge.expression(b), t))

  def sortedIntersectContainLong(a: Column, b: Column, t: Double): Column =
    ColumnBridge.column(SortedIntersectContainLong(
      ColumnBridge.expression(a), ColumnBridge.expression(b), t))
}
