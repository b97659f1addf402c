package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the per-pair hot loops the HOF
  * (`zip_with`/`aggregate`) formulations evaluate lambda-per-element.
  *
  * Semantics are IDENTICAL to the HOF versions (sequential
  * left-to-right double accumulation over the element order), so
  * results stay bit-for-bit equal to the DuckDB oracle — only the
  * evaluation cost changes (primitive loop vs per-element closure).
  * In the sf0.1 brute-force kNN these cut the pairwise stage ~10×.
  */
object VectorExpressions {

  /** dot(a, b) in double precision; arrays of float or double.
    * Participates in whole-stage codegen: the generated loop fuses
    * into the surrounding stage (join + projection), no virtual calls.
    */
  private def checkArrayOf(e: Expression, pos: String,
                           ok: DataType => Boolean,
                           want: String): Option[TypeCheckResult] =
    e.dataType match {
      case ArrayType(et, _) if ok(et) => None
      case other => Some(TypeCheckResult.TypeCheckFailure(
        s"$pos argument must be array<$want>, got ${other.catalogString}"))
    }

  case class VectorDot(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = DoubleType

    // these expressions are exposed to arbitrary input as SQL functions
    // (GraftExtensions) — fail at analysis, not with ClassCastException
    override def checkInputDataTypes(): TypeCheckResult = {
      val isFp = (t: DataType) => t == FloatType || t == DoubleType
      checkArrayOf(left, "left", isFp, "float|double")
        .orElse(checkArrayOf(right, "right", isFp, "float|double"))
        .getOrElse(TypeCheckResult.TypeCheckSuccess)
    }

    private def elemIsDouble(e: Expression): Boolean =
      e.dataType.asInstanceOf[ArrayType].elementType == DoubleType

    private lazy val leftDouble = elemIsDouble(left)
    private lazy val rightDouble = elemIsDouble(right)

    // a null ELEMENT nulls the whole result — matching what the HOF
    // aggregate(zip_with(...)) formulation produces (null propagates
    // through the lambda and the fold), keeping the bit-parity claim.
    override def nullable: Boolean = true

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        val xi = if (leftDouble) x.getDouble(i) else x.getFloat(i).toDouble
        val yi = if (rightDouble) y.getDouble(i) else y.getFloat(i).toDouble
        acc += xi * yi
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        val getL = if (leftDouble) s"$a.getDouble($i)" else s"(double) $a.getFloat($i)"
        val getR = if (rightDouble) s"$b.getDouble($i)" else s"(double) $b.getFloat($i)"
        s"""
           |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
           |  $acc += $getL * $getR;
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** 64-bit SimHash over an array<string> token column: one pass,
    * xxhash64(seed 42 — same as `functions.xxhash64`) per token,
    * majority vote per bit.
    */
  case class SimHash64(child: Expression)
      extends UnaryExpression with CodegenFallback {

    override def dataType: DataType = LongType

    override def checkInputDataTypes(): TypeCheckResult =
      checkArrayOf(child, "tokens", _ == StringType, "string")
        .getOrElse(TypeCheckResult.TypeCheckSuccess)

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val counts = new Array[Int](64)
      var nonNull = 0
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          nonNull += 1
          val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
          var j = 0
          while (j < 64) {
            if (((h >>> j) & 1L) == 1L) counts(j) += 1
            j += 1
          }
        }
        i += 1
      }
      // majority over the tokens actually hashed — counting null slots
      // in the denominator would bias every bit toward 0
      var out = 0L
      var j = 0
      while (j < 64) {
        if (counts(j) * 2 > nonNull) out |= (1L << j)
        j += 1
      }
      out
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Count of positions where two long arrays agree (MinHash
    * signature agreement) — one primitive pass per pair.
    */
  case class LongArrayEqCount(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = IntegerType

    override def checkInputDataTypes(): TypeCheckResult =
      checkArrayOf(left, "left", _ == LongType, "bigint")
        .orElse(checkArrayOf(right, "right", _ == LongType, "bigint"))
        .getOrElse(TypeCheckResult.TypeCheckSuccess)

    // null slots never count as agreement (null-vs-null and null-vs-0
    // would otherwise both read as 0 == 0) — internal minhash
    // signatures are never null, but the SQL function minhash_agreement
    // sees arbitrary input
    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var eq = 0
      var i = 0
      while (i < n) {
        if (!x.isNullAt(i) && !y.isNullAt(i) && x.getLong(i) == y.getLong(i)) eq += 1
        i += 1
      }
      eq
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val eq = ctx.freshName("eq")
        s"""
           |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |int $eq = 0;
           |for (int $i = 0; $i < $n; $i++) {
           |  if (!$a.isNullAt($i) && !$b.isNullAt($i) &&
           |      $a.getLong($i) == $b.getLong($i)) $eq++;
           |}
           |${ev.value} = $eq;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Per-bit majority vote over an array of 64-bit hashes: bit j of
    * the result is set iff more than half the non-null elements have
    * bit j set — the SimHash vote, decoupled from the hash function so
    * the portable (MD5-based) simhash can reuse it. Null slots are
    * excluded from numerator and denominator, matching [[SimHash64]].
    */
  case class BitMajority64(child: Expression)
      extends UnaryExpression with CodegenFallback {

    override def dataType: DataType = LongType

    override def checkInputDataTypes(): TypeCheckResult =
      checkArrayOf(child, "hashes", _ == LongType, "bigint")
        .getOrElse(TypeCheckResult.TypeCheckSuccess)

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val counts = new Array[Int](64)
      var nonNull = 0
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          nonNull += 1
          val h = arr.getLong(i)
          var j = 0
          while (j < 64) {
            if (((h >>> j) & 1L) == 1L) counts(j) += 1
            j += 1
          }
        }
        i += 1
      }
      var out = 0L
      var j = 0
      while (j < 64) {
        if (counts(j) * 2 > nonNull) out |= (1L << j)
        j += 1
      }
      out
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def bit_majority(hashes: Column): Column =
    ColumnBridge.column(BitMajority64(ColumnBridge.expression(hashes)))

  def long_array_eq_count(a: Column, b: Column): Column =
    ColumnBridge.column(LongArrayEqCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def vector_dot(a: Column, b: Column): Column =
    ColumnBridge.column(VectorDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))
}
