package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-document text statistics kernels.
  *
  * [[TokenEntropy]] computes the t27 token-distribution entropy in one
  * compiled loop per document. The declarative twin
  * ([[graft.ops.TextOps.tokenEntropyFold]] — `array_sort` + an
  * `aggregate` run-length fold) is semantically identical but runs as
  * an INTERPRETED higher-order lambda: Catalyst evaluates the struct
  * accumulator expression tree per token (~23 µs/token measured), so
  * the 5000-doc sf0.1 bench query spent ~7 s in pure eval overhead.
  * This kernel replays the exact same arithmetic in the same order —
  * UTF8String binary token sort, run-length fold in sorted order,
  * `p·ln p` accumulated left-to-right with Spark's `StrictMath.log`,
  * `0.0 − s` normalization, Spark's `BigDecimal` HALF_UP round(6) —
  * so the output is bit-identical (OpsSpec pins parity on the corpus
  * plus crafted run-length/empty edge cases) and t27 stays hash-EXACT
  * against the unchanged DuckDB oracle.
  */
object TextStatsExpressions {

  private val space = UTF8String.fromString(" ")

  /** The fused kernel: tokenize on single spaces (trailing empties
    * kept, matching `split(text, " ")` with its default -1 limit),
    * binary-sort, run-length entropy. UTF8String sort/equality keep
    * the byte-wise ordering `array_sort` uses.
    */
  def entropy(text: UTF8String): Double = {
    val toks: Array[UTF8String] = text.split(space, -1)
    java.util.Arrays.sort(toks.asInstanceOf[Array[Object]])
    val n = toks.length.toDouble
    var acc = 0.0
    var i = 0
    while (i < toks.length) {
      var j = i + 1
      while (j < toks.length && toks(j).equals(toks(i))) j += 1
      val p = (j - i).toDouble / n
      acc = acc + p * StrictMath.log(p)
      i = j
    }
    // 0.0 - acc, not -acc: normalizes the single-distinct-token -0.0
    // (cf. the fold twin); then Spark Round's HALF_UP decimal scale-6
    java.math.BigDecimal.valueOf(0.0 - acc)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  /** `token_entropy(text)` → double. Null text → null. */
  case class TokenEntropy(child: Expression) extends UnaryExpression {

    override def dataType: DataType = DoubleType

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"token_entropy requires a string column, got ${other.catalogString}")
    }

    override def nullSafeEval(input: Any): Any =
      entropy(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.TextStatsExpressions$$.MODULE$$.entropy($c)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }
}
