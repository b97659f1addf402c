package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonical-composition (NFC) normalization as a native
  * Catalyst expression — the standard first cleaning step of a
  * training-data pipeline (decomposed accents, legacy combining
  * sequences, mojibake from mixed encoders all collapse to one
  * canonical form so exact-dedup fingerprints and tokenizers see one
  * spelling per grapheme).
  *
  * Why native and not a UDF: the repo's zero-UDF contract — the
  * kernel participates in whole-stage codegen via `defineCodeGen`
  * (one static call per row), stays null-safe through
  * `UnaryExpression`, and is fold-able by Catalyst on literals.
  *
  * Oracle story: DuckDB ships `nfc_normalize(text)`; both engines
  * implement the same Unicode canonical composition, and the t53
  * fixture restricts itself to compositions stable across every
  * Unicode version ≥ 3.0 (Latin letter + combining acute/tilde/ring —
  * normalization of assigned characters is frozen by the Unicode
  * stability policy, so JDK 17 ICU data and DuckDB's utf8proc agree).
  *
  * Reference behavior: faust treats payload text as opaque and leaves
  * normalization to app code (`faust/serializers/codecs.py:1-60`);
  * this is the engine-side primitive an app would otherwise hand-roll.
  */
object UnicodeExpressions {

  /** The kernel: NFC-compose a UTF8String. Fast path: NFC quick-check
    * on the decoded string skips the composer allocation for the
    * (dominant at crawl scale) already-normalized case.
    */
  def nfc(text: UTF8String): UTF8String = {
    val s = text.toString
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) text
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
  }

  /** `nfc_normalize(text)` → string. Null text → null. */
  case class NfcNormalize(child: Expression) extends UnaryExpression {

    override def dataType: DataType = StringType

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"nfc_normalize requires a string column, got ${other.catalogString}")
    }

    override def nullSafeEval(input: Any): Any =
      nfc(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.UnicodeExpressions$$.MODULE$$.nfc($c)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }
}
