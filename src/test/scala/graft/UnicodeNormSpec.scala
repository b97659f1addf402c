package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.UnicodeExpressions
import graft.ops.TextOps

/** NFC normalization (t53): kernel semantics, the quick-check fast
  * path, null propagation, codegen-path parity, and the t53 fixture's
  * engine-independence contract (compositions frozen by the Unicode
  * stability policy). All literals use explicit \\u escapes so the
  * decomposed/composed distinction can't be destroyed by an editor
  * normalizing the source file.
  */
class UnicodeNormSpec extends SparkTestBase {

  private def nfc(s: String): String =
    UnicodeExpressions.nfc(UTF8String.fromString(s)).toString

  test("decomposed Latin sequences compose to the canonical form") {
    assert(nfc("e\u0301") === "\u00E9") // e + acute \u2192 \u00E9
    assert(nfc("n\u0303") === "\u00F1") // n + tilde \u2192 \u00F1
    assert(nfc("a\u0300") === "\u00E0") // a + grave \u2192 \u00E0
    assert(nfc("A\u030A") === "\u00C5") // A + ring \u2192 \u00C5
    assert(nfc("e\u0301n\u0303a\u0300 A\u030Ae\u0301") ===
      "\u00E9\u00F1\u00E0 \u00C5\u00E9")
  }

  test("already-NFC input returns the SAME UTF8String (quick-check fast path)") {
    val in = UTF8String.fromString("plain ascii and \u00E9")
    assert(UnicodeExpressions.nfc(in) eq in)
  }

  test("NFC is idempotent and shortens combining sequences") {
    val s = "x e\u0301 y n\u0303 z"
    assert(nfc(nfc(s)) === nfc(s))
    assert(nfc(s).codePointCount(0, nfc(s).length) <
      s.codePointCount(0, s.length))
  }

  test("empty string and combining-mark-only input are stable") {
    assert(nfc("") === "")
    assert(nfc("\u0301") === "\u0301") // lone mark has nothing to attach to
  }

  test("column path: codegen expression matches the kernel, null \u2192 null") {
    import spark.implicits._
    val df = Seq(Option("e\u0301n\u0303"), Option("plain"), None)
      .toDF("s")
      .select(TextOps.nfcNormalize(col("s")).as("n"))
    val got = df.collect().map(r => Option(r.getString(0)))
    assert(got.toSeq === Seq(Some("\u00E9\u00F1"), Some("plain"), None))
  }

  test("t53 query is deterministic and flags every row changed") {
    val out = SparkEntry.queries("t53_unicode_normalize")(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // the appended fixture suffix guarantees composition work per row
    assert(rows.forall(_.getAs[Int]("changed") === 1))
    // 12-codepoint decomposed suffix composes to 7 \u2192 exactly 5 fewer
    assert(rows.forall(r => r.getAs[Int]("pre_cp") - r.getAs[Int]("post_cp") === 5))
  }
}
