package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ops.TextOps

/** Bit-parity proof for the fused PII kernel vs the portable
  * regexp_* chain, including the adversarial overlap classes the
  * equivalence argument in PiiExpressions' scaladoc reasons about.
  */
class PiiSpec extends SparkTestBase {

  import spark.implicits._

  /** Adversarial fragment pool: every overlap class from the
    * equivalence proof, plus plain text and noise.
    */
  private val fragments = Seq(
    "plain words here", "user@example.com", "a.b-c_d%e+f@mail.co.uk",
    "555-123-4567", "10.0.0.1", "256.999.1.2",
    // ip-prefix-overlaps-phone: the class where a naive alternation
    // scan diverges from the sequential semantics
    "1.2.3.123-456-7890", "12.34.56.789-012-3456",
    // phone/ip swallowed by an email's local part or domain
    "123-456-7890@x.co", "1.2.3.4@x.co", "a@123-456-7890.co",
    "a@1.2.3.4.co", "9@a.bc123-456-7890",
    // digit runs and near-misses
    "1234-567-89012.3.4.5", "12-34-5678", "1.2.3", "999.999.999.999",
    "....", "---", "@@", "a@b", "@example.com", "x@.com",
    // adjacency without separators
    "user@example.com555-123-4567", "1.2.3.4user@example.com",
    "555-123-4567user@example.com", "émoji ünïcode ®",
    "")

  private def composites(n: Int): Seq[String] = {
    val rnd = new scala.util.Random(20260812L)
    Seq.fill(n) {
      val k = 1 + rnd.nextInt(6)
      Seq.fill(k)(fragments(rnd.nextInt(fragments.length)))
        .mkString(Seq("", " ", ".", "-", "0")(rnd.nextInt(5)))
    }
  }

  test("fused pii kernel is bit-identical to the sequential regexp chain") {
    val texts = fragments ++ composites(400)
    val df = texts.toDF("s").repartition(4)

    val portableCols = TextOps.piiCounts($"s").map { case (n, c) => c.as(n) }
    val portable = df.select(($"s" +: portableCols :+
      TextOps.redactPii($"s").as("redacted")): _*)

    val pii = TextOps.piiScan($"s")
    val fused = df.select($"s",
      pii.getField("n_emails").as("n_emails"),
      pii.getField("n_phones").as("n_phones"),
      pii.getField("n_ips").as("n_ips"),
      pii.getField("redacted").as("redacted"))

    val p = portable.orderBy("s").collect()
    val f = fused.orderBy("s").collect()
    assert(p.length == f.length)
    p.zip(f).foreach { case (a, b) =>
      assert(a == b, s"divergence on input '${a.getString(0)}': portable=$a fused=$b")
    }
  }

  test("sequential semantics: phone-before-ip on the overlap class") {
    // "1.2.3.123-456-7890": the phone is masked FIRST, which destroys
    // the would-be IPv4 "1.2.3.123". A naive email|phone|ip alternation
    // scan would report (0 phones, 1 ip) — the documented divergence.
    val r = Seq("1.2.3.123-456-7890").toDF("s")
      .select(TextOps.piiScan($"s").as("p"))
      .select($"p.n_emails", $"p.n_phones", $"p.n_ips", $"p.redacted")
      .head()
    assert(r == Row(0, 1, 0, "1.2.3.<PHONE>"), s"got $r")
  }

  test("null text yields a null struct, like the regexp chain") {
    val r = Seq[Option[String]](None, Some("a@b.co")).toDF("s")
      .select(TextOps.piiScan($"s").as("p")).orderBy($"p".asc_nulls_first)
      .collect()
    assert(r(0).isNullAt(0))
    assert(r(1).getStruct(0).getInt(0) == 1)
  }

  test("non-string input fails at analysis time") {
    val e = intercept[Exception] {
      Seq(1, 2).toDF("s").select(TextOps.piiScan($"s")).collect()
    }
    assert(e.getMessage.contains("pii_scan") ||
      e.getMessage.toLowerCase.contains("data type mismatch"))
  }

  test("t09-shaped projection evaluates the scan once per row (CSE)") {
    import graft.functions.PiiExpressions
    val df = composites(200).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "s")
      .repartition(4)
    val pii = TextOps.piiScan($"s")
    val q = df.select($"doc_id",
      pii.getField("n_emails").cast("long").as("n_emails"),
      pii.getField("n_phones").cast("long").as("n_phones"),
      pii.getField("n_ips").cast("long").as("n_ips"),
      pii.getField("redacted").as("redacted"))
    PiiExpressions.scanCalls.reset()
    val n = q.collect().length
    val calls = PiiExpressions.scanCalls.sum()
    assert(n == 200)
    // subexpression elimination must fold the four GetStructField
    // projections onto ONE scan per row — 4× would mean CSE regressed
    assert(calls == n, s"expected $n scan calls (one per row), got $calls")
  }

  test("pii_scan is registered as a SQL function") {
    new GraftExtensions().registerOn(spark)
    val r = spark.sql(
      "SELECT pii_scan('mail me a@b.co or 10.1.2.3').redacted AS red")
      .as[String].head()
    assert(r == "mail me <EMAIL> or <IP>")
  }
}
