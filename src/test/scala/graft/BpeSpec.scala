package graft

import org.apache.spark.sql.functions._

import graft.ops.BpeOps

/** BPE trainer semantics the oracle can't see: the greedy-merge
  * unroll's edge cases, the maxLen guard, and monotonicity of the
  * learned segmentation.
  */
class BpeSpec extends SparkTestBase {

  import spark.implicits._

  /** Driver-side reference greedy left-to-right non-overlapping merge. */
  private def refMerge(syms: Seq[String], x: String, y: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == x && syms(i + 1) == y) {
        out += (x + y); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  test("applyMerge unroll is bit-identical to the reference greedy merge") {
    // overlap runs, boundary positions, no-ops, and repeated pairs
    val cases = Seq(
      (Seq("a", "a", "a"), "a", "a"),           // overlap: -> [aa, a]
      (Seq("a", "a", "a", "a"), "a", "a"),      // -> [aa, aa]
      (Seq("a", "b", "a", "b"), "a", "b"),      // two fires
      (Seq("x", "a", "b"), "a", "b"),           // fire at the tail
      (Seq("a", "b"), "b", "a"),                // no fire
      (Seq("q"), "a", "b"),                     // single symbol
      (Seq("a", "b", "b", "a", "b", "b", "a", "b"), "a", "b"),
      (Seq("e", "r", "e", "r", "e", "r", "e", "r"), "e", "r"))
    val df = cases.zipWithIndex
      .map { case ((syms, x, y), i) => (i, syms, x, y) }
      .toDF("i", "syms", "x", "y")
    cases.zipWithIndex.foreach { case ((syms, x, y), i) =>
      val got = df.where($"i" === i)
        .select(BpeOps.applyMerge($"syms", x, y, 8).as("m"))
        .as[Seq[String]].head()
      assert(got == refMerge(syms, x, y), s"case $i: $syms merge ($x,$y)")
    }
  }

  test("train on a tiny weighted corpus picks the weighted argmax with lexicographic ties") {
    // "ab" x3 (pair (a,b) count 3), "cd" x3 (count 3) -> tie, (a,b) wins
    // lexicographically; round 2 then merges (c,d).
    val corpus = Seq((1L, "ab ab ab cd cd cd")).toDF("doc_id", "text")
    val (merges, words) = BpeOps.train(corpus, "text", rounds = 2)
    assert(merges.map(m => (m.round, m.w1, m.w2, m.n)) ==
      Seq((1, "a", "b", 3L), (2, "c", "d", 3L)))
    val state = words.select($"word", $"syms").as[(String, Seq[String])]
      .collect().toMap
    assert(state("ab") == Seq("ab") && state("cd") == Seq("cd"))
  }

  test("train fails fast on words longer than the unroll bound") {
    val corpus = Seq((1L, "tiny enormous9")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      BpeOps.train(corpus, "text", rounds = 1, maxLen = 8)
    }
    assert(e.getMessage.contains("enormous9"))
  }

  test("train caches per round: no executed plan re-scans the corpus file") {
    // Regression guard for the O(rounds²) lineage recompute: without
    // the per-round persist, every round's top-pair collect re-reads
    // the parquet and re-applies all prior merges (≥1 FileSourceScan
    // per round). With it, rounds read the predecessor's cache — the
    // corpus file appears in NO per-round executed plan (the single
    // real read happens inside the first cache build, which plans as
    // an InMemoryTableScan here).
    import org.apache.spark.sql.execution.{FileSourceScanExec, QueryExecution, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.util.QueryExecutionListener
    def fileScans(p: SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => fileScans(a.executedPlan)
      case _: FileSourceScanExec => 1
      case other => other.children.map(fileScans).sum
    }
    val seen = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new QueryExecutionListener {
      override def onSuccess(fn: String, qe: QueryExecution, ns: Long): Unit =
        seen.addAndGet(fileScans(qe.executedPlan))
      override def onFailure(fn: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val docs = Tables.documents(spark, sf).select("doc_id", "text")
      val (merges, words) = BpeOps.train(docs, "text", rounds = 4, maxLen = 8)
      assert(merges.size == 4)
      words.unpersist(blocking = true)
      // listener dispatch is async on the shared bus: poll to quiescence
      var last = -1; var stable = 0
      while (stable < 5) {
        Thread.sleep(200)
        val v = seen.get()
        if (v == last) stable += 1 else { stable = 0; last = v }
      }
      assert(seen.get() == 0,
        s"${seen.get()} FileSourceScans executed during a 4-round train — " +
          "per-round cache regressed to lineage recompute")
    } finally spark.listenerManager.unregister(listener)
  }

  test("segmentation: subwords bounded by chars and tokens; more rounds never split finer") {
    val sample = docsSample
    val seg2 = BpeOps.segmentCounts(sample, "doc_id", "text", rounds = 2)
    val seg6 = BpeOps.segmentCounts(sample, "doc_id", "text", rounds = 6)
    val joined = seg2.select($"doc_id", $"n_tokens", $"n_subwords".as("s2"))
      .join(seg6.select($"doc_id", $"n_subwords".as("s6")), Seq("doc_id"))
      .join(sample.select($"doc_id",
        (length($"text") - (size(split($"text", " ")) - 1)).as("n_chars")),
        Seq("doc_id"))
    // tokens <= subwords <= chars, and rounds only coarsen
    assert(joined.where($"s2" < $"n_tokens" || $"s2" > $"n_chars").count() == 0)
    assert(joined.where($"s6" > $"s2").count() == 0)
    assert(joined.where($"s6" < $"s2").count() > 0, "merges never fired")
  }

  private def docsSample = Tables.documents(spark, sf).limit(120)
}
