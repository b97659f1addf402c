package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Round-15 pins: the cdcApplyStream n_ops-across-resurrection
  * CONTRACT (spec-asserted both ways, per the round-14 verdict's
  * item 5), and the m13 exact-JPEG fixture rule's Spark-side phash
  * parity with the pure-Scala kernel.
  */
class Round15Spec extends SparkTestBase {

  import spark.implicits._

  test("cdcApplyStream n_ops contract: within-batch resurrection keeps the " +
    "full count; cross-batch resurrection restarts it and the tombstone " +
    "emission carries the missing prefix") {
    import graft.ops.EventOps
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long, String, Double)]
    val q = EventOps.cdcApplyStream(input.toDS())
      .writeStream.format("memory").queryName("cdc_nops")
      .outputMode("update").start()
    try {
      // k1: within-batch I → D → I (slot never freed mid-batch, so the
      //     count survives — matches batch exactly)
      // k2: I in batch 1, D in batch 2 (slot FREED), I in batch 3 —
      //     the documented divergence: state restarts at resurrection
      input.addData((1L, 10L, 0L, "I", 1.0), (1L, 20L, 0L, "D", 0.0),
        (1L, 30L, 0L, "I", 3.0), (2L, 10L, 0L, "I", 5.0))
      q.processAllAvailable()
      input.addData((2L, 20L, 0L, "D", 0.0))
      q.processAllAvailable()
      input.addData((2L, 30L, 0L, "I", 7.0))
      q.processAllAvailable()

      val emitted = spark.table("cdc_nops")
        .select($"k", $"value", $"n_ops", $"last_seq", $"present")
        .as[(Long, Double, Long, Long, Boolean)].collect()

      // within-batch delete+re-insert: FULL count (3 ops), like batch
      val k1 = emitted.filter(_._1 == 1L).maxBy(_._4)
      assert(k1 == ((1L, 3.0, 3L, 30L, true)), k1.toString)

      // cross-batch: the post-resurrection emission counts ops SINCE
      // the resurrection (1), not since the beginning (3) — this is
      // the contract, not a bug: the delete genuinely freed the slot
      // (state ∝ live keys)
      val k2Final = emitted.filter(_._1 == 2L).maxBy(_._4)
      assert(k2Final == ((2L, 7.0, 1L, 30L, true)), k2Final.toString)

      // batch replay of the same multiset keeps the full count — the
      // two sides DIVERGE on n_ops by design...
      val opsDf = Seq(
        (2L, 10L, 0L, "I", 5.0), (2L, 20L, 0L, "D", 0.0),
        (2L, 30L, 0L, "I", 7.0)).toDF("k", "seq", "sub", "op", "value")
      val batch = EventOps.cdcApply(opsDf, Seq("k"), Seq("seq", "sub"),
        "op", Seq("value")).as[(Long, Double, Long, Long)].collect().head
      assert(batch == ((2L, 7.0, 3L, 30L)))
      assert(k2Final._3 != batch._3, "divergence is the documented contract")

      // ...and the reader RECONSTRUCTS the batch count from the
      // emissions it already has: the tombstone emission (present =
      // false) carries the pre-delete prefix; prefix + ops-since-
      // resurrection = the batch total. Nothing is lost — it lives
      // downstream instead of in the state store.
      val k2Tombstone = emitted.filter(t => t._1 == 2L && !t._5).maxBy(_._4)
      assert(k2Tombstone._3 == 2L, k2Tombstone.toString) // I + D
      assert(k2Tombstone._3 + k2Final._3 == batch._3,
        "tombstone prefix + resurrection count must equal the batch total")

      // value and last_seq agree on BOTH sides regardless — the
      // divergence is n_ops-only (the snapshot-≡-batch pin in
      // Round14Spec covers the general case)
      assert((k2Final._2, k2Final._4) == ((batch._2, batch._4)))
    } finally q.stop()
  }

  test("m13 fixture rule: jpegPhash over own-encoded block-constant JPEGs " +
    "equals the kernel phash of the raw block grid") {
    import graft.ops.{JpegOps, PhashKernel}
    // the full Spark path (encode → entropy decode → IDCT → 8x8 grid
    // sample → DCT kernel) must equal the pure function of the text —
    // the same identity m13's SQL oracle recomputes
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .limit(50)
    val jpegs = JpegOps.textToJpegOwn(docs, "doc_id", "text")
    val got = JpegOps.jpegPhash(jpegs, "id", "jpeg")
      .select($"id", $"sh").as[(Long, Long)].collect().toMap
    val texts = docs.as[(Long, String)].collect()
    assert(texts.nonEmpty)
    texts.foreach { case (id, text) =>
      val cps = Option(text).getOrElse("").codePoints().toArray
      val n = cps.length.toLong
      def blockVal(b: Int): Long =
        if (n > 0) (cps(((b * n) / 4).toInt) % 256).toLong else 0L
      // grid cell (gy, gx) samples pixel (2gy, 2gx) → block (gy/4)*2+(gx/4)
      val grid = Array.tabulate(64) { c =>
        blockVal((c / 8 / 4) * 2 + (c % 8 / 4))
      }
      assert(got(id) == PhashKernel.phash56FromGrid(grid), s"doc $id")
    }
  }
}
