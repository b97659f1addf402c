package graft

import org.apache.spark.sql.functions._

import graft.ops.{MultimodalOps, PhashKernel, PngOps}

/** Round-13 additions: the real PNG codec (encode → independent
  * decode round-trips), the session-gap boundary rule the seed audit
  * caught, and the funnel/cross-sell census reports.
  */
class Round13Spec extends SparkTestBase {

  import spark.implicits._

  test("PngOps round-trip: encode -> decode returns the exact pixels") {
    val w = 13; val h = 7
    val px = Array.tabulate(w * h)(i => ((i * 37 + 11) % 256).toByte)
    val png = PngOps.encodeGray8(w, h, px)
    // spec-computed layout: 8 sig + 25 IHDR + (12 + raw + 11) IDAT + 12 IEND
    assert(png.length == 68 + h * (w + 1))
    val img = PngOps.decodeGray8(png)
    assert(img.width == w && img.height == h)
    assert(img.pixels.toSeq == px.toSeq)
  }

  test("PngOps.decodeGray8 reads PNGs written by a REAL encoder (ImageIO)") {
    // ImageIO's PNG writer uses real DEFLATE compression and its own
    // row-filter choices — decoding its output proves the inflate +
    // all-filters path, not just our stored-block profile
    val w = 31; val h = 17
    val bi = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val expected = Array.tabulate(w * h)(i => ((i * i + 3 * i) % 256).toByte)
    bi.getRaster.setDataElements(0, 0, w, h, expected)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bi, "png", bos))
    val img = PngOps.decodeGray8(bos.toByteArray)
    assert(img.width == w && img.height == h)
    assert(img.pixels.toSeq == expected.toSeq)
  }

  test("PngOps.decodeGray8 rejects corrupt bytes (CRC, signature, profile)") {
    val png = PngOps.encodeGray8(4, 4, Array.fill(16)(7.toByte))
    // flip one pixel byte inside IDAT: chunk CRC must catch it
    val corrupt = png.clone()
    corrupt(50) = (corrupt(50) ^ 0x5a).toByte
    intercept[IllegalArgumentException](PngOps.decodeGray8(corrupt))
    intercept[IllegalArgumentException](
      PngOps.decodeGray8("not a png at all".getBytes))
    // RGB PNGs are outside the grayscale-8 profile: must throw, not
    // silently misread
    val rgb = new java.awt.image.BufferedImage(
      2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(rgb, "png", bos)
    intercept[IllegalArgumentException](PngOps.decodeGray8(bos.toByteArray))
  }

  test("pngPhash over an 8x8 PNG equals the text-raster phash56 (m11 ≡ m05 kernel)") {
    val docs = Seq((1L, "key agg row scan slow fast table value"),
        (2L, "batch window spark order data column agg"))
      .toDF("doc_id", "text")
      .withColumn("w", lit(8)).withColumn("h", lit(8))
    val hashed = PngOps.pngPhash(
      PngOps.textToPng(docs, "doc_id", "text", "w", "h"), "id", "png")
      .select($"id", $"sh").as[(Long, Long)].collect().toMap
    docs.select($"doc_id", $"text").as[(Long, String)].collect().foreach {
      case (id, text) =>
        val direct = PhashKernel.phash56(
          org.apache.spark.unsafe.types.UTF8String.fromString(text))
        assert(hashed(id) == direct,
          s"doc $id: png path ${hashed(id)} != text path $direct")
    }
  }

  test("session_window boundary: an event at exactly last+gap MERGES (q27 oracle rule)") {
    // the rule the round-13 seed audit pinned: Spark coalesces
    // session windows that touch, so gap == 1800 is the SAME session
    val df = Seq((1L, 0L), (1L, 1800L), (2L, 0L), (2L, 1801L))
      .toDF("user_id", "ts_sec")
    val sessions = df
      .groupBy(session_window(timestamp_seconds($"ts_sec"), "1800 seconds"),
        $"user_id")
      .agg(count(lit(1)).as("n"))
      .groupBy($"user_id").agg(count(lit(1)).as("n_sessions"))
      .as[(Long, Long)].collect().toMap
    assert(sessions(1L) == 1L, "touching windows must merge")
    assert(sessions(2L) == 2L, "strictly-greater gap must split")
  }

  test("m10's ImageIO decode is header-only on our PNGs and gets real dims") {
    val docs = Seq((5L, "spark table scan", 5, 3)).toDF("doc_id", "text", "w", "h")
    val pngs = PngOps.textToPng(docs, "doc_id", "text", "w", "h")
    val meta = MultimodalOps.decodeMeta(pngs, "id", "png",
      MultimodalOps.ImageIoDecoder).collect().head
    assert(meta.format == "png" && meta.width == 5 && meta.height == 3)
    assert(meta.nBytes == 68 + 3 * 6)
  }

  test("mergeable top-k: bounds are sound and the guarantee flag is honest") {
    import graft.ops.TextOps
    // shard A: x dominates, y is mid, z hides below the top-2 cut;
    // shard B: z dominates, x hides below the cut — the merged truth
    // (x=7, z=6, y=3, w=3) is only PARTIALLY visible from k=2 summaries
    val docs = Seq(
      ("A", "x x x x y y y z w"),   // A counts: x=4 y=3 z=1 w=1, tail(k=2)=1
      ("B", "z z z z z x x x w w")  // B counts: z=5 x=3 w=2, tail(k=2)=2
    ).toDF("source", "text")
    val sums = TextOps.topkSummaries(docs, "source", "text", k = 2)
    // kept: A→(x,4),(y,3) tail 1; B→(z,5),(x,3) tail 2
    val kept = sums.as[(String, String, Long, Long)].collect().toSet
    assert(kept == Set(("A", "x", 4L, 1L), ("A", "y", 3L, 1L),
      ("B", "z", 5L, 2L), ("B", "x", 3L, 2L)))
    val merged = TextOps.topkFromSummaries(sums, k = 3)
      .as[(Int, String, Long, Long, Int)].collect().toSeq
    // x kept in BOTH shards: lb = ub = 7 (exact). z kept only in B:
    // lb 5, ub 5 + tail(A) = 6. y kept only in A: lb 3, ub 3+2 = 5.
    assert(merged == Seq((1, "x", 7L, 7L, 1), (2, "z", 5L, 6L, 1),
      (3, "y", 3L, 5L, 0)))
    // soundness vs the exact truth: every bound brackets the true count
    val truth = Map("x" -> 7L, "z" -> 6L, "y" -> 3L)
    merged.foreach { case (_, t, lb, ub, _) =>
      assert(lb <= truth(t) && truth(t) <= ub, s"$t [$lb,$ub]") }
    // the guarantee is honest AND strict: y at lb=3 is NOT guaranteed —
    // the total tail is 3 and w (never kept anywhere) really does total
    // 3, tying y and displacing it under the count-then-token ordering;
    // x and z strictly beat both the excluded max-ub and total_tail=3
  }

  test("morton interleave: even bits from x, odd bits from y") {
    import graft.ops.Layout
    val r = Seq((10L, 6L)).toDF("x", "y")
      .select(Layout.mortonInterleave16(col("x"), col("y")).as("m"))
      .as[Long].head()
    // x=1010b → bits 2,6; y=0110b → bits 3,5 ⇒ 4+64+8+32
    assert(r == 108L)
  }

  test("zorder skipping: sound pruning, 2-D predicate wins, 1-D keeps the linear edge") {
    import graft.ops.Layout
    // uniform 64×64 grid — fully deterministic chunk boxes
    val grid = spark.range(64 * 64)
      .selectExpr("id div 64 AS x", "id % 64 AS y")
    def report(xLo: Long, xHi: Long, yLo: Long, yHi: Long) =
      Layout.zorderSkippingReport(grid, "x", "y", xLo, xHi, yLo, yHi)
        .as[(String, Long, Long, Long, Long, Long, Double)]
        .collect().map(r => r._1 -> r).toMap
    // 2-D rectangle (quarter × quarter): Z-prefix chunks cluster both
    // dims, the time-linear layout must scan every x for the y-window
    val rect = report(0, 15, 0, 15)
    for ((_, (_, nChunks, scanned, total, rowsScanned, matching, amp))
         <- rect) {
      assert(total == 4096L && matching == 256L)
      assert(scanned <= nChunks && rowsScanned >= matching)
      assert(amp == rowsScanned.toDouble / matching)
    }
    assert(rect("zorder")._5 < rect("linear")._5,
      s"zorder must out-prune linear on a 2-D predicate: $rect")
    // 1-D y-slab (full x range): the y-sorted linear layout is optimal
    // there — zorder's honest trade-off
    val slab = report(0, 63, 0, 15)
    assert(slab("linear")._5 <= slab("zorder")._5,
      s"linear must keep the 1-D edge: $slab")
    assert(slab("linear")._6 == 1024L)
  }

  test("zorder skipping: an overflow-wide span raises, never reports garbage") {
    import graft.ops.Layout
    // (v - min) * 65535 would wrap Long for this y span — the plan
    // must raise the named guard, not emit plausible wrong chunks
    val wide = Seq((0L, 0L), (1L, Long.MaxValue / 65535L + 10))
      .toDF("x", "y")
    val e = intercept[Exception] {
      Layout.zorderSkippingReport(wide, "x", "y", 0, 1, 0, 1).collect()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") + msgs(t.getCause)
    assert(msgs(e).contains("span exceeds"), msgs(e))
  }
}
