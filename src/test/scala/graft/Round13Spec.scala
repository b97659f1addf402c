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
}
