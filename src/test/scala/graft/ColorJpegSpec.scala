package graft

import org.apache.spark.sql.functions._

import graft.ops.JpegOps

/** Baseline YCbCr 4:2:0 conformance — the color twin of JpegSpec:
  * our interleaved-MCU encoder/decoder pair must (a) be readable by
  * the JDK's independent decoder, (b) round-trip block-constant
  * fixtures EXACTLY per component (m14's oracle contract), and
  * (c) reject out-of-profile streams by name.
  */
class ColorJpegSpec extends SparkTestBase {

  import spark.implicits._

  private def jdkRgb(jpeg: Array[Byte]): java.awt.image.BufferedImage =
    javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpeg))

  /** Block-constant 16×16 planes from six component values. */
  private def planes(v: Int => Int): (Array[Byte], Array[Byte], Array[Byte]) =
    (JpegOps.blockConstantRaster16(b => v(b).toByte),
      Array.fill(64)(v(4).toByte), Array.fill(64)(v(5).toByte))

  test("block-constant color fixtures round-trip the lossy codec EXACTLY") {
    // the m14 contract: constant 8×8 blocks are DC-only per component,
    // so decode∘encode must be the identity on every plane — this is
    // what licenses the SQL oracle to recompute luma phash + RGB from
    // the raw block values
    val probes = Seq[Int => Int](
      b => Seq(0, 255, 128, 1, 90, 240)(b),
      b => Seq(127, 129, 64, 192, 16, 203)(b),
      b => b * 51,
      _ => 0, _ => 255)
    probes.foreach { f =>
      Seq(0, 1, 3).foreach { rst =>
        val (y, cb, cr) = planes(f)
        val jpeg = JpegOps.encodeYCbCr420Baseline(16, 16, y, cb, cr, rst)
        val img = JpegOps.decodeYCbCr420Baseline(jpeg)
        assert((img.width, img.height) == ((16, 16)))
        assert(img.y.toSeq == y.toSeq, s"rst=$rst: luma not identity")
        assert(img.cb.toSeq == cb.toSeq, s"rst=$rst: Cb not identity")
        assert(img.cr.toSeq == cr.toSeq, s"rst=$rst: Cr not identity")
      }
    }
    // exhaustive luma sweep with fixed chroma, and chroma sweep with
    // fixed luma — every 0..255 value must survive per component
    (0 to 255 by 5).foreach { v =>
      val (y, cb, cr) = planes(b => if (b < 4) v else 77 + b)
      val img = JpegOps.decodeYCbCr420Baseline(
        JpegOps.encodeYCbCr420Baseline(16, 16, y, cb, cr, 1))
      assert(img.y.toSeq == y.toSeq && img.cb.toSeq == cb.toSeq &&
        img.cr.toSeq == cr.toSeq, s"value $v did not round-trip")
    }
  }

  test("our color streams decode in the JDK; RGB matches the fixed-point transform") {
    // cross-implementation: the JDK must read OUR interleaved 4:2:0
    // stream, and on CONSTANT-chroma fixtures (upsampling-invariant)
    // its RGB must match our libjpeg-exact integer transform
    val probes = Seq[Int => Int](
      b => Seq(200, 30, 120, 250, 90, 203)(b),
      b => Seq(0, 255, 128, 1, 16, 240)(b),
      b => 40 + b * 40)
    probes.foreach { f =>
      Seq(0, 2).foreach { rst =>
        val (y, cb, cr) = planes(f)
        val jpeg = JpegOps.encodeYCbCr420Baseline(16, 16, y, cb, cr, rst)
        val bi = jdkRgb(jpeg)
        assert(bi.getWidth == 16 && bi.getHeight == 16)
        // compare at each block center (pure block interior, both
        // sampling grids agree there)
        for (py <- Seq(3, 11); px <- Seq(3, 11)) {
          val argb = bi.getRGB(px, py)
          val (jr, jg, jb) = ((argb >> 16) & 0xff, (argb >> 8) & 0xff,
            argb & 0xff)
          val yv = y(py * 16 + px) & 0xff
          val (or, og, ob) = JpegOps.ycbcrToRgb(yv, f(4), f(5))
          // JDK color conversion is libjpeg's same fixed-point tables;
          // allow 1 count for implementations that round differently
          assert(math.abs(jr - or) <= 1 && math.abs(jg - og) <= 1 &&
            math.abs(jb - ob) <= 1,
            s"($px,$py) rst=$rst: jdk=($jr,$jg,$jb) ours=($or,$og,$ob)")
        }
      }
    }
  }

  test("larger multi-MCU frames: dims parse, planes decode, ragged edges crop") {
    // 40×24 = 3×2 MCUs with a ragged right column (40 % 16 = 8): the
    // crop-copy must drop the overhang; content varies per block so
    // the interleave order (4 Y, Cb, Cr) is actually exercised —
    // pixel parity vs the JDK pins it (luma-only compare via the
    // transform inverse is unreliable; compare RGB with tolerance 2
    // at block interiors, away from chroma upsampling edges)
    val w = 40; val h = 24
    val y = Array.tabulate(w * h)(i => (((i / (8 * w)) * 5 + (i % w) / 8 * 17) % 256).toByte)
    val cw = (w + 1) / 2; val ch = (h + 1) / 2
    // chroma planes vary per 8×8 CHROMA block (row bands of 8 for Cb,
    // col bands of 8 for Cr) — actually block-constant, so the exact
    // round-trip below follows from the DC-only argument per plane
    val cb = Array.tabulate(cw * ch)(i => (((i / (8 * cw)) * 29) % 256).toByte)
    val cr = Array.tabulate(cw * ch)(i => (((i % cw) / 8 * 43) % 256).toByte)
    val jpeg = JpegOps.encodeYCbCr420Baseline(w, h, y, cb, cr, 2)
    val img = JpegOps.decodeYCbCr420Baseline(jpeg)
    assert((img.width, img.height) == ((w, h)))
    // per-plane identity: every plane is block-constant on the 8×8
    // grid by construction above, so the round-trip is exact
    assert(img.y.toSeq == y.toSeq)
    assert(img.cb.toSeq == cb.toSeq)
    assert(img.cr.toSeq == cr.toSeq)
    val bi = jdkRgb(jpeg)
    assert(bi.getWidth == w && bi.getHeight == h)
    for (py <- Seq(3, 19); px <- Seq(3, 19, 35)) {
      val argb = bi.getRGB(px, py)
      val (jr, jg, jb) = ((argb >> 16) & 0xff, (argb >> 8) & 0xff, argb & 0xff)
      val (or, og, ob) = JpegOps.ycbcrToRgb(y(py * w + px) & 0xff,
        cb(py / 2 * cw + px / 2) & 0xff, cr(py / 2 * cw + px / 2) & 0xff)
      assert(math.abs(jr - or) <= 2 && math.abs(jg - og) <= 2 &&
        math.abs(jb - ob) <= 2,
        s"($px,$py): jdk=($jr,$jg,$jb) ours=($or,$og,$ob)")
    }
  }

  test("color decoder rejects out-of-profile streams by name") {
    // grayscale stream into the color decoder: named profile error
    val gray = JpegOps.encodeGray8Baseline(16, 16,
      JpegOps.blockConstantRaster16(_ => 99.toByte))
    val e1 = intercept[IllegalArgumentException](
      JpegOps.decodeYCbCr420Baseline(gray))
    assert(e1.getMessage.contains("3-component"), e1.getMessage)
    // 4:4:4 (1x1 luma) from ImageIO? ImageIO writes 4:2:0 for
    // TYPE_INT_RGB by default on some JDKs — instead corrupt OUR
    // stream's sampling byte to 0x11 and expect the named error
    val (y, cb, cr) = planes(b => 10 + b)
    val jpeg = JpegOps.encodeYCbCr420Baseline(16, 16, y, cb, cr)
    // SOF0 is at a fixed offset for our writer: SOI(2) + APP0(18) +
    // DQT(69) = 89; sampling byte of component 1 = 89 + 2 + 2 + 7
    val sof = jpeg.indexOfSlice(Array(0xff.toByte, 0xc0.toByte))
    assert(sof > 0)
    val bad = jpeg.clone()
    bad(sof + 2 + 2 + 7) = 0x11 // Y sampling 2x2 -> 1x1
    val e2 = intercept[IllegalArgumentException](
      JpegOps.decodeYCbCr420Baseline(bad))
    assert(e2.getMessage.contains("sampling"), e2.getMessage)
    // and color bytes into the GRAY decoder stay rejected (JpegSpec
    // pins the reverse)
    val e3 = intercept[IllegalArgumentException](
      JpegOps.decodeGray8Baseline(jpeg))
    assert(e3.getMessage.contains("grayscale"), e3.getMessage)
    // out-of-baseline table ids (4-bit fields can claim 0..15 but the
    // table arrays are 0..3): named error, not AIOOBE. Corrupt the DQT
    // table id — DQT is at SOI(2) + APP0(18) = 20, id byte at 20+4
    val badTq = jpeg.clone()
    assert((badTq(20 + 1) & 0xff) == 0xdb)
    badTq(20 + 4) = 7
    val e4 = intercept[IllegalArgumentException](
      JpegOps.decodeYCbCr420Baseline(badTq))
    assert(e4.getMessage.contains("quant table id"), e4.getMessage)
    val e5 = intercept[IllegalArgumentException](
      JpegOps.decodeGray8Baseline(badTq)) // shared parser: gray too
    assert(e5.getMessage.contains("quant table id"), e5.getMessage)
  }

  test("m14 plumbing: colorJpegStats over the documents fixture") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).limit(30)
    val jpegs = JpegOps.textToColorJpegOwn(docs, "doc_id", "text")
    val stats = JpegOps.colorJpegStats(jpegs, "id", "jpeg").collect()
    assert(stats.length == 30)
    val texts = docs.as[(Long, String)].collect().toMap
    stats.foreach { r =>
      val (id, w, h) = (r.getLong(0), r.getInt(1), r.getInt(2))
      assert(w == 16 && h == 16)
      val cps = Option(texts(id)).getOrElse("").codePoints().toArray
      val n = cps.length.toLong
      def v(i: Int): Int =
        if (n > 0) cps(((i * n) / 6).toInt) % 256 else 0
      val (er, eg, eb) = JpegOps.ycbcrToRgb(v(0), v(4), v(5))
      assert((r.getInt(4), r.getInt(5), r.getInt(6)) == ((er, eg, eb)),
        s"doc $id rgb mismatch")
    }
  }
}
