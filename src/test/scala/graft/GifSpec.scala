package graft

import org.apache.spark.sql.functions._

import graft.ops.GifOps

/** GIF/LZW conformance — the frame-sample member of the multimodal
  * codec family. Both directions against the JDK: our streams must
  * decode in ImageIO frame-for-frame, and ImageIO-WRITTEN GIFs (an
  * independent real LZW compressor, variable-width codes and all)
  * must decode in OUR decoder pixel-for-pixel — the strongest test of
  * the dictionary rebuild (clear handling, width growth, KwKwK).
  */
class GifSpec extends SparkTestBase {

  import spark.implicits._

  /** Grayscale palette image the JDK writes losslessly. */
  private def indexedImage(w: Int, h: Int, px: Array[Byte]): java.awt.image.BufferedImage = {
    val gray = Array.tabulate(256)(_.toByte)
    val cm = new java.awt.image.IndexColorModel(8, 256, gray, gray, gray)
    val bi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
    bi.getRaster.setDataElements(0, 0, w, h, px)
    bi
  }

  private def jdkWriteGif(w: Int, h: Int, px: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(indexedImage(w, h, px), "gif", bos))
    bos.toByteArray
  }

  /** All frames of a GIF via the JDK reader, as gray values (our
    * palette is i→(i,i,i), so gray == index).
    */
  private def jdkReadFrames(gif: Array[Byte]): Seq[Array[Int]] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(gif))
    val readers = javax.imageio.ImageIO.getImageReaders(iis)
    assert(readers.hasNext, "no GIF reader")
    val reader = readers.next()
    reader.setInput(iis)
    val n = reader.getNumImages(true)
    (0 until n).map { i =>
      val bi = reader.read(i)
      val out = new Array[Int](bi.getWidth * bi.getHeight)
      var p = 0
      var y = 0
      while (y < bi.getHeight) {
        var x = 0
        while (x < bi.getWidth) {
          out(p) = bi.getRGB(x, y) & 0xff // gray palette: B == index
          p += 1; x += 1
        }
        y += 1
      }
      out
    }
  }

  test("own-encoded animations round-trip exactly and decode in the JDK") {
    val w = 11; val h = 7
    val frames = Seq(
      Array.tabulate(w * h)(i => ((i * 13) % 256).toByte),
      Array.tabulate(w * h)(i => ((i * i + 5) % 256).toByte),
      Array.fill(w * h)(0.toByte),
      Array.fill(w * h)(255.toByte),
      Array.tabulate(w * h)(i => (255 - i % 256).toByte))
    val gif = GifOps.encodeGifFrames(w, h, frames)
    val dec = GifOps.decodeGifFrames(gif)
    assert((dec.width, dec.height, dec.frames.size) == ((w, h, 5)))
    frames.zip(dec.frames).zipWithIndex.foreach { case ((e, g), i) =>
      assert(g.toSeq == e.toSeq, s"frame $i self round-trip")
    }
    val jdk = jdkReadFrames(gif)
    assert(jdk.size == 5, s"JDK saw ${jdk.size} frames")
    frames.zip(jdk).zipWithIndex.foreach { case ((e, j), i) =>
      assert(j.toSeq == e.map(_ & 0xff).toSeq, s"frame $i JDK decode")
    }
  }

  test("ImageIO-written GIFs (real variable-width LZW) decode in OUR decoder") {
    // content chosen to build deep dictionaries: repetitive rows grow
    // multi-byte entries and push the code width past 9 bits; the
    // noise fixture stresses the clear/KwKwK paths
    val cases = Seq(
      (64, 48, (i: Int) => ((i / 64) % 2 * 17 + (i % 8)).toByte),      // stripes
      (90, 90, (i: Int) => ((i * 2654435761L >>> 24) & 0xff).toByte), // noise
      (33, 21, (i: Int) => (i % 7).toByte),                            // tiny alphabet
      (16, 16, (i: Int) => 42.toByte))                                 // constant
    cases.foreach { case (w, h, f) =>
      val px = Array.tabulate(w * h)(f)
      val gif = jdkWriteGif(w, h, px)
      val dec = GifOps.decodeGifFrames(gif)
      assert((dec.width, dec.height) == ((w, h)))
      assert(dec.frames.size == 1)
      assert(dec.frames.head.toSeq == px.toSeq,
        s"${w}x$h: our decode of the JDK's LZW differs")
    }
  }

  test("profile rejections by name") {
    intercept[IllegalArgumentException](
      GifOps.decodeGifFrames("GIF42x not really".getBytes))
    val gif = GifOps.encodeGifFrames(8, 8, Seq(Array.fill(64)(1.toByte)))
    // our layout is fixed: header(6) + LSD(7) + GCT(768) + GCE(8) puts
    // the image descriptor at 789 (indexOfSlice would find 0x2c bytes
    // inside the palette)
    val idOff = 789
    assert((gif(idOff) & 0xff) == 0x2c, f"descriptor not at $idOff")
    // local color table: named rejection
    val bad = gif.clone()
    bad(idOff + 9) = 0x80.toByte
    val e = intercept[IllegalArgumentException](GifOps.decodeGifFrames(bad))
    assert(e.getMessage.contains("local color"), e.getMessage)
    // truncated mid-extension (no terminator before EOF): named error,
    // not ArrayIndexOutOfBoundsException
    val truncated = gif.take(789 - 2) // cut inside the GCE sub-blocks
    val e2 = intercept[IllegalArgumentException](
      GifOps.decodeGifFrames(truncated))
    assert(e2.getMessage.toLowerCase.contains("truncated"), e2.getMessage)
    // degenerate 0-width header: named rejection, not silent nonsense
    val zeroW = gif.clone()
    zeroW(6) = 0; zeroW(7) = 0
    val e3 = intercept[IllegalArgumentException](GifOps.decodeGifFrames(zeroW))
    assert(e3.getMessage.contains("degenerate"), e3.getMessage)
  }

  test("interlaced streams de-interlace correctly (round-trip through permutation)") {
    // build an interlaced variant of our own stream by permuting rows
    // into GIF pass order before encode and setting the flag — decode
    // must return the ORIGINAL row order
    val w = 9; val h = 13
    val px = Array.tabulate(w * h)(i => ((i * 37) % 256).toByte)
    val passOrder = Seq((0, 8), (4, 8), (2, 4), (1, 2)).flatMap {
      case (s, st) => s until h by st }
    val streamed = new Array[Byte](w * h)
    passOrder.zipWithIndex.foreach { case (y, src) =>
      System.arraycopy(px, y * w, streamed, src * w, w) }
    val gif = GifOps.encodeGifFrames(w, h, Seq(streamed))
    val idOff = 789
    assert((gif(idOff) & 0xff) == 0x2c)
    gif(idOff + 9) = 0x40.toByte // mark interlaced
    val dec = GifOps.decodeGifFrames(gif)
    assert(dec.frames.head.toSeq == px.toSeq, "de-interlace mismatch")
  }

  test("m16 plumbing: frame sampling keeps every stride-th frame with exact features") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).limit(40)
    val gifs = GifOps.textToGifOwn(docs, "doc_id", "text")
    val rows = GifOps.gifFrameSample(gifs, "id", "gif", stride = 2)
      .as[(Long, Int, Int, Long, Int, Int)].collect()
    assert(rows.length == 80) // 2 sampled frames (0, 2) per doc
    val texts = docs.as[(Long, String)].collect().toMap
    rows.foreach { case (id, nFrames, f, sum, mn, mx) =>
      assert(nFrames == 4 && (f == 0 || f == 2))
      val cps = Option(texts(id)).getOrElse("").codePoints().toArray
      val n = cps.length.toLong
      val v = if (n > 0) cps(((f * n) / 4).toInt) % 256 else 0
      assert(sum == 64L * v && mn == v && mx == v, s"doc $id frame $f")
    }
  }

  test("animation timing round-trips: per-frame delay/disposal + NETSCAPE loop") {
    val frames = (0 until 3).map(f => Array.fill(6)((f * 10).toByte))
    val gif = GifOps.encodeGifAnimation(3, 2, frames,
      delays = Seq(5, 120, 65535), disposals = Seq(0, 2, 3), loopCount = 7)
    val t = GifOps.gifTimingMeta(gif)
    assert(t.width == 3 && t.height == 2 && t.loopCount == 7)
    assert(t.frames == Seq((5, 0, -1), (120, 2, -1), (65535, 3, -1)))
    // pixels are untouched by the metadata additions
    val d = GifOps.decodeGifFrames(gif)
    assert(d.frames.map(_.toSeq) == frames.map(_.toSeq))
    // loop = 0 (forever) is distinct from "no NETSCAPE block" (-1)
    val loop0 = GifOps.encodeGifAnimation(3, 2, frames,
      Seq(1, 1, 1), Seq(0, 0, 0), loopCount = 0)
    assert(GifOps.gifTimingMeta(loop0).loopCount == 0)
    val noLoop = GifOps.encodeGifAnimation(3, 2, frames,
      Seq(1, 1, 1), Seq(0, 0, 0), loopCount = -1)
    assert(GifOps.gifTimingMeta(noLoop).loopCount == -1)
  }

  test("timing walk skips pixels: byte-identical meta from a corrupted-LZW stream") {
    // metadata-only contract: flipping bits INSIDE the LZW payload
    // must not change (or crash) the timing scan — it never inflates
    val frames = Seq(Array.fill(6)(7.toByte))
    val gif = GifOps.encodeGifAnimation(3, 2, frames, Seq(42), Seq(1), 3)
    val before = GifOps.gifTimingMeta(gif)
    // find the image separator then corrupt a byte inside its data
    val imgPos = gif.indexOfSlice(Seq(0x2c, 0, 0, 0, 0).map(_.toByte))
    assert(imgPos > 0)
    val broken = gif.clone()
    broken(imgPos + 13) = (broken(imgPos + 13) ^ 0x55).toByte
    assert(GifOps.gifTimingMeta(broken) == before)
    // ...while the pixel decoder DOES see the corruption (either a
    // named decode error or different pixels — never the same frame)
    val decoded =
      try Some(GifOps.decodeGifFrames(broken).frames.map(_.toSeq))
      catch { case _: Exception => None }
    assert(!decoded.contains(frames.map(_.toSeq)))
  }

  test("hostile timing headers: truncated GCE / bad sizes are named errors") {
    val frames = Seq(Array.fill(6)(1.toByte))
    val ok = GifOps.encodeGifAnimation(3, 2, frames, Seq(10), Seq(0), -1)
    // truncate inside the GCE (find 0x21 0xf9 and cut 3 bytes after)
    val gcePos = ok.indexOfSlice(Seq(0x21, 0xf9).map(_.toByte))
    assert(gcePos > 0)
    val cut = ok.take(gcePos + 3)
    val e1 = intercept[IllegalArgumentException](GifOps.gifTimingMeta(cut))
    assert(e1.getMessage.toLowerCase.contains("truncated"))
    // GCE with a wrong block size is refused by name
    val badSize = ok.clone()
    badSize(gcePos + 2) = 9
    val e2 = intercept[IllegalArgumentException](GifOps.gifTimingMeta(badSize))
    assert(e2.getMessage.contains("block size"))
    // a frame with NO preceding GCE defaults to (0 cs, disposal 0)
    val bare = GifOps.encodeGifFrames(3, 2, frames) // has GCE, delay 10
    assert(GifOps.gifTimingMeta(bare).frames == Seq((10, 0, -1)))
  }

  test("empty NETSCAPE sub-block list near EOF is spec-valid, not truncated") {
    // an application extension may carry ZERO data sub-blocks (the
    // terminator immediately); placed as the LAST thing before the
    // trailer there are only 2 bytes after the identifier — a walk
    // that unconditionally demands the 4 loop-count bytes mis-rejects
    val frames = Seq(Array.fill(6)(1.toByte))
    val ok = GifOps.encodeGifAnimation(3, 2, frames, Seq(10), Seq(0), -1)
    val emptyExt = Array(0x21, 0xff, 0x0b).map(_.toByte) ++
      "NETSCAPE2.0".getBytes("US-ASCII") ++ Array(0x00.toByte) // terminator
    val withExt = ok.dropRight(1) ++ emptyExt ++ Array(0x3b.toByte)
    val t = GifOps.gifTimingMeta(withExt)
    assert(t.loopCount == -1, "empty extension carries no loop count")
    assert(t.frames == Seq((10, 0, -1)))
  }

  test("ImageIO-written GIF (no GCE at all) yields default timing, not a crash") {
    val px = Array.tabulate(12)(i => (i * 3).toByte)
    val gif = jdkWriteGif(4, 3, px)
    val t = GifOps.gifTimingMeta(gif)
    assert(t.frames.size == 1)
    // a single ImageIO still frame carries either no GCE (defaults)
    // or a zero-delay GCE — both surface as delay 0, disposal 0
    assert(t.frames.head._1 == 0 && t.frames.head._2 == 0)
  }

  test("m19 plumbing: timing census matches the closed forms incl. t_start_cs") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).limit(30)
    val gifs = GifOps.textToAnimatedGifOwn(docs, "doc_id", "text")
    val rows = GifOps.gifTiming(gifs, "id", "gif")
      .as[(Long, Int, Int, Int, Int, Int, Long)].collect()
    assert(rows.length == 120) // 4 frames per doc
    val texts = docs.as[(Long, String)].collect().toMap
    rows.groupBy(_._1).foreach { case (id, fr) =>
      val cps = Option(texts(id)).getOrElse("").codePoints().toArray
      val n = cps.length.toLong
      def point(f: Int) = if (n > 0) cps(((f * n) / 4).toInt) % 256 else 0
      var expectStart = 0L
      fr.sortBy(_._3).foreach { case (_, nf, f, delay, disp, loop, tStart) =>
        assert(nf == 4 && delay == point(f) % 200 + 1 && disp == f % 4)
        assert(loop == (cps.length % 5))
        assert(tStart == expectStart, s"doc $id frame $f")
        expectStart += delay
      }
    }
  }
}
