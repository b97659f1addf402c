package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.types._

/** A real GIF (87a/89a) codec with full LZW — the FRAME-SAMPLE member
  * of the multimodal family: multi-frame animations are the sandbox's
  * honest stand-in for video (a public container carrying a sequence
  * of raster frames), so "sample every k-th frame, extract features"
  * runs against a real byte format instead of a stub. Decode lives in
  * `mapPartitions`; blobs never cross a shuffle (the m01 contract).
  *
  * Scope (named rejections outside it): global color table only, no
  * interlace, no local color tables, 8-bit min LZW code size. The
  * decoder implements FULL variable-width LZW (clear/EOI, dictionary
  * growth to 12 bits, the KwKwK case) — GifSpec feeds it ImageIO-
  * written GIFs (an independent real compressor) frame-for-frame.
  * The encoder emits the classic clear-flushed 9-bit stream (every
  * literal is a root code, a CLEAR every 254 codes pins the width),
  * which any conformant decoder reads — deterministic byte-for-byte.
  */
object GifOps {

  /** Decoded animation: palette indices per frame (row-major w×h);
    * the global palette is grayscale i→(i,i,i) for own-encoded
    * fixtures, but decode returns indices, not colors, so any
    * palette round-trips.
    */
  final case class GifFrames(width: Int, height: Int,
                             frames: Seq[Array[Byte]])

  // ── LSB-first bit IO (GIF packs codes little-endian, the opposite
  // of JPEG's entropy stream) ──────────────────────────────────────────
  private final class LsbBitReader(data: Array[Byte]) {
    private var acc = 0L
    private var nBits = 0
    private var pos = 0
    def read(width: Int): Int = {
      while (nBits < width) {
        require(pos < data.length, "truncated LZW stream")
        acc |= (data(pos) & 0xffL) << nBits
        nBits += 8; pos += 1
      }
      val v = (acc & ((1L << width) - 1)).toInt
      acc >>= width; nBits -= width
      v
    }
  }

  private final class LsbBitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var nBits = 0
    def write(code: Int, width: Int): Unit = {
      acc |= code.toLong << nBits
      nBits += width
      while (nBits >= 8) {
        out.write((acc & 0xff).toInt)
        acc >>= 8; nBits -= 8
      }
    }
    def finish(): Array[Byte] = {
      if (nBits > 0) out.write((acc & 0xff).toInt)
      out.toByteArray
    }
  }

  /** Full GIF LZW decode (min code size 8): variable width 9→12,
    * CLEAR resets, KwKwK first-entry case, deferred-clear tolerant.
    */
  private def lzwDecode(data: Array[Byte], expected: Int): Array[Byte] = {
    val clear = 256; val eoi = 257
    val out = new Array[Byte](expected)
    var outPos = 0
    val br = new LsbBitReader(data)
    // dictionary: prefix pointer + appended byte; entries 0..255 roots
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    var dictSize = 258
    var width = 9
    var prev = -1
    val stack = new Array[Byte](4096)
    while (outPos < expected) {
      val code = br.read(width)
      if (code == clear) {
        dictSize = 258; width = 9; prev = -1
      } else if (code == eoi) {
        require(outPos == expected,
          s"LZW EOI after $outPos of $expected pixels")
      } else {
        require(code < dictSize || (code == dictSize && prev >= 0),
          s"corrupt LZW stream (code $code, dict $dictSize)")
        // expand code (or the KwKwK case) onto the stack, reversed:
        // pops emit first-byte-first
        var sp = 0
        var cur = code
        if (code == dictSize) { // KwKwK: expansion(prev) + first(prev)
          var p = prev
          while (p >= 256) p = prefix(p)
          stack(0) = p.toByte; sp = 1 // first(prev), emitted LAST
          cur = prev
        }
        while (cur >= 256) { stack(sp) = suffix(cur); sp += 1; cur = prefix(cur) }
        stack(sp) = cur.toByte; sp += 1
        // stack holds the expansion reversed
        val first = stack(sp - 1)
        while (sp > 0) {
          sp -= 1
          require(outPos < expected, "LZW output overrun")
          out(outPos) = stack(sp); outPos += 1
        }
        if (prev >= 0 && dictSize < 4096) {
          prefix(dictSize) = prev
          suffix(dictSize) = first
          dictSize += 1
          if (dictSize == (1 << width) && width < 12) width += 1
        }
        prev = code
      }
    }
    out
  }

  /** Clear-flushed literal LZW encode (the classic "uncompressed GIF"
    * stream): every pixel emits its 9-bit root code; a CLEAR every
    * 254 codes keeps the decoder's dictionary below the 10-bit
    * boundary. Conformant and deterministic.
    */
  private def lzwEncodeLiteral(px: Array[Byte]): Array[Byte] = {
    val clear = 256; val eoi = 257
    val bw = new LsbBitWriter
    bw.write(clear, 9)
    var sinceClear = 0
    var i = 0
    while (i < px.length) {
      bw.write(px(i) & 0xff, 9)
      sinceClear += 1
      if (sinceClear == 254 && i + 1 < px.length) {
        bw.write(clear, 9)
        sinceClear = 0
      }
      i += 1
    }
    bw.write(eoi, 9)
    bw.finish()
  }

  /** Encode frames as a GIF89a animation: grayscale global palette
    * (index i → RGB (i,i,i)), one Graphic Control Extension + Image
    * Descriptor per frame, literal LZW. Deterministic byte-for-byte.
    */
  def encodeGifFrames(w: Int, h: Int, frames: Seq[Array[Byte]],
                      delayCs: Int = 10): Array[Byte] =
    encodeGifAnimation(w, h, frames,
      delays = Seq.fill(frames.size)(delayCs),
      disposals = Seq.fill(frames.size)(0),
      loopCount = -1)

  /** Full animation encode: per-frame GCE delay (centiseconds) and
    * disposal method (0 none / 1 keep / 2 restore-bg / 3 restore-
    * prev), plus the NETSCAPE2.0 looping application extension when
    * `loopCount >= 0` (0 = loop forever — the GIF convention).
    * `loopCount = -1` omits the extension (a single-play clip),
    * making [[encodeGifFrames]]'s delegation byte-identical to its
    * pre-timing output (m16 fixtures unchanged).
    */
  def encodeGifAnimation(w: Int, h: Int, frames: Seq[Array[Byte]],
                         delays: Seq[Int], disposals: Seq[Int],
                         loopCount: Int): Array[Byte] = {
    require(w >= 1 && h >= 1 && w <= 0xffff && h <= 0xffff, s"bad dims ${w}x$h")
    require(frames.nonEmpty, "need at least one frame")
    require(delays.size == frames.size && disposals.size == frames.size,
      "per-frame delay/disposal lists must match frame count")
    delays.foreach(d => require(d >= 0 && d <= 0xffff, s"bad delay $d cs"))
    disposals.foreach(d => require(d >= 0 && d <= 3, s"bad disposal $d"))
    require(loopCount >= -1 && loopCount <= 0xffff, s"bad loop count $loopCount")
    frames.foreach(f => require(f.length == w * h, "frame size mismatch"))
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes("US-ASCII"))
    w16(w); w16(h)
    out.write(0xf7) // GCT present, 8 bpp, 256 entries
    out.write(0) // background color index
    out.write(0) // aspect
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    if (loopCount >= 0) {
      // NETSCAPE2.0 application extension: loop count (0 = forever)
      out.write(0x21); out.write(0xff); out.write(11)
      out.write("NETSCAPE2.0".getBytes("US-ASCII"))
      out.write(3); out.write(1); w16(loopCount); out.write(0)
    }
    frames.indices.foreach { f =>
      val px = frames(f)
      // Graphic Control Extension: disposal in bits 2-4, then delay
      out.write(0x21); out.write(0xf9); out.write(4)
      out.write((disposals(f) & 7) << 2); w16(delays(f)); out.write(0); out.write(0)
      // Image Descriptor: full frame, no local table, no interlace
      out.write(0x2c); w16(0); w16(0); w16(w); w16(h); out.write(0)
      out.write(8) // LZW min code size
      val lzw = lzwEncodeLiteral(px)
      var off = 0
      while (off < lzw.length) {
        val n = math.min(255, lzw.length - off)
        out.write(n)
        out.write(lzw, off, n)
        off += n
      }
      out.write(0) // block terminator
    }
    out.write(0x3b)
    out.toByteArray
  }

  /** Decode all frames (indices, not colors). Skips extensions,
    * concatenates LZW sub-blocks, rejects interlace/local tables by
    * name.
    */
  def decodeGifFrames(gif: Array[Byte]): GifFrames = {
    require(gif.length > 13 &&
      new String(gif, 0, 3, "US-ASCII") == "GIF" &&
      (new String(gif, 3, 3, "US-ASCII") == "89a" ||
        new String(gif, 3, 3, "US-ASCII") == "87a"),
      "not a GIF stream")
    def u16(off: Int): Int = (gif(off) & 0xff) | ((gif(off + 1) & 0xff) << 8)
    val w = u16(6); val h = u16(8)
    require(w > 0 && h > 0, s"degenerate dimensions ${w}x$h")
    require(w.toLong * h <= Int.MaxValue,
      s"dimensions ${w}x$h exceed supported pixel count")
    val flags = gif(10) & 0xff
    var pos = 13
    if ((flags & 0x80) != 0) pos += 3 * (1 << ((flags & 7) + 1)) // skip GCT
    val frames = Seq.newBuilder[Array[Byte]]
    var done = false
    while (!done) {
      require(pos < gif.length, "truncated GIF (no trailer)")
      (gif(pos) & 0xff) match {
        case 0x3b => done = true
        case 0x21 => // extension: label + sub-blocks
          pos += 2
          while ({ require(pos < gif.length, "truncated GIF extension")
                   (gif(pos) & 0xff) != 0 })
            pos += 1 + (gif(pos) & 0xff)
          pos += 1
        case 0x2c =>
          require(pos + 11 <= gif.length, "truncated image descriptor")
          val fw = u16(pos + 5); val fh = u16(pos + 7)
          val fflags = gif(pos + 9) & 0xff
          require((fflags & 0x80) == 0,
            "local color tables are outside the supported profile")
          // interlace (bit 0x40) IS supported — ImageIO's writer emits
          // it by default, so rejecting it would refuse real streams
          val interlaced = (fflags & 0x40) != 0
          require(u16(pos + 1) == 0 && u16(pos + 3) == 0 &&
            fw == w && fh == h,
            "partial-frame image descriptors are outside the supported profile")
          pos += 10
          val minCode = gif(pos) & 0xff
          require(minCode == 8, s"unsupported LZW min code size $minCode")
          pos += 1
          val data = new java.io.ByteArrayOutputStream()
          while ({ require(pos < gif.length, "truncated GIF image data")
                   (gif(pos) & 0xff) != 0 }) {
            val n = gif(pos) & 0xff
            require(pos + 1 + n <= gif.length, "truncated GIF sub-block")
            data.write(gif, pos + 1, n)
            pos += 1 + n
          }
          pos += 1
          val raw = lzwDecode(data.toByteArray, w * h)
          frames += (if (!interlaced) raw else {
            // GIF 4-pass interlace: stream rows land at 0,8,16,… then
            // 4,12,… then 2,6,… then 1,3,5,…
            val out = new Array[Byte](w * h)
            var src = 0
            Seq((0, 8), (4, 8), (2, 4), (1, 2)).foreach { case (start, step) =>
              var y = start
              while (y < h) {
                System.arraycopy(raw, src * w, out, y * w, w)
                src += 1; y += step
              }
            }
            out
          })
        case other =>
          throw new IllegalArgumentException(
            f"unknown GIF block 0x$other%02x at $pos")
      }
    }
    val fs = frames.result()
    require(fs.nonEmpty, "GIF contains no image frames")
    GifFrames(w, h, fs)
  }

  /** Deterministic animation fixture: each doc's text becomes a
    * 4-frame 8×8 clip; frame f is the constant index
    * `cp((f·len)/4) % 256` (the m13 block rule, one block per frame).
    * GIF is LOSSLESS, so decode ≡ encode input with no exactness
    * trick needed. Emits `(id, gif)`.
    */
  def textToGifOwn(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val txtIdx = df.schema.fieldIndex(textCol)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("gif", BinaryType)))
    implicit val enc: Encoder[Row] = Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { row =>
        val cps =
          if (row.isNullAt(txtIdx)) Array.empty[Int]
          else row.getString(txtIdx).codePoints().toArray
        val frames = (0 until 4).map { f =>
          Array.fill(64)(MultimodalOps.textPoint(cps, f, 4).toByte)
        }
        Row(row.getLong(idIdx), encodeGifFrames(8, 8, frames))
      }
    }.toDF("id", "gif")
  }

  /** THE frame-sample operator: decode, keep every `stride`-th frame,
    * one output row per kept frame with integer-exact features —
    * `(id, n_frames, frame_idx, px_sum, px_min, px_max)` where
    * `px_sum = Σ index` over the frame (BIGINT). The shape a video
    * training pipeline needs (sample → per-frame features) on a real
    * container/codec.
    */
  def gifFrameSample(df: DataFrame, idCol: String, gifCol: String,
                     stride: Int): DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val idIdx = df.schema.fieldIndex(idCol)
    val gIdx = df.schema.fieldIndex(gifCol)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("n_frames", IntegerType),
      StructField("frame_idx", IntegerType), StructField("px_sum", LongType),
      StructField("px_min", IntegerType), StructField("px_max", IntegerType)))
    implicit val enc: Encoder[Row] = Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.flatMap { row =>
        val g = decodeGifFrames(row.getAs[Array[Byte]](gIdx))
        val id = row.getLong(idIdx)
        g.frames.zipWithIndex.collect {
          case (px, f) if f % stride == 0 =>
            var s = 0L; var mn = 255; var mx = 0
            var i = 0
            while (i < px.length) {
              val v = px(i) & 0xff
              s += v
              if (v < mn) mn = v
              if (v > mx) mx = v
              i += 1
            }
            Row(id, g.frames.size, f, s, mn, mx)
        }
      }
    }.toDF("id", "n_frames", "frame_idx", "px_sum", "px_min", "px_max")
  }

  // ── Animation TIMING/DISPOSAL metadata (m19) — the playback side
  // of the container: per-frame delay + disposal from each frame's
  // Graphic Control Extension, loop count from the NETSCAPE2.0
  // application extension. A video-pipeline needs these to sample by
  // TIME rather than frame index (variable-delay GIFs are common) ─────

  /** Playback metadata: loop count (-1 = no NETSCAPE extension,
    * 0 = forever) and per-frame (delayCs, disposal, transparentIdx
    * or -1).
    */
  final case class GifTiming(width: Int, height: Int, loopCount: Int,
                             frames: Seq[(Int, Int, Int)])

  /** Metadata-only walk: parses GCE + application extensions and
    * SKIPS image data without LZW-decoding it (a timing scan over a
    * large animation corpus must not pay the pixel decode). Same
    * hostile-header guards as [[decodeGifFrames]]: every offset is
    * bounds-checked before the read, truncation is a named error.
    */
  def gifTimingMeta(gif: Array[Byte]): GifTiming = {
    require(gif.length > 13 &&
      new String(gif, 0, 3, "US-ASCII") == "GIF" &&
      (new String(gif, 3, 3, "US-ASCII") == "89a" ||
        new String(gif, 3, 3, "US-ASCII") == "87a"),
      "not a GIF stream")
    def u16(off: Int): Int = (gif(off) & 0xff) | ((gif(off + 1) & 0xff) << 8)
    val w = u16(6); val h = u16(8)
    require(w > 0 && h > 0, s"degenerate dimensions ${w}x$h")
    val flags = gif(10) & 0xff
    var pos = 13
    if ((flags & 0x80) != 0) pos += 3 * (1 << ((flags & 7) + 1)) // skip GCT
    var loop = -1
    // the GCE applies to the NEXT image (GIF89a §23); frames with no
    // preceding GCE get (0 cs, disposal 0, no transparency)
    var pending: (Int, Int, Int) = (0, 0, -1)
    val frames = Seq.newBuilder[(Int, Int, Int)]
    def skipSubBlocks(): Unit = {
      while ({ require(pos < gif.length, "truncated GIF sub-blocks")
               (gif(pos) & 0xff) != 0 }) {
        val n = gif(pos) & 0xff
        require(pos + 1 + n <= gif.length, "truncated GIF sub-block")
        pos += 1 + n
      }
      pos += 1
    }
    var done = false
    while (!done) {
      require(pos < gif.length, "truncated GIF (no trailer)")
      (gif(pos) & 0xff) match {
        case 0x3b => done = true
        case 0x21 =>
          require(pos + 2 <= gif.length, "truncated GIF extension header")
          val label = gif(pos + 1) & 0xff
          pos += 2
          label match {
            case 0xf9 => // Graphic Control Extension
              require(pos + 6 <= gif.length, "truncated GCE")
              require((gif(pos) & 0xff) == 4, "GCE block size must be 4")
              val packed = gif(pos + 1) & 0xff
              val delay = u16(pos + 2)
              val tIdx =
                if ((packed & 1) != 0) gif(pos + 4) & 0xff else -1
              pending = (delay, (packed >> 2) & 7, tIdx)
              pos += 5
              skipSubBlocks() // the GCE terminator (and any excess)
            case 0xff => // application extension
              require(pos + 1 <= gif.length, "truncated app extension")
              val n = gif(pos) & 0xff
              require(pos + 1 + n <= gif.length, "truncated app identifier")
              val ident = new String(gif, pos + 1, n, "US-ASCII")
              pos += 1 + n
              if (ident == "NETSCAPE2.0") {
                // data sub-block: 0x01 <u16 loop count>. A spec-valid
                // extension may carry an EMPTY sub-block list (the
                // terminator immediately) — only demand the 4 payload
                // bytes when a >=3-byte sub-block is actually present;
                // otherwise fall through to skipSubBlocks().
                require(pos + 1 <= gif.length, "truncated NETSCAPE block")
                if ((gif(pos) & 0xff) >= 3) {
                  require(pos + 4 <= gif.length, "truncated NETSCAPE block")
                  if ((gif(pos + 1) & 0xff) == 1) loop = u16(pos + 2)
                }
              }
              skipSubBlocks()
            case _ =>
              skipSubBlocks()
          }
        case 0x2c =>
          require(pos + 11 <= gif.length, "truncated image descriptor")
          val fflags = gif(pos + 9) & 0xff
          pos += 10
          if ((fflags & 0x80) != 0)
            pos += 3 * (1 << ((fflags & 7) + 1)) // skip local color table
          require(pos + 1 <= gif.length, "truncated image data header")
          pos += 1 // LZW min code size — data is NOT decoded here
          skipSubBlocks()
          frames += pending
          pending = (0, 0, -1) // GCE consumed by this image
        case other =>
          throw new IllegalArgumentException(
            f"unknown GIF block 0x$other%02x at $pos")
      }
    }
    val fs = frames.result()
    require(fs.nonEmpty, "GIF contains no image frames")
    GifTiming(w, h, loop, fs)
  }

  /** Deterministic ANIMATED fixture with per-frame timing: the m16
    * frame rule plus delay `textPoint(f) % 200 + 1` cs, disposal
    * `f % 4`, loop count `|codepoints| % 5` — every field a closed
    * form the oracle recomputes from the text.
    */
  def textToAnimatedGifOwn(df: DataFrame, idCol: String,
                           textCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val txtIdx = df.schema.fieldIndex(textCol)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("gif", BinaryType)))
    implicit val enc: Encoder[Row] = Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { row =>
        val cps =
          if (row.isNullAt(txtIdx)) Array.empty[Int]
          else row.getString(txtIdx).codePoints().toArray
        val frames = (0 until 4).map { f =>
          Array.fill(64)(MultimodalOps.textPoint(cps, f, 4).toByte)
        }
        val delays = (0 until 4).map(f =>
          MultimodalOps.textPoint(cps, f, 4) % 200 + 1)
        val disposals = (0 until 4).map(_ % 4)
        Row(row.getLong(idIdx),
          encodeGifAnimation(8, 8, frames, delays, disposals,
            loopCount = cps.length % 5))
      }
    }.toDF("id", "gif")
  }

  /** THE timing operator: metadata-only scan (no pixel decode), one
    * row per frame with `(id, n_frames, frame_idx, delay_cs,
    * disposal, loop_count, t_start_cs)` where `t_start_cs` is the
    * frame's playback start offset (cumulative delay of earlier
    * frames) — what time-based sampling ("one frame per second of
    * playback") keys on.
    */
  def gifTiming(df: DataFrame, idCol: String, gifCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val gIdx = df.schema.fieldIndex(gifCol)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("n_frames", IntegerType),
      StructField("frame_idx", IntegerType), StructField("delay_cs", IntegerType),
      StructField("disposal", IntegerType), StructField("loop_count", IntegerType),
      StructField("t_start_cs", LongType)))
    implicit val enc: Encoder[Row] = Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.flatMap { row =>
        val t = gifTimingMeta(row.getAs[Array[Byte]](gIdx))
        val id = row.getLong(idIdx)
        var tStart = 0L
        t.frames.zipWithIndex.map { case ((delay, disposal, _), f) =>
          val r = Row(id, t.frames.size, f, delay, disposal, t.loopCount, tStart)
          tStart += delay
          r
        }
      }
    }.toDF("id", "n_frames", "frame_idx", "delay_cs", "disposal",
      "loop_count", "t_start_cs")
  }
}
