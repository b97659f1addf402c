package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.types._

/** A real baseline-JPEG decoder for the 8-bit grayscale profile — the
  * second real-bytes image format next to [[PngOps]], so the
  * multimodal family's decode path is proven against a LOSSY
  * production codec too (PNG round-trips exactly; JPEG must match the
  * independent decoder's pixels, which is a much stricter conformance
  * test of the entropy/IDCT pipeline).
  *
  * Public formats only: ITU-T T.81 baseline sequential DCT, JFIF
  * container. Scope: 8-bit precision, single grayscale component,
  * Huffman entropy coding, optional restart markers. Everything else
  * (progressive, chroma subsampling, arithmetic coding, 12-bit)
  * throws a named profile error — corrupt or out-of-profile media
  * must surface, not decode silently wrong.
  *
  * The IDCT is the classic Loeffler–Ligtenberg–Moshovitz 13-bit
  * fixed-point integer algorithm (the JPEG literature's "islow"
  * method) — integer-exact and deterministic on every platform, and
  * the same method the JDK's own ImageIO JPEG reader uses, so decoded
  * pixels match javax.imageio bit-for-bit on conformant baseline
  * streams (spec-pinned in JpegSpec).
  *
  * Reference behavior: faust treats payloads as opaque bytes and
  * leaves decoding to app code (`faust/serializers/codecs.py:1-60`);
  * the engine contract is the same — bytes in, typed columns out,
  * decode inside `mapPartitions` so blobs never cross a shuffle.
  */
object JpegOps {

  /** Parsed stream header (SOF0) — metadata without entropy decode. */
  final case class JpegMeta(width: Int, height: Int, precision: Int,
                            nComponents: Int)

  private def u16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  /** Zig-zag index → natural (row-major) index. */
  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Walk the marker stream to SOF0 and return the frame header —
    * the cheap metadata pass (m12's oracle checks it against the
    * encode rule). Throws on non-JPEG bytes or a non-baseline frame.
    */
  def readMeta(jpeg: Array[Byte]): JpegMeta = {
    require(jpeg.length > 4 && (jpeg(0) & 0xff) == 0xff &&
      (jpeg(1) & 0xff) == 0xd8, "not a JPEG (no SOI)")
    var pos = 2
    while (pos + 4 <= jpeg.length) {
      require((jpeg(pos) & 0xff) == 0xff, f"bad marker at $pos")
      val marker = jpeg(pos + 1) & 0xff
      marker match {
        case 0xc0 => // SOF0 baseline
          require(pos + 10 <= jpeg.length,
            "truncated SOF0 segment") // named, not an array exception
          val h = u16(jpeg, pos + 5); val w = u16(jpeg, pos + 7)
          return JpegMeta(w, h, jpeg(pos + 4) & 0xff, jpeg(pos + 9) & 0xff)
        case m if m == 0xc2 || (m >= 0xc1 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) =>
          throw new IllegalArgumentException(
            f"unsupported JPEG profile: SOF marker 0xff$m%02x (baseline SOF0 only)")
        case 0xd9 => throw new IllegalArgumentException("no SOF0 before EOI")
        case _ => ()
      }
      pos += 2 + u16(jpeg, pos + 2)
    }
    throw new IllegalArgumentException("no SOF0 found")
  }

  // ── Huffman table: canonical codes from the DHT counts+symbols,
  // decoded MSB-first one bit at a time against per-length bounds
  // (maxcode/valptr — the T.81 annex F decode procedure) ───────────────
  private final class Huff(counts: Array[Int], symbols: Array[Byte]) {
    // mincode/maxcode/valptr indexed by code length 1..16
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        if (counts(l - 1) > 0) {
          valPtr(l) = k
          minCode(l) = code
          code += counts(l - 1); k += counts(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    def decode(br: BitReader): Int = {
      var code = br.bit()
      var l = 1
      while (l <= 16 && (maxCode(l) < 0 || code > maxCode(l))) {
        code = (code << 1) | br.bit()
        l += 1
      }
      require(l <= 16, "corrupt entropy stream (Huffman code overrun)")
      symbols(valPtr(l) + code - minCode(l)) & 0xff
    }
  }

  /** MSB-first bit reader over the entropy segment with 0xFF00
    * byte-unstuffing; stops at any real marker (the caller handles
    * RSTn). Past-the-end reads return 1-fill like production decoders
    * (a truncated final EOB still decodes).
    */
  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nBits = 0
    var atMarker = false
    def bit(): Int = {
      if (nBits == 0) {
        if (atMarker || pos >= data.length) return 1
        var b = data(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          val next = if (pos < data.length) data(pos) & 0xff else 0xd9
          if (next == 0x00) pos += 1 // stuffed 0xFF data byte
          else { atMarker = true; pos -= 1; return 1 }
        }
        acc = b; nBits = 8
      }
      nBits -= 1
      (acc >> nBits) & 1
    }
    def receive(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def byteAlign(): Unit = nBits = 0
  }

  /** T.81 EXTEND: map a `size`-bit magnitude to its signed value. */
  private def extend(v: Int, size: Int): Int =
    if (size == 0) 0
    else if (v < (1 << (size - 1))) v - (1 << size) + 1
    else v

  // ── 13-bit fixed-point integer IDCT (Loeffler–Ligtenberg–Moshovitz,
  // the "islow" method of the JPEG literature): column pass keeps
  // PASS1_BITS of extra precision, row pass descales and level-shifts.
  // Integer-exact — identical output on every platform. ────────────────
  private val ConstBits = 13
  private val Pass1Bits = 2
  private val F0_298631336 = 2446
  private val F0_390180644 = 3196
  private val F0_541196100 = 4433
  private val F0_765366865 = 6270
  private val F0_899976223 = 7373
  private val F1_175875602 = 9633
  private val F1_501321110 = 12299
  private val F1_847759065 = 15137
  private val F1_961570560 = 16069
  private val F2_053119869 = 16819
  private val F2_562915447 = 20995
  private val F3_072711026 = 25172

  private def descale(x: Long, n: Int): Long = (x + (1L << (n - 1))) >> n

  /** In-place 8×8 IDCT of dequantized coefficients → pixel values
    * 0..255 (level shift +128, clamped). `ws` is caller-provided
    * 64-long scratch (hoisted out of the per-block loop — no
    * allocation on the hot decode path).
    */
  private def idct8x8(blk: Array[Int], out: Array[Int],
                      ws: Array[Long]): Unit = {
    // column pass
    var c = 0
    while (c < 8) {
      if (blk(8 + c) == 0 && blk(16 + c) == 0 && blk(24 + c) == 0 &&
        blk(32 + c) == 0 && blk(40 + c) == 0 && blk(48 + c) == 0 &&
        blk(56 + c) == 0) {
        val dc = (blk(c).toLong) << Pass1Bits
        var i = 0
        while (i < 8) { ws(8 * i + c) = dc; i += 1 }
      } else {
        var z2 = blk(16 + c).toLong; var z3 = blk(48 + c).toLong
        var z1 = (z2 + z3) * F0_541196100
        val t2 = z1 + z3 * (-F1_847759065)
        val t3 = z1 + z2 * F0_765366865
        z2 = blk(c).toLong; z3 = blk(32 + c).toLong
        val t0 = (z2 + z3) << ConstBits
        val t1 = (z2 - z3) << ConstBits
        val t10 = t0 + t3; val t13 = t0 - t3
        val t11 = t1 + t2; val t12 = t1 - t2
        var a0 = blk(56 + c).toLong; var a1 = blk(40 + c).toLong
        var a2 = blk(24 + c).toLong; var a3 = blk(8 + c).toLong
        z1 = a0 + a3; z2 = a1 + a2
        z3 = a0 + a2; var z4 = a1 + a3
        val z5 = (z3 + z4) * F1_175875602
        a0 *= F0_298631336; a1 *= F2_053119869
        a2 *= F3_072711026; a3 *= F1_501321110
        z1 *= -F0_899976223; z2 *= -F2_562915447
        z3 = z3 * (-F1_961570560) + z5
        z4 = z4 * (-F0_390180644) + z5
        a0 += z1 + z3; a1 += z2 + z4; a2 += z2 + z3; a3 += z1 + z4
        ws(c) = descale(t10 + a3, ConstBits - Pass1Bits)
        ws(56 + c) = descale(t10 - a3, ConstBits - Pass1Bits)
        ws(8 + c) = descale(t11 + a2, ConstBits - Pass1Bits)
        ws(48 + c) = descale(t11 - a2, ConstBits - Pass1Bits)
        ws(16 + c) = descale(t12 + a1, ConstBits - Pass1Bits)
        ws(40 + c) = descale(t12 - a1, ConstBits - Pass1Bits)
        ws(24 + c) = descale(t13 + a0, ConstBits - Pass1Bits)
        ws(32 + c) = descale(t13 - a0, ConstBits - Pass1Bits)
      }
      c += 1
    }
    // row pass: descale by CONST_BITS+PASS1_BITS+3, level shift, clamp
    var r = 0
    while (r < 8) {
      val o = 8 * r
      var z2 = ws(o + 2); var z3 = ws(o + 6)
      var z1 = (z2 + z3) * F0_541196100
      val t2 = z1 + z3 * (-F1_847759065)
      val t3 = z1 + z2 * F0_765366865
      z2 = ws(o); z3 = ws(o + 4)
      val t0 = (z2 + z3) << ConstBits
      val t1 = (z2 - z3) << ConstBits
      val t10 = t0 + t3; val t13 = t0 - t3
      val t11 = t1 + t2; val t12 = t1 - t2
      var a0 = ws(o + 7); var a1 = ws(o + 5)
      var a2 = ws(o + 3); var a3 = ws(o + 1)
      z1 = a0 + a3; z2 = a1 + a2
      z3 = a0 + a2; var z4 = a1 + a3
      val z5 = (z3 + z4) * F1_175875602
      a0 *= F0_298631336; a1 *= F2_053119869
      a2 *= F3_072711026; a3 *= F1_501321110
      z1 *= -F0_899976223; z2 *= -F2_562915447
      z3 = z3 * (-F1_961570560) + z5
      z4 = z4 * (-F0_390180644) + z5
      a0 += z1 + z3; a1 += z2 + z4; a2 += z2 + z3; a3 += z1 + z4
      val shift = ConstBits + Pass1Bits + 3
      def px(v: Long): Int = {
        val s = descale(v, shift) + 128
        if (s < 0) 0 else if (s > 255) 255 else s.toInt
      }
      out(o) = px(t10 + a3); out(o + 7) = px(t10 - a3)
      out(o + 1) = px(t11 + a2); out(o + 6) = px(t11 - a2)
      out(o + 2) = px(t12 + a1); out(o + 5) = px(t12 - a1)
      out(o + 3) = px(t13 + a0); out(o + 4) = px(t13 - a0)
      r += 1
    }
  }

  /** Decode a baseline grayscale JPEG to pixels. Verifies the marker
    * structure, builds the Huffman/quant tables, entropy-decodes every
    * 8×8 block (DC prediction + RST resync), dequantizes, IDCTs, and
    * crops the block grid to the frame dims.
    */
  def decodeGray8Baseline(jpeg: Array[Byte]): PngOps.Gray8 = {
    require(jpeg.length > 4 && (jpeg(0) & 0xff) == 0xff &&
      (jpeg(1) & 0xff) == 0xd8, "not a JPEG (no SOI)")
    val quant = new Array[Array[Int]](4)
    val dcTables = new Array[Huff](4)
    val acTables = new Array[Huff](4)
    var w = 0; var h = 0; var qsel = 0; var restartInterval = 0
    var dcSel = 0; var acSel = 0
    var pos = 2
    var sosAt = -1
    while (sosAt < 0 && pos + 4 <= jpeg.length) {
      require((jpeg(pos) & 0xff) == 0xff, f"bad marker at $pos")
      val marker = jpeg(pos + 1) & 0xff
      val len = u16(jpeg, pos + 2)
      marker match {
        case 0xdb => parseDqtInto(jpeg, pos, len, quant)
        case 0xc4 => parseDhtInto(jpeg, pos, len, dcTables, acTables)
        case 0xc0 =>
          require((jpeg(pos + 4) & 0xff) == 8, "8-bit precision only")
          h = u16(jpeg, pos + 5); w = u16(jpeg, pos + 7)
          require((jpeg(pos + 9) & 0xff) == 1,
            "grayscale (1-component) profile only")
          require((jpeg(pos + 11) & 0xff) == 0x11,
            "1x1 sampling only (trivially true for grayscale)")
          qsel = jpeg(pos + 12) & 0x0f
          require(qsel < 4, s"quant selector $qsel is outside baseline (0..3)")
        case m if m >= 0xc1 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc =>
          throw new IllegalArgumentException(
            f"unsupported JPEG profile: SOF marker 0xff$m%02x (baseline SOF0 only)")
        case 0xdd => restartInterval = u16(jpeg, pos + 4)
        case 0xda =>
          require((jpeg(pos + 4) & 0xff) == 1, "one scan component only")
          dcSel = (jpeg(pos + 6) >> 4) & 0x0f
          acSel = jpeg(pos + 6) & 0x0f
          require(dcSel < 4 && acSel < 4,
            s"scan table selectors $dcSel/$acSel are outside baseline (0..3)")
          sosAt = pos + 2 + len
        case _ => () // APPn / COM / etc.
      }
      pos += 2 + len
    }
    require(sosAt > 0 && w > 0 && h > 0, "missing SOS/SOF0")
    // SOF0 carries u16 dims, so w*h can reach ~2^32 and wrap the Int
    // allocation negative — a hostile-but-well-formed header must die
    // with the named profile error, not NegativeArraySizeException
    // (PngOps has the same guard)
    require(w.toLong * h <= Int.MaxValue,
      s"dimensions ${w}x$h exceed supported pixel count")
    val q = quant(qsel)
    require(q != null, s"missing quant table $qsel")
    val dcT = dcTables(dcSel); val acT = acTables(acSel)
    require(dcT != null && acT != null, "missing Huffman tables")

    val bw = (w + 7) / 8; val bh = (h + 7) / 8
    val px = new Array[Byte](w * h)
    val br = new BitReader(jpeg, sosAt)
    val blk = new Array[Int](64)
    val out = new Array[Int](64)
    val ws = new Array[Long](64)
    var pred = 0
    var blocksSinceRst = 0
    var by = 0
    while (by < bh) {
      var bx = 0
      while (bx < bw) {
        if (restartInterval > 0 && blocksSinceRst == restartInterval) {
          // byte-align and consume the RSTn marker; DC prediction resets
          br.byteAlign()
          br.atMarker = false
          var p = br.pos
          while (p + 1 < jpeg.length && !((jpeg(p) & 0xff) == 0xff &&
            (jpeg(p + 1) & 0xf8) == 0xd0)) p += 1
          // a missing marker must die by name, not decode 1-fill garbage
          require(p + 1 < jpeg.length,
            "truncated entropy stream (RSTn marker expected before EOF)")
          br.pos = p + 2
          pred = 0
          blocksSinceRst = 0
        }
        java.util.Arrays.fill(blk, 0)
        // DC
        val s = dcT.decode(br)
        pred += extend(br.receive(s), s)
        blk(0) = pred * q(0)
        // AC
        var k = 1
        while (k < 64) {
          val rs = acT.decode(br)
          val r = rs >> 4; val sz = rs & 0x0f
          if (sz == 0) {
            if (r == 15) k += 16 // ZRL
            else k = 64 // EOB
          } else {
            k += r
            require(k < 64, "corrupt entropy stream (AC index overrun)")
            blk(ZigZag(k)) = extend(br.receive(sz), sz) * q(ZigZag(k))
            k += 1
          }
        }
        idct8x8(blk, out, ws)
        // crop-copy the block into the frame
        val x0 = bx * 8; val y0 = by * 8
        var yy = 0
        while (yy < 8 && y0 + yy < h) {
          var xx = 0
          while (xx < 8 && x0 + xx < w) {
            px((y0 + yy) * w + (x0 + xx)) = out(yy * 8 + xx).toByte
            xx += 1
          }
          yy += 1
        }
        blocksSinceRst += 1
        bx += 1
      }
      by += 1
    }
    PngOps.Gray8(w, h, px)
  }

  // ── Baseline encoder — the conformance counterpart: a minimal,
  // fully deterministic grayscale encoder whose output any spec
  // decoder (ours, the JDK's) must read identically. Tables are
  // GENERATED, not transcribed: DC symbols 0..11 all at code length
  // 4 and the 162 valid AC run/size symbols all at length 8 — both
  // trivially canonical/prefix-free (fixed length), spec-valid, and
  // derived from the same counts+symbols lists the DHT segment
  // carries, so encoder and any decoder can never disagree about
  // them. Quant = flat 2 (keeps every coefficient within the
  // baseline size-10 AC / size-11 DC-diff categories). Supports a
  // restart interval so the decoder's RSTn resync path is testable.
  private def canonicalCodes(counts: Array[Int],
                             symbols: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0; var k = 0
    val out = scala.collection.mutable.Map.empty[Int, (Int, Int)]
    var l = 1
    while (l <= 16) {
      var i = 0
      while (i < counts(l - 1)) {
        out(symbols(k)) = (code, l)
        code += 1; k += 1; i += 1
      }
      code <<= 1
      l += 1
    }
    out.toMap
  }

  private val EncDcSymbols: Array[Int] = (0 to 11).toArray
  private val EncDcCounts: Array[Int] =
    Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0) // all length 4
  private val EncAcSymbols: Array[Int] =
    (0 to 255).filter(b => b == 0x00 || b == 0xf0 ||
      ((b & 0x0f) >= 1 && (b & 0x0f) <= 10)).toArray // 162 symbols
  private val EncAcCounts: Array[Int] =
    Array(0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0, 0) // all length 8
  private val EncQ = 2

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        n += 1
        if (n == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    /** 1-fill to the byte boundary (T.81 pad rule). */
    def align(): Unit = if (n > 0) put((1 << (8 - n)) - 1, 8 - n)
  }

  private def category(v: Int): Int = {
    var m = math.abs(v); var s = 0
    while (m != 0) { m >>= 1; s += 1 }
    s
  }

  /** Orthonormal DCT-II basis via StrictMath (platform-deterministic),
    * shared by both encoders.
    */
  private lazy val EncBasis: Array[Array[Double]] =
    Array.tabulate(8, 8) { (u, x) =>
      val cu = if (u == 0) 1.0 / StrictMath.sqrt(2.0) else 1.0
      0.5 * cu * StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 16.0)
    }

  /** FDCT (over [[EncBasis]]) + flat-EncQ quantize + Huffman-emit of
    * ONE 8×8 block sampled from `plane` at (x0, y0) with edge
    * replication; updates the component's DC predictor in place — the
    * single block kernel the gray and color encoders share.
    */
  private def encodeBlockInto(bw: BitWriter, coefs: Array[Int],
      plane: Array[Byte], pw: Int, ph: Int, x0: Int, y0: Int,
      pred: Array[Int], comp: Int,
      dcCodes: Map[Int, (Int, Int)], acCodes: Map[Int, (Int, Int)]): Unit = {
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            val sy = math.min(y0 + y, ph - 1)
            val sx = math.min(x0 + x, pw - 1)
            s += EncBasis(u)(y) * EncBasis(v)(x) *
              ((plane(sy * pw + sx) & 0xff) - 128)
            x += 1
          }
          y += 1
        }
        coefs(u * 8 + v) = math.round(s / EncQ).toInt
        v += 1
      }
      u += 1
    }
    // DC diff, then AC in zigzag order with run-length + ZRL + EOB
    val dc = coefs(0)
    val diff = dc - pred(comp)
    pred(comp) = dc
    val dcCat = category(diff)
    val (dcc, dcl) = dcCodes(dcCat)
    bw.put(dcc, dcl)
    if (dcCat > 0) {
      val mag = if (diff >= 0) diff else diff + (1 << dcCat) - 1
      bw.put(mag, dcCat)
    }
    var run = 0
    var k = 1
    while (k < 64) {
      val c = coefs(ZigZag(k))
      if (c == 0) run += 1
      else {
        while (run > 15) { val (z, zl) = acCodes(0xf0); bw.put(z, zl); run -= 16 }
        val sz = category(c)
        val (ac, al) = acCodes((run << 4) | sz)
        bw.put(ac, al)
        val mag = if (c >= 0) c else c + (1 << sz) - 1
        bw.put(mag, sz)
        run = 0
      }
      k += 1
    }
    if (run > 0) { val (e, el) = acCodes(0x00); bw.put(e, el) }
  }

  /** Parse one DQT segment (possibly several tables) into `quant` —
    * shared by both decoders, ids validated against baseline.
    */
  private def parseDqtInto(jpeg: Array[Byte], pos: Int, len: Int,
                           quant: Array[Array[Int]]): Unit = {
    var p = pos + 4
    while (p < pos + 2 + len) {
      val pq = (jpeg(p) >> 4) & 0x0f; val tq = jpeg(p) & 0x0f
      require(pq == 0, "16-bit quant tables are outside baseline-8")
      require(tq < 4, s"quant table id $tq is outside baseline (0..3)")
      val t = new Array[Int](64)
      var i = 0
      while (i < 64) { t(ZigZag(i)) = jpeg(p + 1 + i) & 0xff; i += 1 }
      quant(tq) = t
      p += 65
    }
  }

  /** Parse one DHT segment (possibly several tables) into `dc`/`ac` —
    * shared by both decoders, class/ids validated against baseline.
    */
  private def parseDhtInto(jpeg: Array[Byte], pos: Int, len: Int,
                           dc: Array[Huff], ac: Array[Huff]): Unit = {
    var p = pos + 4
    while (p < pos + 2 + len) {
      val tc = (jpeg(p) >> 4) & 0x0f; val th = jpeg(p) & 0x0f
      require(tc <= 1 && th < 4,
        s"Huffman table class $tc / id $th is outside baseline")
      val counts = (0 until 16).map(i => jpeg(p + 1 + i) & 0xff).toArray
      val n = counts.sum
      val syms = java.util.Arrays.copyOfRange(jpeg, p + 17, p + 17 + n)
      if (tc == 0) dc(th) = new Huff(counts, syms)
      else ac(th) = new Huff(counts, syms)
      p += 17 + n
    }
  }

  /** Encode 8-bit grayscale pixels as a valid baseline JPEG (flat
    * quant 2, generated fixed-length Huffman tables, optional restart
    * interval in MCUs). Deterministic byte-for-byte; decodable by any
    * conformant decoder — JpegSpec cross-checks ours against the
    * JDK's on this output, including the RSTn resync path.
    */
  def encodeGray8Baseline(w: Int, h: Int, px: Array[Byte],
                          restartInterval: Int = 0): Array[Byte] = {
    require(w >= 1 && h >= 1 && w <= 0xffff && h <= 0xffff, s"bad dims ${w}x$h")
    require(px.length == w * h, s"need ${w * h} pixels, got ${px.length}")
    val dcCodes = canonicalCodes(EncDcCounts, EncDcSymbols)
    val acCodes = canonicalCodes(EncAcCounts, EncAcSymbols)
    val out = new java.io.ByteArrayOutputStream()
    def seg(marker: Int, body: Array[Int]): Unit = {
      out.write(0xff); out.write(marker)
      val len = body.length + 2
      out.write((len >> 8) & 0xff); out.write(len & 0xff)
      body.foreach(out.write)
    }
    out.write(0xff); out.write(0xd8) // SOI
    seg(0xe0, Array('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0)) // APP0
    seg(0xdb, 0 +: Array.fill(64)(EncQ)) // DQT table 0 (flat, zigzag-invariant)
    seg(0xc0, Array(8, (h >> 8) & 0xff, h & 0xff, (w >> 8) & 0xff, w & 0xff,
      1, 1, 0x11, 0)) // SOF0: 8-bit, 1 component, 1x1, quant 0
    seg(0xc4, ((0x00 +: EncDcCounts.toSeq) ++ EncDcSymbols.toSeq).toArray) // DHT DC
    seg(0xc4, ((0x10 +: EncAcCounts.toSeq) ++ EncAcSymbols.toSeq).toArray) // DHT AC
    if (restartInterval > 0)
      seg(0xdd, Array((restartInterval >> 8) & 0xff, restartInterval & 0xff))
    seg(0xda, Array(1, 1, 0x00, 0, 63, 0)) // SOS: component 1, DC 0 / AC 0
    var bw = new BitWriter(out)
    val bwAcross = (w + 7) / 8; val bhDown = (h + 7) / 8
    val pred = Array(0)
    var mcu = 0
    var rstIdx = 0
    val coefs = new Array[Int](64)
    var by = 0
    while (by < bhDown) {
      var bx = 0
      while (bx < bwAcross) {
        if (restartInterval > 0 && mcu == restartInterval) {
          bw.align()
          out.write(0xff); out.write(0xd0 + (rstIdx & 7))
          rstIdx += 1; mcu = 0; pred(0) = 0
          bw = new BitWriter(out)
        }
        encodeBlockInto(bw, coefs, px, w, h, bx * 8, by * 8, pred, 0,
          dcCodes, acCodes)
        mcu += 1
        bx += 1
      }
      by += 1
    }
    bw.align()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  // ── Color: baseline YCbCr 4:2:0 — the dominant crawl-image profile.
  // One MCU = 16×16 pixels = 4 interleaved Y blocks (2×2) + 1 Cb + 1
  // Cr; chroma planes are (⌈w/2⌉ × ⌈h/2⌉). The color transform is
  // libjpeg's exact fixed-point table math (jdcolor.c): SCALEBITS=16,
  // FIX(1.40200)=91881, FIX(0.34414)=22554, FIX(0.71414)=46802,
  // FIX(1.77200)=116130 — integer-deterministic, so the DuckDB oracle
  // replays it with `//` floor division. ────────────────────────────────

  /** Decoded 4:2:0 frame: full-res luma + quarter-res chroma planes
    * (values 0..255 as bytes). `cw`/`ch` are the chroma dims.
    */
  final case class YCbCr420(width: Int, height: Int, y: Array[Byte],
                            cb: Array[Byte], cr: Array[Byte]) {
    def cw: Int = (width + 1) / 2
    def ch: Int = (height + 1) / 2
  }

  /** libjpeg-exact integer YCbCr→RGB (jdcolor.c table build):
    * `r = y + ((91881·crd + 32768) >> 16)`,
    * `g = y + ((−22554·cbd − 46802·crd + 32767) >> 16)`,
    * `b = y + ((116130·cbd + 32768) >> 16)`, clamped to 0..255 —
    * the `>> 16` is floor division by 65536 (arithmetic shift), which
    * is what SQL `// 65536` computes, so the oracle replays this
    * bit-for-bit.
    */
  def ycbcrToRgb(y: Int, cb: Int, cr: Int): (Int, Int, Int) = {
    val cbd = cb - 128; val crd = cr - 128
    def cl(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
    (cl(y + ((91881 * crd + 32768) >> 16)),
      cl(y + ((-22554 * cbd - 46802 * crd + 32767) >> 16)),
      cl(y + ((116130 * cbd + 32768) >> 16)))
  }

  /** Decode a baseline YCbCr 4:2:0 JPEG (SOF0, 3 components, Y 2×2 /
    * Cb 1×1 / Cr 1×1 sampling) to its planes. The interleaved MCU
    * scan decodes 4 Y blocks then Cb then Cr per MCU, with per-
    * component DC prediction and quant/Huffman table selection, RSTn
    * resync on MCU boundaries — the full T.81 color path minus only
    * the upsample/color-transform (left to the caller so tests can
    * pin the exact plane values).
    */
  def decodeYCbCr420Baseline(jpeg: Array[Byte]): YCbCr420 = {
    require(jpeg.length > 4 && (jpeg(0) & 0xff) == 0xff &&
      (jpeg(1) & 0xff) == 0xd8, "not a JPEG (no SOI)")
    val quant = new Array[Array[Int]](4)
    val dcTables = new Array[Huff](4)
    val acTables = new Array[Huff](4)
    var w = 0; var h = 0; var restartInterval = 0
    // per-component (in frame order Y, Cb, Cr): quant sel, DC sel, AC sel
    val qSel = new Array[Int](3)
    val dcSel = new Array[Int](3)
    val acSel = new Array[Int](3)
    var pos = 2
    var sosAt = -1
    while (sosAt < 0 && pos + 4 <= jpeg.length) {
      require((jpeg(pos) & 0xff) == 0xff, f"bad marker at $pos")
      val marker = jpeg(pos + 1) & 0xff
      val len = u16(jpeg, pos + 2)
      marker match {
        case 0xdb => parseDqtInto(jpeg, pos, len, quant)
        case 0xc4 => parseDhtInto(jpeg, pos, len, dcTables, acTables)
        case 0xc0 =>
          require((jpeg(pos + 4) & 0xff) == 8, "8-bit precision only")
          h = u16(jpeg, pos + 5); w = u16(jpeg, pos + 7)
          require(w.toLong * h <= Int.MaxValue,
            s"dimensions ${w}x$h exceed supported pixel count")
          require((jpeg(pos + 9) & 0xff) == 3,
            "YCbCr (3-component) profile only")
          var c = 0
          while (c < 3) {
            val off = pos + 10 + 3 * c
            val sampling = jpeg(off + 1) & 0xff
            val expect = if (c == 0) 0x22 else 0x11
            require(sampling == expect,
              f"unsupported sampling 0x$sampling%02x for component $c " +
                "(4:2:0 only: Y 2x2, chroma 1x1)")
            qSel(c) = jpeg(off + 2) & 0x0f
            require(qSel(c) < 4,
              s"quant selector ${qSel(c)} is outside baseline (0..3)")
            c += 1
          }
        case m if m >= 0xc1 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc =>
          throw new IllegalArgumentException(
            f"unsupported JPEG profile: SOF marker 0xff$m%02x (baseline SOF0 only)")
        case 0xdd => restartInterval = u16(jpeg, pos + 4)
        case 0xda =>
          require((jpeg(pos + 4) & 0xff) == 3, "3-component scan only")
          var c = 0
          while (c < 3) {
            val off = pos + 5 + 2 * c
            dcSel(c) = (jpeg(off + 1) >> 4) & 0x0f
            acSel(c) = jpeg(off + 1) & 0x0f
            require(dcSel(c) < 4 && acSel(c) < 4,
              s"scan table selectors ${dcSel(c)}/${acSel(c)} are outside baseline (0..3)")
            c += 1
          }
          sosAt = pos + 2 + len
        case _ => ()
      }
      pos += 2 + len
    }
    require(sosAt > 0 && w > 0 && h > 0, "missing SOS/SOF0")
    val q = qSel.map { s =>
      val t = quant(s); require(t != null, s"missing quant table $s"); t
    }
    val dcT = dcSel.map { s =>
      val t = dcTables(s); require(t != null, s"missing DC table $s"); t
    }
    val acT = acSel.map { s =>
      val t = acTables(s); require(t != null, s"missing AC table $s"); t
    }

    val cw = (w + 1) / 2; val ch = (h + 1) / 2
    val yPl = new Array[Byte](w * h)
    val cbPl = new Array[Byte](cw * ch)
    val crPl = new Array[Byte](cw * ch)
    val mcusX = (w + 15) / 16; val mcusY = (h + 15) / 16
    val br = new BitReader(jpeg, sosAt)
    val blk = new Array[Int](64)
    val out = new Array[Int](64)
    val ws = new Array[Long](64)
    val pred = new Array[Int](3)
    var mcusSinceRst = 0

    // decode one block of component `comp`, then crop-copy into the
    // target plane at (x0, y0)
    def block(comp: Int, plane: Array[Byte], pw: Int, ph: Int,
              x0: Int, y0: Int): Unit = {
      java.util.Arrays.fill(blk, 0)
      val s = dcT(comp).decode(br)
      pred(comp) += extend(br.receive(s), s)
      blk(0) = pred(comp) * q(comp)(0)
      var k = 1
      while (k < 64) {
        val rs = acT(comp).decode(br)
        val r = rs >> 4; val sz = rs & 0x0f
        if (sz == 0) { if (r == 15) k += 16 else k = 64 }
        else {
          k += r
          require(k < 64, "corrupt entropy stream (AC index overrun)")
          blk(ZigZag(k)) = extend(br.receive(sz), sz) * q(comp)(ZigZag(k))
          k += 1
        }
      }
      idct8x8(blk, out, ws)
      var yy = 0
      while (yy < 8 && y0 + yy < ph) {
        var xx = 0
        while (xx < 8 && x0 + xx < pw) {
          plane((y0 + yy) * pw + (x0 + xx)) = out(yy * 8 + xx).toByte
          xx += 1
        }
        yy += 1
      }
    }

    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcusSinceRst == restartInterval) {
          br.byteAlign()
          br.atMarker = false
          var p = br.pos
          while (p + 1 < jpeg.length && !((jpeg(p) & 0xff) == 0xff &&
            (jpeg(p + 1) & 0xf8) == 0xd0)) p += 1
          // a missing marker must die by name, not decode 1-fill garbage
          require(p + 1 < jpeg.length,
            "truncated entropy stream (RSTn marker expected before EOF)")
          br.pos = p + 2
          pred(0) = 0; pred(1) = 0; pred(2) = 0
          mcusSinceRst = 0
        }
        // 4 Y blocks (2x2 raster order), then Cb, then Cr
        var by = 0
        while (by < 2) {
          var bx = 0
          while (bx < 2) {
            block(0, yPl, w, h, mx * 16 + bx * 8, my * 16 + by * 8)
            bx += 1
          }
          by += 1
        }
        block(1, cbPl, cw, ch, mx * 8, my * 8)
        block(2, crPl, cw, ch, mx * 8, my * 8)
        mcusSinceRst += 1
        mx += 1
      }
      my += 1
    }
    YCbCr420(w, h, yPl, cbPl, crPl)
  }

  /** Encode 4:2:0 planes as a valid baseline color JPEG — the color
    * twin of [[encodeGray8Baseline]]: flat quant 2 (one table, all
    * components), the same generated fixed-length Huffman tables
    * (selectors 0 for every component), interleaved MCU scan with
    * per-component DC prediction, optional restart interval in MCUs.
    * Deterministic byte-for-byte; ColorJpegSpec cross-checks the
    * decode against the JDK on this output.
    */
  def encodeYCbCr420Baseline(w: Int, h: Int, yPl: Array[Byte],
                             cbPl: Array[Byte], crPl: Array[Byte],
                             restartInterval: Int = 0): Array[Byte] = {
    require(w >= 1 && h >= 1 && w <= 0xffff && h <= 0xffff, s"bad dims ${w}x$h")
    val cw = (w + 1) / 2; val ch = (h + 1) / 2
    require(yPl.length == w * h, s"need ${w * h} luma samples")
    require(cbPl.length == cw * ch && crPl.length == cw * ch,
      s"need ${cw * ch} chroma samples per plane")
    val dcCodes = canonicalCodes(EncDcCounts, EncDcSymbols)
    val acCodes = canonicalCodes(EncAcCounts, EncAcSymbols)
    val out = new java.io.ByteArrayOutputStream()
    def seg(marker: Int, body: Array[Int]): Unit = {
      out.write(0xff); out.write(marker)
      val len = body.length + 2
      out.write((len >> 8) & 0xff); out.write(len & 0xff)
      body.foreach(out.write)
    }
    out.write(0xff); out.write(0xd8)
    seg(0xe0, Array('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    seg(0xdb, 0 +: Array.fill(64)(EncQ))
    seg(0xc0, Array(8, (h >> 8) & 0xff, h & 0xff, (w >> 8) & 0xff, w & 0xff,
      3, 1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0)) // Y 2x2, Cb/Cr 1x1, quant 0
    seg(0xc4, ((0x00 +: EncDcCounts.toSeq) ++ EncDcSymbols.toSeq).toArray)
    seg(0xc4, ((0x10 +: EncAcCounts.toSeq) ++ EncAcSymbols.toSeq).toArray)
    if (restartInterval > 0)
      seg(0xdd, Array((restartInterval >> 8) & 0xff, restartInterval & 0xff))
    seg(0xda, Array(3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0))
    var bw = new BitWriter(out)
    val coefs = new Array[Int](64)
    val pred = new Array[Int](3)

    def encodeBlock(comp: Int, plane: Array[Byte], pw: Int, ph: Int,
                    x0: Int, y0: Int): Unit =
      encodeBlockInto(bw, coefs, plane, pw, ph, x0, y0, pred, comp,
        dcCodes, acCodes)

    val mcusX = (w + 15) / 16; val mcusY = (h + 15) / 16
    var mcu = 0; var rstIdx = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu == restartInterval) {
          bw.align()
          out.write(0xff); out.write(0xd0 + (rstIdx & 7))
          rstIdx += 1; mcu = 0
          pred(0) = 0; pred(1) = 0; pred(2) = 0
          bw = new BitWriter(out)
        }
        var by = 0
        while (by < 2) {
          var bx = 0
          while (bx < 2) {
            encodeBlock(0, yPl, w, h, mx * 16 + bx * 8, my * 16 + by * 8)
            bx += 1
          }
          by += 1
        }
        encodeBlock(1, cbPl, cw, ch, mx * 8, my * 8)
        encodeBlock(2, crPl, cw, ch, mx * 8, my * 8)
        mcu += 1
        mx += 1
      }
      my += 1
    }
    bw.align()
    out.write(0xff); out.write(0xd9)
    out.toByteArray
  }

  /** Render each doc's text into a block-constant 16×16 COLOR fixture
    * (one MCU: four constant Y blocks from codepoints 0..3 of the
    * 6-point sample, one constant Cb block from point 4, one constant
    * Cr from point 5) and encode with [[encodeYCbCr420Baseline]] —
    * the m14 fixture rule. Block-constant planes make the lossy
    * round-trip EXACT per component (the [[textToJpegOwn]] argument,
    * component-wise), so decoded Y/Cb/Cr — and the RGB through the
    * fixed-point transform — are pure integer functions of the text.
    */
  def textToColorJpegOwn(df: DataFrame, idCol: String,
                         textCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val txtIdx = df.schema.fieldIndex(textCol)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("jpeg", BinaryType)))
    implicit val enc: Encoder[Row] = Encoders.row(schema)
    df.mapPartitions { rows =>
      // RST resync is LOAD-BEARING for the m14 gate: the emitted
      // 16×16 fixture is a single MCU (restartInterval=1 never
      // fires), so a two-MCU twin (identical MCUs stacked, one RST0
      // between them) is encoded and decoded ONCE PER PARTITION on
      // that partition's first row — a resync bug is structural, so
      // one twin fails the oracle-gated query without tripling every
      // row's cost (ColorJpegSpec covers content-varied multi-MCU RST)
      var twinChecked = false
      rows.map { row =>
        val cps =
          if (row.isNullAt(txtIdx)) Array.empty[Int]
          else row.getString(txtIdx).codePoints().toArray
        def v(i: Int): Byte = MultimodalOps.textPoint(cps, i, 6).toByte
        val yPl = blockConstantRaster16(b => v(b))
        val cbPl = Array.fill(64)(v(4))
        val crPl = Array.fill(64)(v(5))
        if (!twinChecked) {
          twinChecked = true
          val twin = encodeYCbCr420Baseline(16, 32,
            yPl ++ yPl, cbPl ++ cbPl, crPl ++ crPl, restartInterval = 1)
          val dec = decodeYCbCr420Baseline(twin)
          require(dec.width == 16 && dec.height == 32 &&
            java.util.Arrays.equals(
              java.util.Arrays.copyOfRange(dec.y, 0, 256), yPl) &&
            java.util.Arrays.equals(
              java.util.Arrays.copyOfRange(dec.y, 256, 512),
              java.util.Arrays.copyOfRange(dec.y, 0, 256)) &&
            java.util.Arrays.equals(
              java.util.Arrays.copyOfRange(dec.cb, 0, 64),
              java.util.Arrays.copyOfRange(dec.cb, 64, 128)) &&
            java.util.Arrays.equals(
              java.util.Arrays.copyOfRange(dec.cr, 0, 64),
              java.util.Arrays.copyOfRange(dec.cr, 64, 128)),
            "RST resync produced divergent MCUs in the m14 twin stream")
        }
        Row(row.getLong(idIdx),
          encodeYCbCr420Baseline(16, 16, yPl, cbPl, crPl,
            restartInterval = 1))
      }
    }.toDF("id", "jpeg")
  }

  /** m14's decode pass: full color pipeline (interleaved entropy
    * decode, per-component dequant + IDCT, chroma upsample by
    * replication, libjpeg fixed-point color transform) → per-image
    * `(id, width, height, sh, r00, g00, b00)`: luma phash over the
    * 8×8 grid sample plus the RGB of pixel (0,0) — both pure integer
    * functions of the planes, so the oracle recomputes them from the
    * fixture rule.
    */
  def colorJpegStats(df: DataFrame, idCol: String, jpegCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val jIdx = df.schema.fieldIndex(jpegCol)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("width", IntegerType),
      StructField("height", IntegerType), StructField("sh", LongType),
      StructField("r00", IntegerType), StructField("g00", IntegerType),
      StructField("b00", IntegerType)))
    implicit val enc: Encoder[Row] = Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { row =>
        val img = decodeYCbCr420Baseline(row.getAs[Array[Byte]](jIdx))
        val grid = new Array[Long](64)
        var gy = 0
        while (gy < 8) {
          var gx = 0
          while (gx < 8) {
            val sy = (gy.toLong * img.height) / 8
            val sx = (gx.toLong * img.width) / 8
            grid(gy * 8 + gx) =
              (img.y(sy.toInt * img.width + sx.toInt) & 0xff).toLong
            gx += 1
          }
          gy += 1
        }
        val (r, g, b) = ycbcrToRgb(img.y(0) & 0xff,
          img.cb(0) & 0xff, img.cr(0) & 0xff)
        Row(row.getLong(idIdx), img.width, img.height,
          PhashKernel.phash56FromGrid(grid), r, g, b)
      }
    }.toDF("id", "width", "height", "sh", "r00", "g00", "b00")
  }

  /** Render each doc's text into the SAME deterministic raster rule
    * as [[PngOps.textToPng]] and encode it with javax.imageio's JPEG
    * writer — an INDEPENDENT production encoder, so decoding its
    * output exercises real quant tables, real Huffman tables, and
    * real entropy streams we did not author. Emits `(id, jpeg)`.
    */
  def textToJpeg(df: DataFrame, idCol: String, textCol: String,
                 wCol: String, hCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val txtIdx = df.schema.fieldIndex(textCol)
    val wIdx = df.schema.fieldIndex(wCol)
    val hIdx = df.schema.fieldIndex(hCol)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("jpeg", BinaryType)))
    implicit val enc: Encoder[Row] = Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { row =>
        val w = row.getInt(wIdx); val h = row.getInt(hIdx)
        val cps =
          if (row.isNullAt(txtIdx)) Array.empty[Int]
          else row.getString(txtIdx).codePoints().toArray
        val px = new Array[Byte](w * h)
        var c = 0
        while (c < px.length) {
          // the ONE authoritative sampling rule (m05/m13 family)
          px(c) = MultimodalOps.textPoint(cps, c, px.length).toByte
          c += 1
        }
        val bi = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        bi.getRaster.setDataElements(0, 0, w, h, px)
        val bos = new java.io.ByteArrayOutputStream()
        require(javax.imageio.ImageIO.write(bi, "jpg", bos),
          "no JPEG writer available")
        Row(row.getLong(idIdx), bos.toByteArray)
      }
    }.toDF("id", "jpeg")
  }

  /** Render each doc's text into a BLOCK-CONSTANT 16×16 raster (four
    * 8×8 blocks; block `b`'s value samples the codepoint stream at
    * `(b·len)/4`, mod 256) and encode it with the repo's OWN
    * deterministic baseline encoder ([[encodeGray8Baseline]], flat
    * quant 2, generated fixed-length Huffman tables, restart interval
    * 2 so the RSTn resync path runs inside the oracle-gated query
    * too). Block-constant rasters make the LOSSY round-trip exact: a
    * constant 8×8 block's FDCT is DC-only (every AC coefficient
    * quantizes to zero under flat quant), the quantized DC
    * `4·(v−128)` is integer-exact, and the islow IDCT of a DC-only
    * block reproduces the constant bit-for-bit — so the decoded
    * pixels are a pure integer function of the text, independent of
    * any engine's quant tables, and the downstream phash is
    * SQL-recomputable by the DuckDB oracle (m13). Spec-pinned:
    * JpegSpec asserts decode∘encode ≡ identity on these rasters for
    * both our decoder and the JDK's.
    */
  def textToJpegOwn(df: DataFrame, idCol: String, textCol: String,
                    carry: Seq[String] = Nil): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val txtIdx = df.schema.fieldIndex(textCol)
    // `carry` rides metadata columns through the encode — re-joining
    // them afterwards would shuffle the encoded blobs (see
    // WavOps.textToWavOwn)
    val carryIdx = carry.map(df.schema.fieldIndex)
    val schema = StructType(
      Seq(StructField("id", LongType), StructField("jpeg", BinaryType)) ++
        carryIdx.map(df.schema.fields(_)))
    implicit val enc: Encoder[Row] = Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { row =>
        val cps =
          if (row.isNullAt(txtIdx)) Array.empty[Int]
          else row.getString(txtIdx).codePoints().toArray
        val px = blockConstantRaster16(b =>
          MultimodalOps.textPoint(cps, b, 4).toByte)
        Row.fromSeq(Seq(row.getLong(idIdx),
          encodeGray8Baseline(16, 16, px, restartInterval = 2)) ++
          carryIdx.map(row.get))
      }
    }.toDF("id" +: "jpeg" +: carry: _*)
  }

  /** 16×16 raster of four constant 8×8 blocks, row-major block index
    * `b = (blockRow·2 + blockCol)` — the exact-round-trip fixture
    * shape shared by [[textToJpegOwn]] and JpegSpec.
    */
  private[graft] def blockConstantRaster16(value: Int => Byte): Array[Byte] = {
    val px = new Array[Byte](256)
    var b = 0
    while (b < 4) {
      val v = value(b)
      val y0 = (b / 2) * 8; val x0 = (b % 2) * 8
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) { px((y0 + y) * 16 + (x0 + x)) = v; x += 1 }
        y += 1
      }
      b += 1
    }
    px
  }

  /** DataFrame metadata pass: `(id, n_bytes, format, width, height)`
    * from SOF0 only — blobs stay in their partitions, no entropy
    * decode (m10's shape for JPEG).
    */
  def jpegMeta(df: DataFrame, idCol: String, jpegCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val jIdx = df.schema.fieldIndex(jpegCol)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("n_bytes", IntegerType),
      StructField("format", StringType), StructField("width", IntegerType),
      StructField("height", IntegerType)))
    implicit val enc: Encoder[Row] = Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](jIdx)
        val m = readMeta(bytes)
        Row(row.getLong(idIdx), bytes.length, "jpeg", m.width, m.height)
      }
    }.toDF("id", "n_bytes", "format", "width", "height")
  }

  /** pHash over REAL decoded JPEG pixels — m11's shape for JPEG: the
    * full entropy+IDCT path feeds the same integer-exact DCT kernel.
    * Deterministic because the decode is (decoder-)deterministic even
    * though the ENCODE was lossy.
    */
  def jpegPhash(df: DataFrame, idCol: String, jpegCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val jIdx = df.schema.fieldIndex(jpegCol)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("width", IntegerType),
      StructField("height", IntegerType), StructField("sh", LongType)))
    implicit val enc: Encoder[Row] = Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { row =>
        val img = decodeGray8Baseline(row.getAs[Array[Byte]](jIdx))
        val grid = new Array[Long](64)
        var gy = 0
        while (gy < 8) {
          var gx = 0
          while (gx < 8) {
            val sy = (gy.toLong * img.height) / 8
            val sx = (gx.toLong * img.width) / 8
            grid(gy * 8 + gx) =
              (img.pixels(sy.toInt * img.width + sx.toInt) & 0xff).toLong
            gx += 1
          }
          gy += 1
        }
        Row(row.getLong(idIdx), img.width, img.height,
          PhashKernel.phash56FromGrid(grid))
      }
    }.toDF("id", "width", "height", "sh")
  }
}
