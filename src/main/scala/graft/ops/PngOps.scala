package graft.ops

import java.io.ByteArrayOutputStream
import java.util.zip.{Adler32, CRC32, Inflater}

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.types._

/** A real PNG codec for the 8-bit grayscale profile — the multimodal
  * family's "decode step is stubbed" caveat, retired for images.
  *
  * Public formats only: PNG (RFC 2083) with zlib (RFC 1950) / DEFLATE
  * (RFC 1951). The ENCODER emits non-interlaced 8-bit grayscale with
  * filter-0 rows in a single STORED deflate block (deterministic
  * byte-for-byte — CRC32 and Adler32 over fixed content), so fixture
  * blobs are reproducible anywhere. The DECODER is general for the
  * grayscale-8 profile: signature + per-chunk CRC verification, any
  * zlib stream (`java.util.zip.Inflater` — compressed or stored), and
  * all five PNG row filters (None/Sub/Up/Average/Paeth), i.e. it
  * round-trips PNGs written by real encoders, not just its own.
  *
  * Reference behavior: faust treats payloads as opaque bytes and
  * leaves decoding to app code (`faust/serializers/codecs.py:1-60`
  * registers codecs by name, no media kernels) — so the engine-level
  * contract here is the same as the reference's: bytes in, typed
  * columns out, decode logic pluggable per partition.
  *
  * Scale shape: both directions run inside `mapPartitions` batches —
  * blobs never cross a shuffle; metadata/filter first, decode last.
  */
object PngOps {

  private val Signature =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def be32(v: Long): Array[Byte] = Array(
    ((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
    ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def readBe32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  /** Encode 8-bit grayscale pixels (row-major, `w*h` bytes) as a valid
    * PNG. Layout is fully deterministic: one IHDR, one IDAT holding a
    * single stored deflate block (raw size `h*(w+1)` must fit the
    * 65535-byte stored-block cap), one IEND — total size
    * `68 + h*(w+1)` bytes, the spec-computable figure m10's oracle
    * checks against ImageIO's read-back.
    */
  def encodeGray8(w: Int, h: Int, px: Array[Byte]): Array[Byte] = {
    require(w >= 1 && h >= 1, s"bad dims ${w}x$h")
    require(px.length == w * h, s"need ${w * h} pixels, got ${px.length}")
    val raw = new Array[Byte](h * (w + 1)) // filter byte 0 + row pixels
    var r = 0
    while (r < h) {
      System.arraycopy(px, r * w, raw, r * (w + 1) + 1, w)
      r += 1
    }
    require(raw.length <= 0xffff,
      s"raw scanlines ${raw.length}B exceed one stored deflate block")
    val out = new ByteArrayOutputStream(68 + raw.length)
    def chunk(tag: String, body: Array[Byte]): Unit = {
      out.write(be32(body.length.toLong), 0, 4)
      val tb = tag.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      val crc = new CRC32()
      crc.update(tb); crc.update(body)
      out.write(tb, 0, 4)
      out.write(body, 0, body.length)
      out.write(be32(crc.getValue), 0, 4)
    }
    out.write(Signature, 0, 8)
    chunk("IHDR", be32(w.toLong) ++ be32(h.toLong) ++
      Array[Byte](8 /*bit depth*/ , 0 /*grayscale*/ , 0, 0, 0 /*no interlace*/))
    val ad = new Adler32()
    ad.update(raw)
    val nlen = ~raw.length
    chunk("IDAT", Array[Byte](0x78, 0x01, // zlib CMF/FLG (FCHECK-valid)
      0x01, // final stored block
      (raw.length & 0xff).toByte, ((raw.length >> 8) & 0xff).toByte,
      (nlen & 0xff).toByte, ((nlen >> 8) & 0xff).toByte) ++ raw ++
      be32(ad.getValue))
    chunk("IEND", Array.empty[Byte])
    out.toByteArray
  }

  /** Decoded grayscale image. */
  final case class Gray8(width: Int, height: Int, pixels: Array[Byte])

  /** Decode an 8-bit grayscale non-interlaced PNG: verifies the
    * signature and every chunk CRC, inflates the concatenated IDAT
    * zlib stream, and reverses whichever of the five row filters the
    * encoder chose. Throws on anything outside the profile — corrupt
    * media must surface, not pass silently (the tripletMine lesson).
    */
  def decodeGray8(png: Array[Byte]): Gray8 = {
    require(png.length > 8 && (0 until 8).forall(i => png(i) == Signature(i)),
      "not a PNG (bad signature)")
    var pos = 8
    var w = 0; var h = 0; var seenIhdr = false; var done = false
    val idat = new ByteArrayOutputStream()
    while (!done && pos + 12 <= png.length) {
      val len = readBe32(png, pos).toInt
      require(len >= 0 && pos + 12 + len <= png.length, "truncated chunk")
      val tag = new String(png, pos + 4, 4,
        java.nio.charset.StandardCharsets.US_ASCII)
      val crc = new CRC32()
      crc.update(png, pos + 4, 4 + len)
      require(crc.getValue == readBe32(png, pos + 8 + len),
        s"CRC mismatch in $tag chunk")
      tag match {
        case "IHDR" =>
          require(len == 13, s"IHDR must be 13 bytes, got $len")
          val wv = readBe32(png, pos + 8)
          val hv = readBe32(png, pos + 12)
          // spec-invalid zero dims and huge dims whose h*(w+1) would
          // overflow Int must surface as a named profile error, not a
          // downstream array exception or a silent empty image. Bound
          // each dim to Int.MaxValue FIRST (the PNG spec caps at
          // 2^31-1): wv/hv are unsigned-32 reads up to 2^32-1, so the
          // Long product alone could wrap past Long.MaxValue and slip
          // a negative result under the <= check.
          require(wv >= 1 && hv >= 1 &&
            wv <= Int.MaxValue && hv <= Int.MaxValue &&
            hv * (wv + 1) <= Int.MaxValue,
            s"bad dimensions ${wv}x$hv")
          w = wv.toInt
          h = hv.toInt
          val bitDepth = png(pos + 16); val colorType = png(pos + 17)
          val interlace = png(pos + 20)
          require(bitDepth == 8 && colorType == 0 && interlace == 0,
            s"unsupported profile: depth=$bitDepth color=$colorType " +
              s"interlace=$interlace (grayscale-8 non-interlaced only)")
          seenIhdr = true
        case "IDAT" => idat.write(png, pos + 8, len)
        case "IEND" => done = true
        case _ => () // ancillary chunks (tEXt, pHYs, ...) skip cleanly
      }
      pos += 12 + len
    }
    require(seenIhdr && done, "missing IHDR or IEND")
    val inf = new Inflater()
    inf.setInput(idat.toByteArray)
    val raw = new Array[Byte](h * (w + 1))
    var filled = 0
    while (filled < raw.length && !inf.finished()) {
      val n = inf.inflate(raw, filled, raw.length - filled)
      require(n > 0 || inf.finished(), "zlib stream stalled")
      filled += n
    }
    inf.end()
    require(filled == raw.length, s"short pixel data: $filled/${raw.length}")
    // reverse row filters (PNG spec §6): bpp = 1 for grayscale-8
    val out = new Array[Byte](w * h)
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    var r = 0
    while (r < h) {
      val ft = raw(r * (w + 1)) & 0xff
      var c = 0
      while (c < w) {
        val x = raw(r * (w + 1) + 1 + c) & 0xff
        val left = if (c > 0) out(r * w + c - 1) & 0xff else 0
        val up = if (r > 0) out((r - 1) * w + c) & 0xff else 0
        val ul = if (r > 0 && c > 0) out((r - 1) * w + c - 1) & 0xff else 0
        val v = ft match {
          case 0 => x
          case 1 => x + left
          case 2 => x + up
          case 3 => x + (left + up) / 2
          case 4 => x + paeth(left, up, ul)
          case other => throw new IllegalArgumentException(
            s"unknown PNG filter type $other in row $r")
        }
        out(r * w + c) = (v & 0xff).toByte
        c += 1
      }
      r += 1
    }
    Gray8(w, h, out)
  }

  // ── Spark-side operators (mapPartitions batch shape, blobs never
  //    shuffled) ──────────────────────────────────────────────────────

  private val blobSchema = StructType(Seq(
    StructField("id", LongType), StructField("png", BinaryType)))

  /** Render each document's text into a real PNG blob: the text's
    * codepoint stream is nearest-neighbor resized to `w*h` grayscale
    * pixels (the m05 raster rule at arbitrary dims), then PNG-encoded.
    * Dim columns are evaluated per row, so fixtures can vary geometry
    * by id.
    */
  def textToPng(df: DataFrame, idCol: String, textCol: String,
                wCol: String, hCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val txtIdx = df.schema.fieldIndex(textCol)
    val wIdx = df.schema.fieldIndex(wCol)
    val hIdx = df.schema.fieldIndex(hCol)
    implicit val enc: Encoder[Row] = Encoders.row(blobSchema)
    df.mapPartitions { rows =>
      rows.map { row =>
        val w = row.getInt(wIdx); val h = row.getInt(hIdx)
        val cps =
          if (row.isNullAt(txtIdx)) Array.empty[Int]
          else row.getString(txtIdx).codePoints().toArray
        val px = new Array[Byte](w * h)
        var c = 0
        while (c < px.length) {
          px(c) = MultimodalOps.textPoint(cps, c, px.length).toByte
          c += 1
        }
        Row(row.getLong(idIdx), encodeGray8(w, h, px))
      }
    }.toDF("id", "png")
  }

  /** Decode PNG blobs and hash the REAL pixels: full [[decodeGray8]]
    * (CRC + inflate + unfilter), then the same integer-exact DCT
    * kernel the text-raster pHash uses
    * ([[PhashKernel.phash56FromGrid]]). Emits
    * `(id, width, height, sh)` — 8×8 inputs feed the grid directly;
    * larger images are nearest-neighbor reduced to 8×8 first (the
    * standard pHash resize).
    */
  def pngPhash(df: DataFrame, idCol: String, pngCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val pngIdx = df.schema.fieldIndex(pngCol)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("width", IntegerType),
      StructField("height", IntegerType), StructField("sh", LongType)))
    implicit val enc: Encoder[Row] = Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { row =>
        val img = decodeGray8(row.getAs[Array[Byte]](pngIdx))
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
