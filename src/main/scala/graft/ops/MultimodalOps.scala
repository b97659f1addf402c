package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` with typed
  * metadata, processed batch-wise via `mapPartitions`.
  *
  * The decode kernels themselves are STUBBED (no image/audio libs in
  * this environment) behind [[Decoder]]: the deterministic fake reads
  * real bytes and emits plausible metadata, so the Spark-side plumbing
  * — schema, partitioning, batch iteration shape, null handling — is
  * real and tested. Swapping in a JNI/FFmpeg decoder changes one
  * function, not the pipeline.
  *
  * Scale notes: `mapPartitions` keeps per-record decoder setup
  * amortized per partition (the reason Python pipelines use
  * mapInPandas); binary payloads never pass through a shuffle here —
  * filter/project on metadata first, decode last.
  */
object MultimodalOps {

  /** THE deterministic text→value sampling rule every own-encoded
    * media fixture shares (PNG raster, JPEG blocks, WAV samples, GIF
    * frames): slot `i` of `slots` reads the codepoint at
    * `(i·len)/slots`, mod 256; empty text yields 0. Centralized so
    * the rule and its SQL replay (`ascii(substr(text,
    * (i*length(text))//slots + 1, 1)) % 256`) have exactly one
    * authoritative definition.
    */
  private[ops] def textPoint(cps: Array[Int], i: Int, slots: Int): Int = {
    val n = cps.length.toLong
    if (n > 0) cps(((i * n) / slots).toInt) % 256 else 0
  }

  /** Typed metadata extracted from a media blob. */
  final case class MediaMeta(id: Long, nBytes: Int, format: String,
                             width: Int, height: Int, durationMs: Long)

  /** Pluggable per-partition decoder. Implementations must be
    * deterministic for testability.
    */
  trait Decoder extends Serializable {
    def decode(id: Long, bytes: Array[Byte]): MediaMeta
  }

  /** Deterministic fake decode: derives metadata purely from byte
    * content (length + first-bytes fingerprint). Stands in for the
    * real kernel — replace with an actual image/audio probe.
    */
  object FakeDecoder extends Decoder {
    private val formats = Array("jpeg", "png", "wav", "mp4")
    def decode(id: Long, bytes: Array[Byte]): MediaMeta = {
      val n = bytes.length
      val head = if (n == 0) 0 else java.util.Arrays.hashCode(
        java.util.Arrays.copyOf(bytes, math.min(8, n))).abs
      MediaMeta(id, n, formats(head % formats.length),
        width = 64 + head % 1024, height = 64 + (head / 7) % 1024,
        durationMs = n.toLong * 10)
    }
  }

  /** REAL image decode via `javax.imageio` (in the JDK — no external
    * libs): width/height/format for PNG/JPEG/GIF/BMP from the header
    * only (`ImageReader.getWidth(0)` never decodes pixels — the right
    * cost model for metadata extraction over 100 TB of blobs). Falls
    * back to [[FakeDecoder]] for formats ImageIO has no reader for
    * (audio/video), proving the pluggable-decoder contract with an
    * actual kernel while keeping the pipeline total.
    */
  object ImageIoDecoder extends Decoder {
    def decode(id: Long, bytes: Array[Byte]): MediaMeta = {
      if (bytes.isEmpty) return FakeDecoder.decode(id, bytes)
      // MemoryCacheImageInputStream, NOT ImageIO.createImageInputStream:
      // the factory honors useCache=true by spilling to a disk temp file
      // per blob — pointless syscalls when the bytes are already in
      // memory, and the wrong cost model for a 100 TB metadata pass.
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return FakeDecoder.decode(id, bytes)
        val r = readers.next()
        try {
          r.setInput(iis, true, true)
          MediaMeta(id, bytes.length, r.getFormatName.toLowerCase,
            r.getWidth(0), r.getHeight(0), durationMs = 0L)
        } catch {
          // corrupt/truncated image (magic bytes matched, header didn't
          // parse): stay TOTAL — a bad record must not kill the job
          case _: Exception => FakeDecoder.decode(id, bytes)
        } finally r.dispose()
      } finally iis.close()
    }
  }

  implicit private val metaEnc: Encoder[MediaMeta] = Encoders.product[MediaMeta]

  /** Decode a frame of (id: long, blob: binary) into typed metadata.
    * One decoder instance per partition — the mapInPandas batch shape.
    */
  def decodeMeta(df: DataFrame, idCol: String, blobCol: String,
                 decoder: Decoder = FakeDecoder): Dataset[MediaMeta] = {
    val idIdx = df.schema.fieldIndex(idCol)
    val blobIdx = df.schema.fieldIndex(blobCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = if (r.isNullAt(blobIdx)) Array.empty[Byte]
          else r.getAs[Array[Byte]](blobIdx)
        decoder.decode(r.getLong(idIdx), bytes)
      }
    }
  }

  /** Feature-extraction stub: a deterministic `dim`-dimensional unit
    * embedding derived from the blob's MD5 (4 hex digits per
    * dimension, mapped to [-1, 1]). Stands in for a real image/audio
    * encoder with the same pipeline shape — blob in, fixed-width
    * vector out, ready for VectorOps ANN — while staying reproducible
    * in any engine (the oracle recomputes it from md5 hex).
    */
  def fakeEmbed(df: DataFrame, idCol: String, blobCol: String,
                dim: Int = 8): DataFrame = {
    require(dim >= 1 && dim <= 8, "md5 has 32 hex digits: at most 8 4-digit dims")
    val h = md5(col(blobCol))
    val feats = (0 until dim).map { i =>
      conv(substring(h, 4 * i + 1, 4), 16, 10).cast("double") / 65535.0 * 2.0 - 1.0
    }
    df.select(col(idCol), array(feats: _*).as("embedding"))
  }

  /** Aspect-preserving resize planning: fit (w, h) into (maxW, maxH)
    * without upscaling — the metadata half of a resize operator, pure
    * column arithmetic (runs BEFORE decode so undersized media skips
    * the kernel entirely; deterministic IEEE ops → oracle-checkable).
    * Returns (outW, outH).
    */
  def resizeDims(w: org.apache.spark.sql.Column, h: org.apache.spark.sql.Column,
                 maxW: Int, maxH: Int):
      (org.apache.spark.sql.Column, org.apache.spark.sql.Column) = {
    val scale = least(lit(maxW).cast("double") / w, lit(maxH).cast("double") / h,
      lit(1.0))
    (floor(w * scale).cast("int"), floor(h * scale).cast("int"))
  }

  /** Resize kernel STUB via the same per-partition batch shape as
    * [[decodeMeta]]: consumes real bytes, emits a deterministic
    * "resized" payload (truncation to the planned byte budget stands
    * in for the pixel kernel). Swap the body for a real scaler; the
    * pipeline — metadata-planned dims in, bounded blob out, blobs
    * never shuffled — is the part under test.
    */
  def resizeBlobs(df: DataFrame, idCol: String, blobCol: String,
                  outWCol: String, outHCol: String,
                  bytesPerPixel: Double = 0.125): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("out_w", IntegerType),
      StructField("out_h", IntegerType), StructField("out_bytes", BinaryType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val blobIdx = df.schema.fieldIndex(blobCol)
    val wIdx = df.schema.fieldIndex(outWCol)
    val hIdx = df.schema.fieldIndex(outHCol)
    implicit val enc: Encoder[Row] = Encoders.row(schema)
    df.mapPartitions { rows =>
      // per-partition kernel setup would go here (the amortization point)
      rows.map { r =>
        val bytes = if (r.isNullAt(blobIdx)) Array.empty[Byte]
          else r.getAs[Array[Byte]](blobIdx)
        val w = r.getInt(wIdx); val h = r.getInt(hIdx)
        val budget = math.max(1, (w * h * bytesPerPixel).toInt)
        Row(r.getLong(idIdx), w, h,
          java.util.Arrays.copyOf(bytes, math.min(bytes.length, budget)))
      }
    }
  }

  /** Frame-sample stub: pick every `stride`-th chunk offset of a blob
    * (the partition/batch shape of real frame extraction).
    */
  def sampleOffsets(df: DataFrame, idCol: String, blobCol: String,
                    chunkSize: Int, stride: Int): DataFrame =
    df.select(col(idCol), octet_length(col(blobCol)).as("n_bytes"))
      .withColumn("n_chunks", ceil(col("n_bytes") / chunkSize).cast("int"))
      // guard: sequence(0, -1) on empty blobs would yield [0, -1]
      .withColumn("offsets",
        when(col("n_chunks") > 0,
          filter(transform(sequence(lit(0), col("n_chunks") - 1), i => i * chunkSize),
            (_, i) => i % stride === 0))
          .otherwise(array().cast("array<int>")))

  /** Fixed-point orthonormal DCT-II basis, `K[u][x] =
    * round(a(u)·cos((2x+1)uπ/16)·8192)` with `a(0)=1/(2√2)`,
    * `a(u>0)=1/2` — the standard 8-point DCT matrix scaled to
    * integers so the transform is EXACT integer arithmetic: both the
    * Spark plan and the DuckDB oracle consume these same 64 literals
    * (via [[dctBasisSqlValues]]), so no floating-point cos() ever
    * runs at query time on either engine and the hash is
    * bit-reproducible across engines by construction.
    */
  private[graft] val dctBasis: Array[Array[Long]] =
    Array.tabulate(8, 8) { (u, x) =>
      val a = if (u == 0) 1.0 / (2.0 * math.sqrt(2.0)) else 0.5
      math.round(a * math.cos((2 * x + 1) * u * math.Pi / 16.0) * 8192.0)
    }

  /** The basis as DuckDB `VALUES` rows `(u, x, kv)` for oracle SQL. */
  def dctBasisSqlValues: String =
    (for (u <- 0 until 8; x <- 0 until 8)
      yield s"($u,$x,${dctBasis(u)(x)})").mkString(",")

  /** 56-bit perceptual hash — the REAL pHash pipeline (resize → 2D
    * DCT-II → low-frequency bits), per Zauner, "Implementation and
    * Benchmarking of Perceptual Image Hash Functions" (2010):
    *
    *  1. decode: the container ships no image codecs, so the "pixel"
    *     stream is the document's codepoint stream (`ascii % 256`) —
    *     the ONE honestly-fake step; every later stage is the real
    *     algorithm and survives a real decoder swap unchanged;
    *  2. resize: nearest-neighbor downscale of that 1-D raster to an
    *     8×8 grid — cell k samples offset `(k·len) >> 6`;
    *  3. transform: exact fixed-point 8×8 DCT-II via [[dctBasis]]
    *     (`F = K·P·Kᵀ`, all integer multiply-adds);
    *  4. bits: the 56 lowest-frequency AC coefficients (row-major
    *     indices 1..56, DC dropped) each compare against the AC mean
    *     — `F[k]·56 > ΣF` keeps the comparison integer-exact.
    *
    * Emits `(id, sh)` with `sh` in `[0, 2^56)` — bits 56..59 zero, so
    * the value fits the 60-bit Hamming-LSH contract of
    * [[TextOps.hammingPairsFromSignatures]]. The px / coef stages
    * materialize as array columns so the 56×64 multiply-add fan-out
    * indexes computed arrays instead of re-running the substr scan.
    */
  def phashDct(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"), phashDct56(col(textCol)).as("sh"))

  /** The hash as a column — a single-pass native expression (the
    * 3.6k-multiply-add kernel would be an OOM-sized Catalyst tree as
    * declarative expressions; as a fused JVM kernel it is one codegen
    * call, the SimHash60 pattern).
    */
  def phashDct56(text: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      PhashDct56(org.apache.spark.sql.graftbridge.ColumnBridge.expression(text)))

  /** Fixed-point integer bilinear resize of an 8-bit grayscale raster —
    * the REAL resize member of the multimodal quartet (decode /
    * feature-extract / RESIZE / frame-sample): 16.16 source
    * coordinates (`fx = tx·(sw−1)·65536 / (tw−1)`, integer division),
    * 4-tap blend in 64-bit integers, floor descale by 2^32 — fully
    * deterministic and SQL-replayable (every intermediate is
    * non-negative, so DuckDB's truncating `//` IS floor here). Edge
    * taps clamp (`x1 = min(ix+1, sw−1)`), weight 0 when clamped.
    * Degenerate 1-wide/1-tall targets pin to source origin.
    */
  def resizeBilinearGray8(src: Array[Byte], sw: Int, sh: Int,
                          tw: Int, th: Int): Array[Int] = {
    require(sw >= 1 && sh >= 1 && tw >= 1 && th >= 1, "bad dims")
    require(src.length == sw * sh, "source size mismatch")
    val out = new Array[Int](tw * th)
    var ty = 0
    while (ty < th) {
      val fy = if (th == 1) 0L else ty.toLong * (sh - 1) * 65536L / (th - 1)
      val iy = (fy >> 16).toInt; val dy = fy & 0xffffL
      val y1 = math.min(iy + 1, sh - 1)
      var tx = 0
      while (tx < tw) {
        val fx = if (tw == 1) 0L else tx.toLong * (sw - 1) * 65536L / (tw - 1)
        val ix = (fx >> 16).toInt; val dx = fx & 0xffffL
        val x1 = math.min(ix + 1, sw - 1)
        val p00 = src(iy * sw + ix) & 0xff
        val p01 = src(iy * sw + x1) & 0xff
        val p10 = src(y1 * sw + ix) & 0xff
        val p11 = src(y1 * sw + x1) & 0xff
        val top = p00 * (65536L - dx) + p01 * dx
        val bot = p10 * (65536L - dx) + p11 * dx
        out(ty * tw + tx) =
          ((top * (65536L - dy) + bot * dy) >> 32).toInt
        tx += 1
      }
      ty += 1
    }
    out
  }

  /** m17's DataFrame pass: decode each PNG (the REAL decoder —
    * signature, chunk CRCs, inflate, row filters), bilinear-resize to
    * `tw×th`, one row per target cell: `(id, cell, px)` — exploded so
    * the oracle compares every resized pixel.
    */
  def realResize(df: DataFrame, idCol: String, pngCol: String,
                 tw: Int, th: Int): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(pngCol)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("cell", IntegerType),
      StructField("px", IntegerType)))
    implicit val enc: org.apache.spark.sql.Encoder[Row] = Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.flatMap { row =>
        val img = PngOps.decodeGray8(row.getAs[Array[Byte]](pIdx))
        val r = resizeBilinearGray8(img.pixels, img.width, img.height, tw, th)
        val id = row.getLong(idIdx)
        r.indices.map(c => Row(id, c, r(c)))
      }
    }.toDF("id", "cell", "px")
  }

  /** Perceptual near-duplicate image pairs — the image-dedup member of
    * the near-dup family: [[phashDct]] signatures fed through the
    * same banded Hamming-LSH as SimHash text dedup (d07), at
    * distinct-signature granularity with pigeonhole-complete recall
    * for `maxHamming < bands`. Raster sources never cross the shuffle
    * — only (band, 15-bit slice) keys and 8-byte signatures do.
    */
  def perceptualNearDupPairs(df: DataFrame, idCol: String, textCol: String,
                             maxHamming: Int = 3, bands: Int = 4): DataFrame =
    TextOps.hammingPairsFromSignatures(
      phashDct(df, idCol, textCol), maxHamming, bands)
}

/** JVM kernel for the 56-bit perceptual hash — resize → fixed-point
  * 2D DCT-II → AC-mean threshold, all integer arithmetic over
  * [[MultimodalOps.dctBasis]]. Top-level object so generated code can
  * call the static forwarder.
  */
object PhashKernel {

  /** See [[MultimodalOps.phashDct]] for the algorithm contract; the
    * DuckDB oracle in m05 recomputes this value from the same basis
    * literals, so every step here must stay integer-exact.
    */
  def phash56(t: org.apache.spark.unsafe.types.UTF8String): Long = {
    val cps = t.toString.codePoints().toArray
    val n = cps.length.toLong
    // 8×8 raster: nearest-neighbor sample of the codepoint stream at
    // offset (cell·n) >> 6 — P[x][y] with cell = x*8 + y
    val p = new Array[Long](64)
    var c = 0
    while (c < 64) {
      p(c) = if (n > 0) (cps(((c * n) >>> 6).toInt) % 256).toLong else 0L
      c += 1
    }
    phash56FromGrid(p)
  }

  /** The DCT + AC-mean-threshold half of [[phash56]] over an
    * already-resized 8×8 grid (row-major, values 0..255) — exposed so
    * a REAL pixel source (the PNG decode path, m11) feeds the same
    * integer-exact kernel the text raster does.
    */
  def phash56FromGrid(p: Array[Long]): Long = {
    val k = MultimodalOps.dctBasis
    // separable DCT: tmp(u)(y) = Σ_x K[u][x]·P[x][y]
    val tmp = Array.ofDim[Long](8, 8)
    var u = 0
    while (u < 8) {
      var y = 0
      while (y < 8) {
        var acc = 0L; var x = 0
        while (x < 8) { acc += k(u)(x) * p(x * 8 + y); x += 1 }
        tmp(u)(y) = acc; y += 1
      }
      u += 1
    }
    // F(u,v) = Σ_y K[v][y]·tmp(u)(y); AC coefficients uv = u*8+v in 1..56
    val coef = new Array[Long](57)
    var uv = 1
    var acSum = 0L
    while (uv <= 56) {
      val uu = uv >> 3; val vv = uv & 7
      var acc = 0L; var y = 0
      while (y < 8) { acc += k(vv)(y) * tmp(uu)(y); y += 1 }
      coef(uv) = acc; acSum += acc; uv += 1
    }
    var sh = 0L
    uv = 1
    while (uv <= 56) {
      if (coef(uv) * 56L > acSum) sh |= 1L << (uv - 1)
      uv += 1
    }
    sh
  }
}

/** Catalyst expression wrapper for [[PhashKernel.phash56]] — null-safe,
  * codegen'd as one static call (the SimHash60 pattern).
  */
case class PhashDct56(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"text argument must be string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    PhashKernel.phash56(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.PhashKernel.phash56($c)")

  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): PhashDct56 =
    copy(child = c)
}
