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

  /** 56-bit perceptual-hash STUB (the dHash shape): the real kernel
    * decodes, downscales to an 8×8 grayscale grid, and emits one bit
    * per horizontal gradient (`pixel[r][c] > pixel[r][c+1]`); this
    * stub derives the pseudo-pixel grid from the blob's MD5 chain —
    * row r's eight pixels are the 4-hex-digit words of
    * `md5(md5(blob) || ':' || r)` — so the signature → banding →
    * verify machinery downstream is real, deterministic, and
    * engine-recomputable, while the pixel source remains an honestly
    * documented stub (swap ONE expression for a decode+downscale
    * kernel; the gradient/banding layers don't change). Bits 56..59
    * are zero: the value fits the 60-bit Hamming-LSH contract of
    * [[TextOps.hammingPairsFromSignatures]].
    */
  def phashStub(blob: Column): Column = {
    val h = md5(blob)
    val terms = for (r <- 0 until 8; c <- 0 until 7) yield {
      val rowHex = md5(concat(h, lit(":" + r)))
      val p1 = conv(substring(rowHex, 4 * c + 1, 4), 16, 10).cast("long")
      val p2 = conv(substring(rowHex, 4 * c + 5, 4), 16, 10).cast("long")
      when(p1 > p2, lit(1L << (r * 7 + c))).otherwise(lit(0L))
    }
    terms.reduce(_ + _)
  }

  /** Perceptual near-duplicate image pairs — the image-dedup member of
    * the near-dup family: [[phashStub]] signatures fed through the
    * same banded Hamming-LSH as SimHash text dedup (d07), at
    * distinct-signature granularity with pigeonhole-complete recall
    * for `maxHamming < bands`. Blobs never cross the shuffle — only
    * (band, 15-bit slice) keys and 8-byte signatures do.
    */
  def perceptualNearDupPairs(df: DataFrame, idCol: String, blobCol: String,
                             maxHamming: Int = 3, bands: Int = 4): DataFrame =
    TextOps.hammingPairsFromSignatures(
      df.select(col(idCol).as("id"), phashStub(col(blobCol)).as("sh")),
      maxHamming, bands)
}
