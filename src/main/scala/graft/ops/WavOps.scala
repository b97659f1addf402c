package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.types._

/** A real RIFF/WAVE PCM codec — the AUDIO member of the multimodal
  * decode family, next to [[PngOps]] (lossless image) and [[JpegOps]]
  * (lossy image): byte-level container parse (RIFF chunk walk), typed
  * metadata without full decode, full sample decode inside
  * `mapPartitions` (blobs never cross a shuffle — the m01 contract),
  * and integer-exact feature extraction (peak / energy / zero
  * crossings — the audio analog of the image phash) so the DuckDB
  * oracle can recompute every output.
  *
  * Public format only: RIFF WAVE, fmt chunk audio format 1 (PCM),
  * 16-bit little-endian samples, interleaved channels. Anything else
  * (float WAV, ADPCM, extensible) throws a named profile error.
  *
  * Reference behavior: faust treats payloads as opaque bytes and
  * leaves decoding to app code (`faust/serializers/codecs.py:1-60`);
  * the engine contract is the same — bytes in, typed columns out.
  * WavSpec cross-checks the decode against the JDK's own
  * `javax.sound.sampled` reader (an independent RIFF implementation).
  */
object WavOps {

  final case class WavMeta(sampleRate: Int, channels: Int,
                           bitsPerSample: Int, nFrames: Int)

  private def u16le(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def u32le(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  /** Walk the RIFF chunk list to `fmt ` and `data` and return the
    * frame-level metadata — the cheap pass (no sample decode).
    */
  def readMeta(wav: Array[Byte]): WavMeta = {
    require(wav.length >= 44 &&
      wav(0) == 'R' && wav(1) == 'I' && wav(2) == 'F' && wav(3) == 'F' &&
      wav(8) == 'W' && wav(9) == 'A' && wav(10) == 'V' && wav(11) == 'E',
      "not a RIFF/WAVE stream")
    var pos = 12
    var rate = -1; var ch = -1; var bits = -1; var dataLen = -1L
    while (pos + 8 <= wav.length && (rate < 0 || dataLen < 0)) {
      val id = new String(wav, pos, 4, "US-ASCII")
      val len = u32le(wav, pos + 4)
      // a declared chunk length can't exceed what's physically in the
      // stream — hostile u32 lengths (≈ 2^32) would otherwise wrap the
      // Int advance below into a no-op (infinite loop) or a negative
      // index; die with the named error instead
      require(len <= wav.length.toLong - pos - 8,
        s"truncated $id chunk (declared $len bytes past end of stream)")
      id match {
        case "fmt " =>
          require(len >= 16, "truncated fmt chunk")
          val fmt = u16le(wav, pos + 8)
          require(fmt == 1, s"unsupported WAV audio format $fmt (PCM only)")
          ch = u16le(wav, pos + 10)
          rate = u32le(wav, pos + 12).toInt
          bits = u16le(wav, pos + 22)
          require(bits == 16, s"unsupported bit depth $bits (PCM16 only)")
          require(ch >= 1 && ch <= 8, s"unsupported channel count $ch")
        case "data" => dataLen = len
        case _ => () // LIST/INFO/fact/... skipped
      }
      // chunks are word-aligned: odd lengths carry a pad byte
      pos += 8 + len.toInt + (len.toInt & 1)
    }
    require(rate > 0, "missing fmt chunk")
    require(dataLen >= 0, "missing data chunk")
    require(dataLen % (2L * ch) == 0, "data chunk is not whole frames")
    // dataLen ≤ wav.length (checked above) keeps nFrames inside Int
    WavMeta(rate, ch, 16, (dataLen / (2L * ch)).toInt)
  }

  /** Decode to interleaved 16-bit samples (frame-major: frame f,
    * channel c at index `f·channels + c`).
    */
  def decodePcm16(wav: Array[Byte]): (WavMeta, Array[Short]) = {
    val meta = readMeta(wav)
    // find the data chunk again (cheap — headers are tiny); readMeta
    // already validated every chunk length against the stream, so
    // this walk terminates, but keep the bound anyway
    var pos = 12
    while (!(wav(pos) == 'd' && wav(pos + 1) == 'a' && wav(pos + 2) == 't' &&
      wav(pos + 3) == 'a')) {
      val len = u32le(wav, pos + 4).toInt
      pos += 8 + len + (len & 1)
      require(pos + 8 <= wav.length, "truncated stream (data chunk lost)")
    }
    val n = meta.nFrames * meta.channels
    require(pos + 8 + 2L * n <= wav.length, "truncated data chunk")
    val out = new Array[Short](n)
    var i = 0
    while (i < n) {
      out(i) = ((wav(pos + 8 + 2 * i) & 0xff) |
        (wav(pos + 9 + 2 * i) << 8)).toShort
      i += 1
    }
    (meta, out)
  }

  /** Encode interleaved PCM16 frames as a canonical 44-byte-header
    * WAV — deterministic byte-for-byte; decodable by any conformant
    * reader (WavSpec cross-checks the JDK's javax.sound reader on
    * this output).
    */
  def encodePcm16Wav(sampleRate: Int, channels: Int,
                     samples: Array[Short]): Array[Byte] = {
    require(channels >= 1 && channels <= 8, s"bad channel count $channels")
    require(samples.length % channels == 0, "samples must be whole frames")
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def w32(off: Int, v: Long): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte
      out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    def w16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
    }
    def tag(off: Int, s: String): Unit = {
      var i = 0
      while (i < 4) { out(off + i) = s.charAt(i).toByte; i += 1 }
    }
    tag(0, "RIFF"); w32(4, 36L + dataLen); tag(8, "WAVE")
    tag(12, "fmt "); w32(16, 16L); w16(20, 1); w16(22, channels)
    w32(24, sampleRate); w32(28, sampleRate.toLong * channels * 2)
    w16(32, channels * 2); w16(34, 16)
    tag(36, "data"); w32(40, dataLen)
    var i = 0
    while (i < samples.length) {
      out(44 + 2 * i) = (samples(i) & 0xff).toByte
      out(45 + 2 * i) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  /** Deterministic audio fixture: each doc's text becomes a stereo
    * 32-frame PCM16 clip — sample `i` (of 64, frame-major interleave)
    * is `(cp((i·len)/64) % 256 − 128) · 256` (full 16-bit swing, pure
    * function of the text, the m05/m13 sampling rule). Emits
    * `(id, wav)`.
    */
  def textToWavOwn(df: DataFrame, idCol: String, textCol: String,
                   carry: Seq[String] = Nil): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val txtIdx = df.schema.fieldIndex(textCol)
    // `carry` columns ride ALONG the encode instead of being joined
    // back afterwards — a metadata column (source, lang) carried here
    // costs bytes in one narrow map; re-attaching it later costs a
    // full shuffle of the encoded BLOBS (the m24 packing path's join)
    val carryIdx = carry.map(df.schema.fieldIndex)
    val schema = StructType(
      Seq(StructField("id", LongType), StructField("wav", BinaryType)) ++
        carryIdx.map(df.schema.fields(_)))
    implicit val enc: Encoder[Row] = Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { row =>
        val cps =
          if (row.isNullAt(txtIdx)) Array.empty[Int]
          else row.getString(txtIdx).codePoints().toArray
        val samples = Array.tabulate(64) { i =>
          ((MultimodalOps.textPoint(cps, i, 64) - 128) * 256).toShort
        }
        Row.fromSeq(Seq(row.getLong(idIdx), encodePcm16Wav(8000, 2, samples)) ++
          carryIdx.map(row.get))
      }
    }.toDF("id" +: "wav" +: carry: _*)
  }

  /** Feature extraction over REAL decoded samples — the audio analog
    * of the image phash, all integer-exact so the oracle recomputes
    * each column: `(id, sample_rate, channels, n_frames, peak,
    * sumsq, zero_crossings)` where `peak = max |s|` over all samples,
    * `sumsq = Σ s²` (energy, BIGINT), and `zero_crossings` counts
    * channel-0 sign flips (`s < 0` changing between consecutive
    * frames).
    */
  def wavStats(df: DataFrame, idCol: String, wavCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val wIdx = df.schema.fieldIndex(wavCol)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("sample_rate", IntegerType),
      StructField("channels", IntegerType), StructField("n_frames", IntegerType),
      StructField("peak", IntegerType), StructField("sumsq", LongType),
      StructField("zero_crossings", IntegerType)))
    implicit val enc: Encoder[Row] = Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { row =>
        val (meta, s) = decodePcm16(row.getAs[Array[Byte]](wIdx))
        var peak = 0; var sumsq = 0L; var zc = 0
        var i = 0
        while (i < s.length) {
          val v = s(i).toInt
          val a = math.abs(v)
          if (a > peak) peak = a
          sumsq += v.toLong * v
          i += 1
        }
        var f = 1
        while (f < meta.nFrames) {
          if ((s(f * meta.channels) < 0) != (s((f - 1) * meta.channels) < 0))
            zc += 1
          f += 1
        }
        Row(row.getLong(idIdx), meta.sampleRate, meta.channels,
          meta.nFrames, peak, sumsq, zc)
      }
    }.toDF("id", "sample_rate", "channels", "n_frames", "peak", "sumsq",
      "zero_crossings")
  }

  /** Windowed feature CONTOUR — the audio analog of m16's frame
    * sampling: decode once, then emit one row per fixed-length
    * analysis window (`frameLen` frames, last window ragged) with
    * integer-exact features over the window's samples:
    * `(id, win, win_frames, peak, sumsq, zero_crossings)`.
    *
    * `peak`/`sumsq` run over ALL channels of the window's frames;
    * `zero_crossings` counts channel-0 sign flips between consecutive
    * frames WITHIN the window (the first frame of a window never
    * crosses — windows are independently recomputable, which is what
    * lets each window parallelize and the oracle replay it with a
    * plain `GROUP BY frame // frameLen`).
    *
    * Scale shape: one decode per blob inside `mapPartitions` (blobs
    * never cross a shuffle — the m01 contract); output is
    * `n_frames / frameLen` skinny rows per clip, so downstream
    * aggregation shuffles feature rows, never audio bytes. At 100 TB
    * the decode is embarrassingly parallel over the blob partitioning.
    */
  def wavFrameEnergy(df: DataFrame, idCol: String, wavCol: String,
                     frameLen: Int): DataFrame = {
    require(frameLen >= 1, s"frameLen must be >= 1, got $frameLen")
    val idIdx = df.schema.fieldIndex(idCol)
    val wIdx = df.schema.fieldIndex(wavCol)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("win", IntegerType),
      StructField("win_frames", IntegerType), StructField("peak", IntegerType),
      StructField("sumsq", LongType),
      StructField("zero_crossings", IntegerType)))
    implicit val enc: Encoder[Row] = Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.flatMap { row =>
        val (meta, s) = decodePcm16(row.getAs[Array[Byte]](wIdx))
        val id = row.getLong(idIdx)
        val ch = meta.channels
        val nWins = (meta.nFrames + frameLen - 1) / frameLen
        (0 until nWins).iterator.map { w =>
          val f0 = w * frameLen
          val f1 = math.min(meta.nFrames, f0 + frameLen)
          var peak = 0; var sumsq = 0L; var zc = 0
          var f = f0
          while (f < f1) {
            var c = 0
            while (c < ch) {
              val v = s(f * ch + c).toInt
              val a = math.abs(v)
              if (a > peak) peak = a
              sumsq += v.toLong * v
              c += 1
            }
            if (f > f0 && ((s(f * ch) < 0) != (s((f - 1) * ch) < 0))) zc += 1
            f += 1
          }
          Row(id, w, f1 - f0, peak, sumsq, zc)
        }
      }
    }.toDF("id", "win", "win_frames", "peak", "sumsq", "zero_crossings")
  }
}
