package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.types._

/** MP3 (MPEG-1 Audio Layer III, ISO/IEC 11172-3) FRAME-HEADER walk —
  * the audio-container metadata member of the multimodal family,
  * m19's GIF-timing posture applied to the other ubiquitous container:
  * duration, frame count, and bitrate profile of an audio corpus come
  * from a HEADER-ONLY scan (4 bytes per frame + arithmetic skip),
  * never from decoding audio.
  *
  * Header layout (public spec): 11-bit sync `0x7FF`, 2-bit version
  * (MPEG-1 = 0b11), 2-bit layer (III = 0b01), CRC flag; then
  * bitrate index (4 bits, table below), sample-rate index (2 bits:
  * 44100/48000/32000), padding bit. Frame byte length for Layer III
  * MPEG-1 is `floor(144 * bitrate / sampleRate) + padding`, each
  * frame carrying 1152 PCM samples — so a walk that only READS
  * HEADERS yields exact duration. VBR streams vary the bitrate index
  * per frame; the walk sums per-frame kbps for the average. A leading
  * ID3v2 tag (10-byte header + 28-bit SYNCSAFE size) is skipped, not
  * parsed.
  *
  * Scope (named rejections): MPEG-1 Layer III only (the "MP3" of
  * crawls); free-format (bitrate index 0) and the reserved indexes
  * (bitrate 15, sample-rate 3) are refused by name; truncated frames
  * and tags are named errors, never silent EOF underruns. A trailing
  * ID3v1 tag (the 128-byte `TAG` block real-world encoders append) is
  * skipped like the leading ID3v2. A Xing/Info (LAME) or VBRI VBR
  * header riding in the FIRST frame is metadata, not audio: it is
  * sniffed at its spec offset (after the 4-byte header + MPEG-1 side
  * info — 17 bytes mono, 32 otherwise; VBRI fixed at 32) and skipped
  * like the tags, so duration is exact on real VBR corpora
  * (round 18; previously counted-as-audio with a named ~26 ms bias).
  * Consequence, by name: a stream whose ONLY frame is the VBR header
  * (a download truncated right after it) now rejects with "contains
  * no frames" — zero audio is an error in this profile, matching the
  * other truncation rejections.
  */
object Mp3Ops {

  /** MPEG-1 Layer III bitrate table, kbps by header index 1–14. */
  private[ops] val kbpsTable: Array[Int] =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)

  /** Sample-rate table by header index 0–2. */
  private[ops] val srTable: Array[Int] = Array(44100, 48000, 32000)

  private val samplesPerFrame = 1152

  /** Parsed stream metadata: everything a corpus census needs, all
    * integer-exact. `durationUs` floors (nFrames · 1152 · 1e6) / sr.
    */
  final case class Mp3Meta(sampleRate: Int, nFrames: Int, sumBytes: Long,
                           sumKbps: Long, durationUs: Long, id3Bytes: Int)

  private def frameLen(kbps: Int, sr: Int, padding: Int): Int =
    144000 * kbps / sr + padding

  /** Header-only walk: skip an optional ID3v2 tag, then read each
    * 4-byte frame header and SKIP the payload by computed length.
    * Hostile-input guarded — every read is bounds-checked first.
    */
  def mp3Meta(mp3: Array[Byte]): Mp3Meta = {
    require(mp3.length >= 4, "not an MP3 stream (too short)")
    var pos = 0
    var id3 = 0
    if (mp3.length >= 10 && mp3(0) == 'I' && mp3(1) == 'D' && mp3(2) == '3') {
      // ID3v2: 10-byte header; size is 4 SYNCSAFE bytes (7 bits each,
      // high bit must be clear), EXCLUDING the header itself
      (6 until 10).foreach(i => require((mp3(i) & 0x80) == 0,
        "ID3v2 size bytes must be syncsafe"))
      val size = ((mp3(6) & 0x7f) << 21) | ((mp3(7) & 0x7f) << 14) |
        ((mp3(8) & 0x7f) << 7) | (mp3(9) & 0x7f)
      id3 = 10 + size
      require(id3 <= mp3.length, "truncated ID3v2 tag")
      pos = id3
    }
    var sampleRate = -1
    var nFrames = 0
    var sumBytes = 0L
    var sumKbps = 0L
    var id3v1 = false
    var firstFrame = true
    while (pos < mp3.length && !id3v1) {
      // a trailing ID3v1 tag is exactly 128 bytes starting "TAG" —
      // skip it like the leading ID3v2 instead of calling it lost sync
      if (mp3.length - pos == 128 && mp3(pos) == 'T' &&
          mp3(pos + 1) == 'A' && mp3(pos + 2) == 'G') {
        id3v1 = true
      } else {
      require(pos + 4 <= mp3.length, s"truncated frame header at $pos")
      require((mp3(pos) & 0xff) == 0xff && (mp3(pos + 1) & 0xe0) == 0xe0,
        f"lost frame sync at $pos (0x${mp3(pos) & 0xff}%02x)")
      val versionBits = (mp3(pos + 1) >> 3) & 3
      val layerBits = (mp3(pos + 1) >> 1) & 3
      require(versionBits == 3, "only MPEG-1 is in the supported profile")
      require(layerBits == 1, "only Layer III is in the supported profile")
      val b2 = mp3(pos + 2) & 0xff
      val brIdx = b2 >> 4
      val srIdx = (b2 >> 2) & 3
      val padding = (b2 >> 1) & 1
      require(brIdx >= 1 && brIdx <= 14,
        if (brIdx == 0) "free-format bitrate is outside the supported profile"
        else "reserved bitrate index 15")
      require(srIdx <= 2, "reserved sample-rate index 3")
      val sr = srTable(srIdx)
      if (sampleRate < 0) sampleRate = sr
      else require(sr == sampleRate,
        "mid-stream sample-rate switches are outside the supported profile")
      val kbps = kbpsTable(brIdx)
      val len = frameLen(kbps, sr, padding)
      require(pos + len <= mp3.length, s"truncated frame payload at $pos")
      // Xing/Info (LAME) or VBRI VBR header: metadata riding in the
      // FIRST spec-valid frame — skip it like the tags (its header
      // already pinned the sample rate, which VBR encoders keep
      // stream-constant; scope comment above)
      val isVbrHeader = firstFrame && {
        val mono = ((mp3(pos + 3) >> 6) & 3) == 3
        val xingOff = pos + 4 + (if (mono) 17 else 32)
        val vbriOff = pos + 4 + 32
        def tagAt(at: Int, t: String): Boolean =
          at + t.length <= mp3.length && at - pos + t.length <= len &&
            t.indices.forall(i => mp3(at + i) == t.charAt(i).toByte)
        tagAt(xingOff, "Xing") || tagAt(xingOff, "Info") ||
          tagAt(vbriOff, "VBRI")
      }
      firstFrame = false
      if (!isVbrHeader) {
        nFrames += 1
        sumBytes += len
        sumKbps += kbps
      }
      pos += len
      }
    }
    require(nFrames > 0, "MP3 stream contains no frames")
    val durationUs =
      nFrames.toLong * samplesPerFrame * 1000000L / sampleRate
    Mp3Meta(sampleRate, nFrames, sumBytes, sumKbps, durationUs, id3)
  }

  /** Build a VALID Layer III byte stream (headers + zero payload —
    * the walk never reads payload bytes, so zeros are an honest
    * fixture; a real decoder would see silence-like garbage, but
    * m20's operator is the HEADER walk, exactly as m19's is the
    * timing walk).
    */
  def encodeMp3Own(srIdx: Int, frames: Seq[(Int, Int)],
                   id3Payload: Int): Array[Byte] = {
    require(srIdx >= 0 && srIdx <= 2, s"bad sample-rate index $srIdx")
    // id3Payload = -1 omits the tag entirely (bare frame stream)
    require(id3Payload >= -1 && id3Payload < (1 << 28), "bad ID3 size")
    val out = new java.io.ByteArrayOutputStream()
    if (id3Payload >= 0) {
      out.write('I'); out.write('D'); out.write('3')
      out.write(4); out.write(0) // v2.4.0
      out.write(0) // flags
      out.write((id3Payload >> 21) & 0x7f); out.write((id3Payload >> 14) & 0x7f)
      out.write((id3Payload >> 7) & 0x7f); out.write(id3Payload & 0x7f)
      out.write(new Array[Byte](id3Payload))
    }
    frames.foreach { case (brIdx, padding) =>
      require(brIdx >= 1 && brIdx <= 14, s"bad bitrate index $brIdx")
      require(padding == 0 || padding == 1, s"bad padding $padding")
      out.write(0xff); out.write(0xfb) // sync + MPEG-1 + Layer III + no CRC
      out.write((brIdx << 4) | (srIdx << 2) | (padding << 1))
      out.write(0) // stereo, no emphasis
      val len = frameLen(kbpsTable(brIdx), srTable(srIdx), padding)
      out.write(new Array[Byte](len - 4))
    }
    out.toByteArray
  }

  /** Deterministic fixture: 6 frames; frame f's bitrate index is
    * `point(f) % 14 + 1` and its padding bit `(point(f) / 16) % 2`
    * (VBR by construction); the per-FILE sample rate is
    * `point(0) % 3` and the ID3v2 payload `|codepoints| % 64` bytes —
    * all closed forms the oracle recomputes from the text.
    */
  def textToMp3Own(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val txtIdx = df.schema.fieldIndex(textCol)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("mp3", BinaryType)))
    implicit val enc: Encoder[Row] = Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { row =>
        val cps =
          if (row.isNullAt(txtIdx)) Array.empty[Int]
          else row.getString(txtIdx).codePoints().toArray
        def point(f: Int) = MultimodalOps.textPoint(cps, f, 6)
        val frames = (0 until 6).map(f =>
          (point(f) % 14 + 1, (point(f) / 16) % 2))
        Row(row.getLong(idIdx),
          encodeMp3Own(point(0) % 3, frames, cps.length % 64))
      }
    }.toDF("id", "mp3")
  }

  /** THE census operator: one row per stream with the header-walk
    * metadata — `(id, sample_rate, n_frames, sum_bytes, sum_kbps,
    * duration_us, id3_bytes)`.
    */
  def mp3Stats(df: DataFrame, idCol: String, mp3Col: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val mIdx = df.schema.fieldIndex(mp3Col)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("sample_rate", IntegerType),
      StructField("n_frames", IntegerType), StructField("sum_bytes", LongType),
      StructField("sum_kbps", LongType), StructField("duration_us", LongType),
      StructField("id3_bytes", IntegerType)))
    implicit val enc: Encoder[Row] = Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { row =>
        val m = mp3Meta(row.getAs[Array[Byte]](mIdx))
        Row(row.getLong(idIdx), m.sampleRate, m.nFrames, m.sumBytes,
          m.sumKbps, m.durationUs, m.id3Bytes)
      }
    }.toDF("id", "sample_rate", "n_frames", "sum_bytes", "sum_kbps",
      "duration_us", "id3_bytes")
  }
}
