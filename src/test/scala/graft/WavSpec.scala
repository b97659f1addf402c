package graft

import org.apache.spark.sql.functions._

import graft.ops.WavOps

/** RIFF/WAVE PCM16 conformance — the audio member of the multimodal
  * codec family: our encoder's bytes must decode identically in the
  * JDK's own javax.sound reader (an independent RIFF implementation),
  * foreign chunk layouts must parse, and out-of-profile streams must
  * be rejected by name.
  */
class WavSpec extends SparkTestBase {

  import spark.implicits._

  private def jdkDecode(wav: Array[Byte]): (Int, Int, Array[Short]) = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val fmt = ais.getFormat
    assert(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian)
    val bytes = ais.readAllBytes()
    val out = new Array[Short](bytes.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort
      i += 1
    }
    (fmt.getSampleRate.toInt, fmt.getChannels, out)
  }

  test("own-encoded WAVs round-trip exactly and decode identically in the JDK") {
    val cases = Seq(
      (8000, 1, Array.tabulate(32)(i => ((i * 2047 - 30000) % 32768).toShort)),
      (44100, 2, Array.tabulate(64)(i => ((i * i * 31 - 16384) % 32768).toShort)),
      (16000, 2, Array[Short](0, -1, Short.MaxValue, Short.MinValue, 1, -32768.toShort, 32767, 100)),
      (22050, 1, Array[Short]()))
    cases.foreach { case (rate, ch, samples) =>
      val wav = WavOps.encodePcm16Wav(rate, ch, samples)
      val meta = WavOps.readMeta(wav)
      assert((meta.sampleRate, meta.channels, meta.bitsPerSample,
        meta.nFrames) == ((rate, ch, 16, samples.length / ch)))
      val (_, decoded) = WavOps.decodePcm16(wav)
      assert(decoded.toSeq == samples.toSeq, "self round-trip")
      if (samples.nonEmpty) {
        val (jRate, jCh, jSamples) = jdkDecode(wav)
        assert((jRate, jCh) == ((rate, ch)))
        assert(jSamples.toSeq == samples.toSeq,
          "JDK decode differs from our samples")
      }
    }
  }

  test("foreign chunk layouts parse: JDK-written WAVs and padded LIST chunks") {
    // the JDK's own writer produces an independent header layout
    val samples = Array.tabulate(48)(i => ((i * 997 - 20000) % 32768).toShort)
    val fmt = new javax.sound.sampled.AudioFormat(12000f, 16, 2, true, false)
    val bytes = new Array[Byte](96)
    var i = 0
    while (i < 48) {
      bytes(2 * i) = (samples(i) & 0xff).toByte
      bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), fmt, 24),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val (meta, decoded) = WavOps.decodePcm16(bos.toByteArray)
    assert((meta.sampleRate, meta.channels, meta.nFrames) == ((12000, 2, 24)))
    assert(decoded.toSeq == samples.toSeq, "JDK-written WAV decode")

    // hand-build a stream with an ODD-length LIST chunk before fmt —
    // the word-alignment pad rule must be honored
    val base = WavOps.encodePcm16Wav(8000, 1, Array[Short](5, -5, 7))
    val list = Array[Byte]('L', 'I', 'S', 'T', 3, 0, 0, 0, 'a', 'b', 'c', 0)
    val padded = new java.io.ByteArrayOutputStream()
    padded.write(base, 0, 12) // RIFF header
    padded.write(list)
    padded.write(base, 12, base.length - 12)
    val out = padded.toByteArray
    // fix the RIFF size field (not strictly checked, but be honest)
    val riffLen = out.length - 8
    out(4) = (riffLen & 0xff).toByte; out(5) = ((riffLen >> 8) & 0xff).toByte
    val (m2, d2) = WavOps.decodePcm16(out)
    assert(m2.nFrames == 3 && d2.toSeq == Seq[Short](5, -5, 7))
  }

  test("out-of-profile streams are rejected by name") {
    val e1 = intercept[IllegalArgumentException](
      WavOps.readMeta("not audio at all, definitely".getBytes))
    assert(e1.getMessage.contains("RIFF"), e1.getMessage)
    // IEEE float WAV (format 3): named rejection
    val pcm = WavOps.encodePcm16Wav(8000, 1, Array[Short](1, 2))
    val floatWav = pcm.clone(); floatWav(20) = 3
    val e2 = intercept[IllegalArgumentException](WavOps.readMeta(floatWav))
    assert(e2.getMessage.contains("PCM only"), e2.getMessage)
    // 8-bit: named rejection
    val wav8 = pcm.clone(); wav8(34) = 8
    val e3 = intercept[IllegalArgumentException](WavOps.readMeta(wav8))
    assert(e3.getMessage.contains("bit depth"), e3.getMessage)
    // ragged data chunk (not whole frames)
    val ragged = WavOps.encodePcm16Wav(8000, 2, Array[Short](1, 2, 3, 4))
    ragged(40) = 6 // 6 bytes = 1.5 stereo frames
    val e4 = intercept[IllegalArgumentException](WavOps.readMeta(ragged))
    assert(e4.getMessage.contains("whole frames"), e4.getMessage)
    // hostile u32 chunk length (0xFFFFFFF8 would wrap the Int advance
    // into a no-op → infinite loop before the fix): named error
    val hostile = WavOps.encodePcm16Wav(8000, 1, Array[Short](1, 2))
    hostile(16) = 0xf8.toByte; hostile(17) = 0xff.toByte
    hostile(18) = 0xff.toByte; hostile(19) = 0xff.toByte // fmt len
    val e5 = intercept[IllegalArgumentException](WavOps.readMeta(hostile))
    assert(e5.getMessage.contains("past end of stream"), e5.getMessage)
    // declared data length near 4 GiB (would wrap nFrames negative):
    // same named error, not NegativeArraySizeException
    val huge = WavOps.encodePcm16Wav(8000, 1, Array[Short](1, 2))
    huge(40) = 0xfe.toByte; huge(41) = 0xff.toByte
    huge(42) = 0xff.toByte; huge(43) = 0xff.toByte // data len
    val e6 = intercept[IllegalArgumentException](WavOps.readMeta(huge))
    assert(e6.getMessage.contains("past end of stream"), e6.getMessage)
  }

  test("m15 plumbing: wavStats features match a scalar replay") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).limit(40)
    val wavs = WavOps.textToWavOwn(docs, "doc_id", "text")
    val stats = WavOps.wavStats(wavs, "id", "wav").collect()
    assert(stats.length == 40)
    val texts = docs.as[(Long, String)].collect().toMap
    stats.foreach { r =>
      val id = r.getLong(0)
      assert((r.getInt(1), r.getInt(2), r.getInt(3)) == ((8000, 2, 32)))
      val cps = Option(texts(id)).getOrElse("").codePoints().toArray
      val n = cps.length.toLong
      val s = Array.tabulate(64) { i =>
        val v = if (n > 0) cps(((i * n) / 64).toInt) % 256 else 0
        (v - 128) * 256
      }
      assert(r.getInt(4) == s.map(math.abs).max, s"doc $id peak")
      assert(r.getLong(5) == s.map(v => v.toLong * v).sum, s"doc $id sumsq")
      val ch0 = (0 until 32).map(f => s(2 * f))
      val zc = (1 until 32).count(f => (ch0(f) < 0) != (ch0(f - 1) < 0))
      assert(r.getInt(6) == zc, s"doc $id zero crossings")
    }
  }

  test("wavFrameEnergy: hand-computed windows, sign flips land in the right window") {
    // mono, 10 frames, frameLen 4 → windows of 4/4/2 (ragged tail);
    // samples chosen so window 0 has 3 sign flips, window 1 has 2
    // (its first frame's flip vs frame 3 must NOT count — crossings
    // never span a window boundary), window 2 has 0
    val samples = Array[Short](100, -200, 300, -400, 500, 600, -700, 800,
      -900, -1000)
    val wav = WavOps.encodePcm16Wav(16000, 1, samples)
    val df = Seq((7L, wav)).toDF("id", "wav")
    val got = WavOps.wavFrameEnergy(df, "id", "wav", frameLen = 4)
      .orderBy("win").collect()
    assert(got.length == 3)
    def w(i: Int) = (got(i).getInt(1), got(i).getInt(2), got(i).getInt(3),
      got(i).getLong(4), got(i).getInt(5))
    assert(w(0) == ((0, 4, 400,
      100L * 100 + 200L * 200 + 300L * 300 + 400L * 400, 3)))
    assert(w(1) == ((1, 4, 800,
      500L * 500 + 600L * 600 + 700L * 700 + 800L * 800, 2)))
    assert(w(2) == ((2, 2, 1000, 900L * 900 + 1000L * 1000, 0)))
  }

  test("wavFrameEnergy windows partition wavStats exactly (stereo corpus)") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .limit(40)
    val wavs = WavOps.textToWavOwn(docs, "doc_id", "text").cache()
    val whole = WavOps.wavStats(wavs, "id", "wav")
      .select("id", "peak", "sumsq").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    val parts = WavOps.wavFrameEnergy(wavs, "id", "wav", frameLen = 8)
      .groupBy("id")
      .agg(max("peak").as("peak"), sum("sumsq").as("sumsq"),
        sum("win_frames").as("nf"), count(lit(1)).as("nw"),
        sum("zero_crossings").as("zc"))
      .collect()
    wavs.unpersist()
    assert(parts.length == whole.size)
    parts.foreach { r =>
      val (peak, sumsq) = whole(r.getLong(0))
      assert(r.getAs[Int]("peak") == peak)
      assert(r.getAs[Long]("sumsq") == sumsq)
      assert(r.getAs[Long]("nf") == 32L && r.getAs[Long]("nw") == 4L)
    }
  }

  test("wavFrameEnergy rejects frameLen < 1") {
    val df = Seq((1L, WavOps.encodePcm16Wav(8000, 1, Array[Short](1, 2))))
      .toDF("id", "wav")
    intercept[IllegalArgumentException] {
      WavOps.wavFrameEnergy(df, "id", "wav", frameLen = 0)
    }
  }
}
