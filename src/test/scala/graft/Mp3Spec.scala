package graft

import org.apache.spark.sql.functions._

import graft.ops.Mp3Ops

/** MP3 frame-header walk (m20): frame-length arithmetic against the
  * public tables, ID3v2 syncsafe skip, VBR accounting, and the
  * hostile-input rejections — all header-only (the operator contract:
  * audio bytes are never decoded).
  */
class Mp3Spec extends SparkTestBase {

  import spark.implicits._

  test("header walk: frame lengths, VBR sums, duration from the public formula") {
    // 128 kbps @ 44100, no padding → floor(144000·128/44100) = 417
    val m1 = Mp3Ops.mp3Meta(Mp3Ops.encodeMp3Own(0, Seq((9, 0)), -1))
    assert(m1.sampleRate == 44100 && m1.nFrames == 1 && m1.sumBytes == 417L)
    assert(m1.durationUs == 1152L * 1000000L / 44100L)
    assert(m1.id3Bytes == 0)
    // padding adds exactly one byte
    val m2 = Mp3Ops.mp3Meta(Mp3Ops.encodeMp3Own(0, Seq((9, 1)), -1))
    assert(m2.sumBytes == 418L)
    // VBR: 32 kbps + 320 kbps @ 48000 → 96 + 960 bytes, kbps sum 352
    val m3 = Mp3Ops.mp3Meta(Mp3Ops.encodeMp3Own(1, Seq((1, 0), (14, 0)), -1))
    assert(m3.sampleRate == 48000 && m3.nFrames == 2)
    assert(m3.sumBytes == (144000L * 32 / 48000) + (144000L * 320 / 48000))
    assert(m3.sumKbps == 352L)
    assert(m3.durationUs == 2L * 1152L * 1000000L / 48000L)
  }

  test("ID3v2 tag is skipped by syncsafe size, counted not parsed") {
    // payload 200 forces a two-byte syncsafe split (200 = 1·128 + 72)
    val m = Mp3Ops.mp3Meta(Mp3Ops.encodeMp3Own(2, Seq((5, 0)), 200))
    assert(m.id3Bytes == 210 && m.nFrames == 1 && m.sampleRate == 32000)
    // a tag whose declared size overruns the stream is a named error
    val bytes = Mp3Ops.encodeMp3Own(0, Seq((5, 0)), 16)
    val truncated = bytes.take(20) // cuts inside the tag payload
    val e = intercept[IllegalArgumentException](Mp3Ops.mp3Meta(truncated))
    assert(e.getMessage.contains("truncated"))
  }

  test("trailing ID3v1 'TAG' block is skipped like the leading ID3v2") {
    // real-world encoders append a fixed 128-byte ID3v1 tag; the walk
    // must not call it lost frame sync
    val base = Mp3Ops.encodeMp3Own(0, Seq((9, 0), (9, 0)), -1)
    val id3v1 = ("TAG" + "x" * 125).getBytes("US-ASCII")
    assert(id3v1.length == 128)
    val m = Mp3Ops.mp3Meta(base ++ id3v1)
    assert(m.nFrames == 2 && m.sumBytes == 834L)
    // but 128 trailing bytes NOT starting with TAG are still an error
    val junk = ("BAD" + "x" * 125).getBytes("US-ASCII")
    val e = intercept[IllegalArgumentException](Mp3Ops.mp3Meta(base ++ junk))
    assert(e.getMessage.contains("sync"))
  }

  test("Xing/Info/VBRI first-frame VBR header is metadata, not audio (r18)") {
    def patch(bytes: Array[Byte], at: Int, tag: String): Array[Byte] = {
      val b = bytes.clone()
      tag.indices.foreach(i => b(at + i) = tag.charAt(i).toByte)
      b
    }
    val base = Mp3Ops.encodeMp3Own(0, Seq((9, 0), (9, 0), (9, 0)), -1)
    // stereo frames (mode bits 0) → 32-byte side info → marker at 4+32
    for (tag <- Seq("Xing", "Info", "VBRI")) {
      val m = Mp3Ops.mp3Meta(patch(base, 36, tag))
      assert(m.nFrames == 2, tag)     // the tag frame is not audio...
      assert(m.sumBytes == 834L, tag) // ...nor are its bytes
      assert(m.durationUs == 2L * 1152L * 1000000L / 44100L, tag)
    }
    // the sniff applies to the FIRST frame only: a payload that
    // happens to contain "Xing" mid-stream is audio
    assert(Mp3Ops.mp3Meta(patch(base, 417 + 36, "Xing")).nFrames == 3)
    // composition with the tag skips: ID3v2 + Xing + one audio frame
    val tagged = Mp3Ops.encodeMp3Own(0, Seq((9, 0), (9, 0)), 50)
    val m2 = Mp3Ops.mp3Meta(patch(tagged, 60 + 36, "Xing"))
    assert(m2.id3Bytes == 60 && m2.nFrames == 1 && m2.sumBytes == 417L)
    // a stream whose ONLY frame is the VBR header (truncated download)
    // is zero audio — a NAMED rejection, not a 1-frame success
    val only = patch(Mp3Ops.encodeMp3Own(0, Seq((9, 0)), -1), 36, "Xing")
    val e = intercept[IllegalArgumentException](Mp3Ops.mp3Meta(only))
    assert(e.getMessage.contains("no frames"))
  }

  test("hostile inputs: named rejections, never silent misparses") {
    val ok = Mp3Ops.encodeMp3Own(0, Seq((9, 0), (9, 0)), -1)
    // truncated second frame payload
    val e1 = intercept[IllegalArgumentException](
      Mp3Ops.mp3Meta(ok.take(ok.length - 10)))
    assert(e1.getMessage.contains("truncated frame payload"))
    // lost sync mid-stream (corrupt first header's length source so
    // the walk lands off a frame boundary)
    val broken = ok.clone()
    broken(2) = ((broken(2) & 0x0f) | (4 << 4)).toByte // 9→4: shorter frame
    val e2 = intercept[IllegalArgumentException](Mp3Ops.mp3Meta(broken))
    assert(e2.getMessage.contains("lost frame sync"))
    // free-format and reserved indexes by name
    val free = ok.clone(); free(2) = (free(2) & 0x0f).toByte
    assert(intercept[IllegalArgumentException](Mp3Ops.mp3Meta(free))
      .getMessage.contains("free-format"))
    val resv = ok.clone(); resv(2) = ((resv(2) & 0x0f) | 0xf0).toByte
    assert(intercept[IllegalArgumentException](Mp3Ops.mp3Meta(resv))
      .getMessage.contains("reserved bitrate"))
    // MPEG-2 version bits are outside the profile, by name
    val v2 = ok.clone(); v2(1) = (v2(1) & 0xef).toByte
    assert(intercept[IllegalArgumentException](Mp3Ops.mp3Meta(v2))
      .getMessage.contains("MPEG-1"))
  }

  test("m20 plumbing: census matches the closed forms per doc") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).limit(30)
    val mp3s = Mp3Ops.textToMp3Own(docs, "doc_id", "text")
    val rows = Mp3Ops.mp3Stats(mp3s, "id", "mp3")
      .as[(Long, Int, Int, Long, Long, Long, Int)].collect()
    assert(rows.length == 30)
    val texts = docs.as[(Long, String)].collect().toMap
    val srT = Seq(44100, 48000, 32000)
    val kbpsT = Seq(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
    rows.foreach { case (id, sr, nf, sumBytes, sumKbps, durUs, id3) =>
      val cps = Option(texts(id)).getOrElse("").codePoints().toArray
      val n = cps.length.toLong
      def point(f: Int) = if (n > 0) cps(((f * n) / 6).toInt) % 256 else 0
      val hz = srT(point(0) % 3)
      assert(sr == hz && nf == 6)
      val expBytes = (0 until 6).map { f =>
        val kbps = kbpsT(point(f) % 14 + 1)
        144000L * kbps / hz + (point(f) / 16) % 2
      }.sum
      assert(sumBytes == expBytes, s"doc $id")
      assert(sumKbps == (0 until 6).map(f => kbpsT(point(f) % 14 + 1).toLong).sum)
      assert(durUs == 6L * 1152L * 1000000L / hz)
      assert(id3 == 10 + (cps.length % 64))
    }
  }
}
