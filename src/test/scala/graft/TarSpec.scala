package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.TarOps

/** USTAR/WebDataset shard codec (m21): header arithmetic, checksum
  * validation, wds sample grouping, shard-cut determinism — and an
  * INDEPENDENT cross-check against the system `tar` binary (the GIF
  * family's ImageIO posture applied to archives: our bytes must list
  * and extract in a decoder we didn't write).
  */
class TarSpec extends SparkTestBase {

  import spark.implicits._

  private def b(s: String) = s.getBytes(StandardCharsets.UTF_8)

  test("encode → walk round trip: names, sizes, offsets, payload slices") {
    val members = Seq(
      "0001.txt" -> b("hello world"),
      "0001.cls" -> b("en"),
      "0002.txt" -> b(""), // empty member: header only, zero payload blocks
      "0002.cls" -> b("fr"))
    val tar = TarOps.encodeTar(members)
    assert(tar.length % 512 == 0)
    // 4 headers + 1 + 1 + 0 + 1 payload blocks + 2 zero blocks
    assert(tar.length == (4 + 3 + 2) * 512)
    val es = TarOps.tarEntries(tar)
    assert(es.map(_.name) == members.map(_._1))
    es.zip(members).foreach { case (e, (_, data)) =>
      assert(e.size == data.length)
      assert(java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(tar, e.offset, e.offset + e.size), data))
    }
  }

  test("system tar lists and extracts our archives (independent decoder)") {
    assume(new java.io.File("/usr/bin/tar").exists ||
      new java.io.File("/bin/tar").exists)
    val members = Seq("7.txt" -> b("some text\nwith lines"), "7.cls" -> b("de"))
    val dir = Files.createTempDirectory("graft-tar-spec-")
    try {
      val f = dir.resolve("shard.tar")
      Files.write(f, TarOps.encodeTar(members))
      val list = new ProcessBuilder("tar", "-tf", f.toString)
        .redirectErrorStream(true).start()
      val names = new String(list.getInputStream.readAllBytes(),
        StandardCharsets.UTF_8).trim.split("\n").toSeq
      assert(list.waitFor() == 0, s"tar -tf failed: $names")
      assert(names == Seq("7.txt", "7.cls"))
      val ex = new ProcessBuilder("tar", "-xf", f.toString,
        "-C", dir.toString).start()
      assert(ex.waitFor() == 0)
      assert(Files.readAllBytes(dir.resolve("7.txt")).toSeq == b("some text\nwith lines").toSeq)
      assert(Files.readAllBytes(dir.resolve("7.cls")).toSeq == b("de").toSeq)
    } finally {
      Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p))
    }
  }

  test("hostile archives: checksum, truncation, typeflag, octal — named errors") {
    val tar = TarOps.encodeTar(Seq("a.txt" -> b("payload")))
    // flipped header byte → checksum mismatch by name
    val flipped = tar.clone(); flipped(0) = 'z'.toByte
    assert(intercept[IllegalArgumentException](TarOps.tarEntries(flipped))
      .getMessage.contains("checksum"))
    // truncated payload (cut the archive mid-member)
    val cut = tar.take(512)
    assert(intercept[IllegalArgumentException](TarOps.tarEntries(cut))
      .getMessage.contains("truncated"))
    // non-block-multiple length
    assert(intercept[IllegalArgumentException](TarOps.tarEntries(tar.take(700)))
      .getMessage.contains("multiple of 512"))
    // directory typeflag is outside the profile, by name — rebuild the
    // checksum so the typeflag check (not the checksum) fires
    val dirEntry = tar.clone()
    dirEntry(156) = '5'
    var sum = 0L
    (0 until 512).foreach(i =>
      sum += (if (i >= 148 && i < 156) ' '.toInt else dirEntry(i) & 0xff))
    val cs = java.lang.Long.toOctalString(sum)
    val padded = ("0" * (6 - cs.length)) + cs
    System.arraycopy(padded.getBytes(StandardCharsets.US_ASCII), 0, dirEntry, 148, 6)
    dirEntry(154) = 0; dirEntry(155) = ' '.toByte
    assert(intercept[IllegalArgumentException](TarOps.tarEntries(dirEntry))
      .getMessage.contains("typeflag"))
    // non-octal size field (corrupt size, fix checksum): parseOctal by name
    val badSize = tar.clone()
    badSize(124) = '9'.toByte
    var sum2 = 0L
    (0 until 512).foreach(i =>
      sum2 += (if (i >= 148 && i < 156) ' '.toInt else badSize(i) & 0xff))
    val cs2 = java.lang.Long.toOctalString(sum2)
    val padded2 = ("0" * (6 - cs2.length)) + cs2
    System.arraycopy(padded2.getBytes(StandardCharsets.US_ASCII), 0, badSize, 148, 6)
    badSize(154) = 0; badSize(155) = ' '.toByte
    assert(intercept[IllegalArgumentException](TarOps.tarEntries(badSize))
      .getMessage.contains("non-octal"))
  }

  test("wds sample key: first-dot split, path-stripped") {
    assert(TarOps.sampleKey("0001.txt") == ("0001", "txt"))
    assert(TarOps.sampleKey("0001.seg.png") == ("0001", "seg.png"))
    assert(TarOps.sampleKey("shard/00/0002.cls") == ("0002", "cls"))
    assert(TarOps.sampleKey("noext") == ("noext", ""))
  }

  test("m21 plumbing: shard cut is the ≤1-sample-overflow rule; census closed forms") {
    val docs = Seq(
      ("web", 1L, Option("x" * 3000), "en"),
      ("web", 2L, Option("y" * 3000), "en"),
      ("web", 3L, Option("z" * 100), "fr"),
      ("books", 10L, Option.empty[String], "de"),
      ("books", 11L, Option("w" * 10), "de"))
      .toDF("source", "doc_id", "text", "lang")
    val shards = TarOps.textToWdsShards(docs, byteBudget = 4096L)
      .as[(String, Long, Array[Byte])].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // web: doc1 cum=0 → shard 0; doc2 cum=3002 → shard 0 (overflow by
    // one sample); doc3 cum=6004 → shard 1. books: both shard 0.
    assert(shards.keySet == Set(("web", 0L), ("web", 1L), ("books", 0L)))
    val web0 = TarOps.tarEntries(shards(("web", 0L)))
    assert(web0.map(_.name) == Seq("1.txt", "1.cls", "2.txt", "2.cls"))
    // NULL text lands as an empty member, not a missing one
    val books0 = TarOps.tarEntries(shards(("books", 0L)))
    assert(books0.map(e => e.name -> e.size) ==
      Seq("10.txt" -> 0, "10.cls" -> 2, "11.txt" -> 10, "11.cls" -> 2))
    val census = TarOps.wdsShardCensus(
      Seq(("web", 0L, shards(("web", 0L)))).toDF("source", "shard_id", "tar"))
      .as[(String, Long, Int, Int, Long, Long)].head()
    assert(census == (("web", 0L, 2, 4,
      6004L,
      // 4 headers + 6 txt payload blocks (3000→6 each... 3000/512→6) +
      // 2 cls blocks + 2 zero blocks
      (4 + 6 + 6 + 1 + 1 + 2) * 512L)))
    // m22: the per-sample grain over the same shard
    val samples = TarOps.wdsSamples(
      Seq(("web", 0L, shards(("web", 0L)))).toDF("source", "shard_id", "tar"))
      .as[(String, Long, String, Int, String, Long)].collect()
      .sortBy(_._3).toSeq
    assert(samples == Seq(
      ("web", 0L, "1", 2, "cls,txt", 3002L),
      ("web", 0L, "2", 2, "cls,txt", 3002L)))
    // m23: byte-lossless payload extraction (NULL text → empty member)
    val extracted = TarOps.wdsExtractText(
      Seq(("books", 0L, shards(("books", 0L)))).toDF("source", "shard_id", "tar"),
      "txt")
      .as[(String, String, String)].collect().sortBy(_._2).toSeq
    assert(extracted == Seq(
      ("books", "10", ""), ("books", "11", "w" * 10)))
  }

  test("m24 plumbing: binary payloads survive pack → extract verbatim") {
    // payloads with NUL bytes, full 0..255 range, and non-block sizes —
    // exactly what text members never exercise
    val blob1 = (0 until 700).map(i => (i * 7 % 256).toByte).toArray
    val blob2 = Array[Byte](0, -1, 0, 127, -128)
    val blob3 = Array.emptyByteArray
    val df = Seq(
      ("web", 1L, blob1), ("web", 2L, blob2), ("books", 5L, blob3))
      .toDF("source", "doc_id", "payload")
    val shards = TarOps.binaryToWdsShards(df, ext = "bin", byteBudget = 512L)
    // web: doc1 cum_before=0 → shard 0; doc2 cum_before=700 → shard 1
    val keys = shards.select("source", "shard_id")
      .as[(String, Long)].collect().toSet
    assert(keys == Set(("web", 0L), ("web", 1L), ("books", 0L)))
    val back = TarOps.wdsExtractBytes(shards, "bin")
      .as[(String, String, Array[Byte])].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(java.util.Arrays.equals(back(("web", "1")), blob1))
    assert(java.util.Arrays.equals(back(("web", "2")), blob2))
    assert(java.util.Arrays.equals(back(("books", "5")), blob3))
    // the extension filter is exact, not a suffix match
    assert(TarOps.wdsExtractBytes(shards, "in").count() == 0)
  }

  test("m24 end-to-end: own-WAV blobs decode identically after the shard trip") {
    val docs = Seq(("web", 21L, Option("alpha beta")),
        ("web", 22L, Option.empty[String]), ("books", 23L, Option("z")))
      .toDF("source", "doc_id", "text")
    val wavs = graft.ops.WavOps.textToWavOwn(docs, "doc_id", "text",
      carry = Seq("source"))
    val direct = graft.ops.WavOps.wavStats(wavs, "id", "wav")
      .as[(Long, Int, Int, Int, Int, Long, Int)].collect().toSet
    val payloads = wavs
      .select(col("source"), col("id").as("doc_id"), col("wav").as("payload"))
    val viaShards = graft.ops.WavOps.wavStats(
        TarOps.wdsExtractBytes(
            TarOps.binaryToWdsShards(payloads, "wav", 4096L), "wav")
          .select(col("sample_key").cast("long").as("id"),
            col("bytes").as("wav")), "id", "wav")
      .as[(Long, Int, Int, Int, Int, Long, Int)].collect().toSet
    assert(viaShards == direct && direct.size == 3)
  }
}
