package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.sources.FileSources

/** File-format connectors (q138/q139): round-trip losslessness on the
  * hard cases (embedded newlines, quotes, separators, backslashes,
  * combining marks, NULL vs empty), corrupt-record accounting, and the
  * multi-part read path.
  */
class SourcesSpec extends SparkTestBase
    with org.scalatest.BeforeAndAfterAll {

  /** Suite-owned temp root, reclaimed in afterAll — the gzip/
    * splittability/streaming tests must not leak corpus copies into
    * the system temp dir across runs (the exact leak FileSources'
    * staging root exists to prevent; round-15 advice).
    */
  private val tempRoot =
    java.nio.file.Files.createTempDirectory("graft-sources-spec-")

  private def tempDir(prefix: String): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory(tempRoot, prefix)

  override def afterAll(): Unit = {
    try java.nio.file.Files.walk(tempRoot)
      .sorted(java.util.Comparator.reverseOrder())
      .forEach(p => java.nio.file.Files.deleteIfExists(p))
    catch { case _: java.io.IOException => () }
    super.afterAll()
  }

  private def hardRows = {
    import spark.implicits._
    Seq(
      (1L, Option("line1\nline2"), "en"),
      (2L, Option("he said \"hi\", twice"), "en"),
      (3L, Option("back\\slash é and a comma,"), "fr"),
      (4L, Option("tab\there"), "de"),
      (5L, Option(""), "en"),
      (6L, Option.empty[String], "xx"),
      (7L, Option(" leading and trailing "), "en"))
      .toDF("id", "text", "lang")
  }

  test("JSON round trip is lossless incl. NULL vs empty string") {
    // corrupt-only aggregations over a raw JSON scan are disallowed
    // (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — cache first, per Spark's
    // own guidance; q138's census is exempt because it references
    // the data columns in the same aggregation
    val back = FileSources.jsonRoundTrip(hardRows).cache()
    assert(back.where(col("_corrupt_record").isNotNull).count() === 0L)
    val got = back.select("id", "text", "lang").collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.toString), r.getString(2)))
      .toSet
    val want = hardRows.collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.toString), r.getString(2)))
      .toSet
    assert(got === want) // newline/quote/backslash/combining-mark/NULL/'' all survive
  }

  test("JSON corrupt lines are counted, not fatal, and leak no fields") {
    val back = FileSources.jsonRoundTrip(hardRows,
      rawExtraLines = Seq("""{BROKEN "id": 999}""", "not json at all"))
      .cache()
    val bad = back.where(col("_corrupt_record").isNotNull)
    assert(bad.count() === 2L)
    // a syntax error at the first token must not retain parsed fields
    assert(bad.where(col("id").isNotNull).count() === 0L)
    assert(back.where(col("_corrupt_record").isNull).count() === 7L)
  }

  test("JSON read spans multiple part files") {
    val back = FileSources.jsonRoundTrip(hardRows, parts = 3)
    // reference a DATA column (id), not the corrupt column: corrupt-
    // only scans are disallowed, and input_file_name() over a cached
    // relation would return empty strings
    val nFiles = back.where(col("id").isNotNull)
      .select(input_file_name()).distinct().count()
    assert(nFiles >= 2L) // 7 rows over 3 parts: at least 2 non-empty files
  }

  test("CSV RFC 4180 round trip is lossless on non-null text") {
    val rows = hardRows.where(col("text").isNotNull) // CSV can't carry NULL-vs-'' portably
    val back = FileSources.csvRoundTrip(rows)
    val got = back.select("id", "text", "lang").collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.toString), r.getString(2)))
      .toSet
    val want = rows.collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.toString), r.getString(2)))
      .toSet
    // the empty string may come back NULL (the documented CSV
    // ambiguity q139's census is insensitive to) — compare modulo it
    def conflate(t: (Long, Option[String], String)) =
      (t._1, t._2.getOrElse(""), t._3)
    assert(got.map(conflate) === want.map(conflate))
    // the HARD cases (newline, quote, comma, backslash, combining
    // mark) must survive byte-for-byte, not just modulo conflation
    val gotById = got.map(t => t._1 -> t._2).toMap
    val wantById = want.map(t => t._1 -> t._2).toMap
    for (id <- Seq(1L, 2L, 3L, 4L, 7L)) assert(gotById(id) === wantById(id), s"id=$id")
  }

  test("CSV numeric columns round trip exactly") {
    import spark.implicits._
    val df = Seq((1L, 42L, "a,b"), (2L, -7L, "c\"d"), (3L, 0L, "e\nf"))
      .toDF("id", "n", "s")
    val back = FileSources.csvRoundTrip(df)
    assert(back.orderBy("id").collect().toSeq ===
      df.orderBy("id").collect().toSeq)
  }

  test("ORC round trip is lossless incl. NULL vs empty string (typed format)") {
    val back = FileSources.orcRoundTrip(hardRows)
    val got = back.select("id", "text", "lang").collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.toString), r.getString(2)))
      .toSet
    val want = hardRows.collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.toString), r.getString(2)))
      .toSet
    assert(got === want) // incl. row 5 ('') vs row 6 (NULL) — ORC keeps them distinct
  }

  test("partitioned lake: lossless round trip and REAL partition pruning") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val lake = FileSources.partitionedRoundTrip(hardRows, "lang")
    // content survives (partition col round-trips via directory names)
    assert(lake.count() === 7L)
    assert(lake.where(col("lang") === "en").count() === 4L)
    // the filter must land in PartitionFilters (directory pruning),
    // NOT as a post-scan data filter
    val plan = lake.where(col("lang") === "en").queryExecution.executedPlan
    val scans = plan.collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty)
    assert(scans.forall(_.partitionFilters.nonEmpty),
      "lang = 'en' should prune partitions at planning time")
    // and the pruned scan reads only the en directory's files
    val files = lake.where(col("lang") === "en")
      .select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains("lang=en")))
  }

  test("gzip-compressed JSON lines read transparently by extension") {
    // compressed drops are the common reality; gzip decodes inline but
    // is NON-SPLITTABLE (one task per file at any size) — the scale
    // trade is documented in SCALE.md: many small .gz files, or
    // recompress to a splittable layout at the edge
    val dir = tempDir("graft-gz-src-")
    hardRows.repartition(2).write.mode("overwrite")
      .option("compression", "gzip").json(dir.toString)
    val gzFiles = dir.toFile.listFiles().filter(_.getName.endsWith(".json.gz"))
    assert(gzFiles.nonEmpty, "writer should emit .json.gz part files")
    val back = spark.read.schema(hardRows.schema).json(dir.toString)
    assert(back.count() === 7L)
    val got = back.select("id", "text").collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.toString))).toSet
    val want = hardRows.select("id", "text").collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.toString))).toSet
    assert(got === want)
  }

  test("XML round trip carries the hard characters (entity escaping)") {
    val rows = hardRows.where(col("text").isNotNull && col("text") =!= "")
    val back = FileSources.xmlRoundTrip(rows)
    val got = back.select("id", "text", "lang").collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.toString), r.getString(2)))
      .toSet
    val want = rows.collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.toString), r.getString(2)))
      .toSet
    assert(got === want) // newline/quote/comma/backslash/combining mark survive XML
  }

  test("XML escapes markup-significant characters losslessly") {
    import spark.implicits._
    val df = Seq((1L, "<tag> & \"quoted\" 'apos' ]]> done"),
      (2L, "a<b and b>a & so on")).toDF("id", "text")
    val back = FileSources.xmlRoundTrip(df)
    assert(back.orderBy("id").collect().map(_.getString(1)).toSeq ===
      df.orderBy("id").collect().map(_.getString(1)).toSeq)
  }

  test("schema-evolved lake: merged read nulls the old generation's missing column") {
    import spark.implicits._
    val oldGen = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val newGen = Seq((3L, "c", 30L), (4L, "d", 40L)).toDF("id", "s", "extra")
    val lake = FileSources.schemaEvolvedLake(oldGen, newGen)
    assert(lake.columns.toSet === Set("id", "s", "extra"))
    val rows = lake.orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L))
    assert(rows.take(2).forall(_.isNullAt(2)), "old gen -> NULL extra")
    assert(rows.drop(2).map(_.getLong(2)).toSeq === Seq(30L, 40L))
  }

  test("VARIANT codec: nested paths, array index, missing path -> null") {
    import spark.implicits._
    val df = Seq("""{"a": {"b": 7}, "s": "x", "arr": [1, 2, 3]}""").toDF("j")
      .select(parse_json(col("j")).as("v"))
    val row = df.select(
      variant_get(col("v"), "$.a.b", "long"),
      variant_get(col("v"), "$.s", "string"),
      variant_get(col("v"), "$.arr[1]", "int"),
      try_variant_get(col("v"), "$.nope", "string")).collect().head
    assert(row.getLong(0) === 7L)
    assert(row.getString(1) === "x")
    assert(row.getInt(2) === 2)
    assert(row.isNullAt(3))
  }

  test("q143 variant round-trip is the identity on the source columns") {
    val out = SparkEntry.queries("q143_variant_codec")(spark, sf)
    val orig = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("n_chars"), col("source"))
      .orderBy("doc_id").collect()
    val got = out.select("doc_id", "lang", "n_chars", "source").collect()
    assert(got.toSeq === orig.toSeq)
    assert(out.where(col("absent").isNotNull).count() === 0L)
  }

  test("scale: JSON lines splits by byte range; gzip is one task per file") {
    import spark.implicits._
    // ~1 MB single plain-text JSON file vs the same data gzipped:
    // the plain file must fan out under a small maxPartitionBytes
    // (byte-range splitting — the 100 TB drop contract), the gzip
    // file must collapse to ONE task regardless (non-splittable)
    val big = (0 until 20000).map(i => (i.toLong, "x" * 40)).toDF("id", "s")
    val plainDir = tempDir("graft-split-")
    val gzDir = tempDir("graft-split-gz-")
    big.coalesce(1).write.mode("overwrite").json(plainDir.toString)
    big.coalesce(1).write.mode("overwrite")
      .option("compression", "gzip").json(gzDir.toString)
    val conf = spark.conf
    val saved = conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    try {
      conf.set("spark.sql.files.maxPartitionBytes", "65536") // 64 KiB
      val plainParts = spark.read.schema(big.schema)
        .json(plainDir.toString).rdd.getNumPartitions
      val gzParts = spark.read.schema(big.schema)
        .json(gzDir.toString).rdd.getNumPartitions
      assert(plainParts > 4, s"plain JSON should split ($plainParts tasks)")
      assert(gzParts === 1, s"gzip must be one task per file ($gzParts)")
    } finally conf.set("spark.sql.files.maxPartitionBytes", saved)
  }

  test("streaming JSON file source: directory backlog drains incrementally") {
    // the streaming twin of q138: records LAND as files in a drop
    // directory and stream through with a declared schema — faust's
    // topic-consume shape over a file-system transport. One file per
    // trigger proves incremental (not monolithic) ingestion.
    val dir = tempDir("graft-stream-src-")
    hardRows.where(col("text").isNotNull).repartition(3)
      .write.mode("overwrite").json(dir.toString)
    val stream = spark.readStream
      .schema(hardRows.schema)
      .option("maxFilesPerTrigger", "1")
      .json(dir.toString)
      .groupBy().agg(count(lit(1)).as("n"), sum(length(col("text"))).as("cp"))
    val q = stream.writeStream
      .format("memory").queryName("src_stream")
      .outputMode("complete")
      .start()
    try {
      q.processAllAvailable()
      val row = spark.table("src_stream").collect().head
      assert(row.getLong(0) === 6L)
      val want = hardRows.where(col("text").isNotNull)
        .agg(sum(length(col("text")))).collect().head.getLong(0)
      assert(row.getLong(1) === want)
      // one file per micro-batch: at least as many batches as files
      assert(q.recentProgress.count(_.numInputRows > 0) >= 2)
    } finally q.stop()
  }

  test("q138/q139 census queries run and agree on shared invariants") {
    val j = SparkEntry.queries("q138_json_source")(spark, sf).collect().head
    val c = SparkEntry.queries("q139_csv_source")(spark, sf).collect().head
    // JSON carries 2 extra crafted rows (empty + NULL text) vs CSV
    assert(j.getAs[Long]("n_rows") === c.getAs[Long]("n_rows") + 2L)
    assert(j.getAs[Long]("n_corrupt") === 1L)
    assert(j.getAs[Long]("max_id") === c.getAs[Long]("max_id"))
    // sum_cp: identical corpora; JSON skips NULL, CSV coalesces — the
    // two extra JSON rows ('' and NULL) both contribute 0 codepoints
    assert(j.getAs[Long]("sum_cp") === c.getAs[Long]("sum_cp"))
  }

  test("q140/q141 census queries agree with the JSON census where comparable") {
    val j = SparkEntry.queries("q138_json_source")(spark, sf).collect().head
    val o = SparkEntry.queries("q140_orc_source")(spark, sf).collect().head
    // ORC carries the same rows as JSON minus nothing (both withNulls)
    assert(o.getAs[Long]("n_rows") === j.getAs[Long]("n_rows"))
    assert(o.getAs[Long]("sum_cp") === j.getAs[Long]("sum_cp"))
    assert(o.getAs[Long]("h_sum") === j.getAs[Long]("h_sum"))
    assert(o.getAs[Long]("n_null_text") === j.getAs[Long]("n_null_text"))
    val p = SparkEntry.queries("q141_partitioned_source")(spark, sf).collect()
    // per-lang rows sum back to the CSV census total (same crafted set)
    val c = SparkEntry.queries("q139_csv_source")(spark, sf).collect().head
    assert(p.map(_.getAs[Long]("n_rows")).sum === c.getAs[Long]("n_rows"))
    assert(p.map(_.getAs[Long]("sum_cp")).sum === c.getAs[Long]("sum_cp"))
  }

  test("binaryFile round trip: byte-exact payloads, glob pruning, hostile names") {
    import graft.sources.FileSources
    import spark.implicits._
    val blobs = Seq(
      ("a.bin", Array[Byte](0, -1, 127, -128, 0)), // NULs + full range
      ("b.bin", Array.emptyByteArray),             // empty file
      ("c.bin", (0 until 700).map(i => (i * 13 % 256).toByte).toArray))
      .toDF("name", "bytes")
    val back = FileSources.binaryRoundTrip(blobs, col("name"), col("bytes"),
      glob = "*.bin")
    val got = back.select(
        regexp_extract(col("path"), "([^/]+)$", 1), col("content"))
      .as[(String, Array[Byte])].collect().map(r => r._1 -> r._2).toMap
    // DOCUMENTED source caveat: Spark's file sources produce no split
    // for a zero-byte file, so the empty payload is written but never
    // listed — media pipelines must treat 0-byte drops as absent
    // (every real container here — tar/WAV/JPEG — is ≥ header bytes,
    // so q148/q149 cannot hit this)
    assert(got.keySet == Set("a.bin", "c.bin"))
    blobs.as[(String, Array[Byte])].collect()
      .filter(_._2.nonEmpty).foreach { case (n, b) =>
        assert(java.util.Arrays.equals(got(n), b), s"$n must round-trip verbatim")
      }
    // binaryFile reports length from the filesystem, matching content
    assert(back.select(col("length"),
      org.apache.spark.sql.functions.length(col("content")).cast("long"))
      .collect().forall(r => r.getLong(0) == r.getLong(1)))
    // glob prunes AT LISTING: a foreign file in the same directory is
    // invisible to a *.bin read
    val mixed = Seq(("keep.bin", Array[Byte](1)), ("skip.dat", Array[Byte](2)))
      .toDF("name", "bytes")
    val pruned = FileSources.binaryRoundTrip(mixed, col("name"), col("bytes"),
      glob = "*.bin")
    assert(pruned.count() == 1L)
    // traversal and nested names are refused by name, not written
    val hostile = Seq(("../escape.bin", Array[Byte](1))).toDF("name", "bytes")
    val e = intercept[org.apache.spark.SparkException] {
      FileSources.binaryRoundTrip(hostile, col("name"), col("bytes"), "*.bin")
        .count()
    }
    assert(e.getMessage.contains("traversal-free") ||
      Option(e.getCause).exists(_.getMessage.contains("traversal-free")))
  }

  test("q148/q149 file-shape queries agree with their in-memory twins") {
    // the file trip must be invisible: q148 ≡ m21's census, q149 ≡
    // m15's stats, row for row
    val viaFiles = SparkEntry.queries("q148_wds_shard_files")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val inMem = SparkEntry.queries("m21_wds_shards")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(viaFiles == inMem)
    val statsViaFiles = SparkEntry.queries("q149_binary_source")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val statsInMem = SparkEntry.queries("m15_wav_stats")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(statsViaFiles == statsInMem)
  }
}
