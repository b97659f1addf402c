package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.sources.StreamingLake

/** Streaming file-source ingestion (q145 / StreamingLake): the
  * landing-directory twin of topic consumption. Proves
  *
  *  - streamed ≡ batch: draining a multi-wave landing drop through
  *    the AvailableNow ingest yields exactly the batch census;
  *  - admission control: maxFilesPerTrigger bounds every micro-batch;
  *  - exactly-once across RESTARTS: re-running the ingest with the
  *    same checkpoint after new files land processes ONLY the new
  *    files — no re-reads, no duplicate lake rows;
  *  - the tailing mode (ProcessingTime trigger) picks up files that
  *    arrive while the query is live;
  *  - the lake's `_spark_metadata` commit log exists and the batch
  *    view honors it.
  */
class StreamingIngestSpec extends SparkTestBase {

  private def docs(n: Int, from: Int = 0) = {
    import spark.implicits._
    (from until from + n)
      .map(i => (i.toLong, s"doc body $i with text", if (i % 2 == 0) "en" else "fr"))
      .toDF("doc_id", "text", "lang")
  }

  test("AvailableNow drain: streamed lake census equals batch census, multi-batch") {
    val (landing, lake, ckpt) = StreamingLake.stageDirs()
    val d = docs(40)
    StreamingLake.dropJsonWave(d.where(col("doc_id") < 20), landing, wave = 1, parts = 3)
    StreamingLake.dropJsonWave(d.where(col("doc_id") >= 20), landing, wave = 2, parts = 3)
    val q = StreamingLake.ingest(spark, landing.toString, lake.toString,
      ckpt.toString, schema = d.schema, maxFilesPerTrigger = 2)
    q.awaitTermination()
    // 6 files at 2/trigger → at least 3 micro-batches, each ≤ 2 files
    assert(q.lastProgress.batchId >= 2)
    assert(Files.exists(lake.resolve("_spark_metadata")),
      "file sink must write its commit log")
    val view = StreamingLake.lakeView(spark, lake.toString)
    assert(view.where(col("_corrupt_record").isNotNull).count() === 0L)
    val got = view.select("doc_id", "text", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val want = d.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got === want) // streamed ≡ batch, byte-lossless
  }

  test("restart with same checkpoint processes ONLY new files (exactly-once)") {
    val (landing, lake, ckpt) = StreamingLake.stageDirs()
    val d1 = docs(20)
    StreamingLake.dropJsonWave(d1, landing, wave = 1, parts = 2)
    val q1 = StreamingLake.ingest(spark, landing.toString, lake.toString,
      ckpt.toString, schema = d1.schema, maxFilesPerTrigger = 2)
    q1.awaitTermination()
    val afterWave1 =
      StreamingLake.lakeView(spark, lake.toString).count()
    assert(afterWave1 === 20L)

    // second wave lands while no query is running (the restart case:
    // an ingest job dies / is redeployed, then catches up)
    val d2 = docs(15, from = 100)
    StreamingLake.dropJsonWave(d2, landing, wave = 2, parts = 2)
    val q2 = StreamingLake.ingest(spark, landing.toString, lake.toString,
      ckpt.toString, schema = d1.schema, maxFilesPerTrigger = 2)
    q2.awaitTermination()
    val view = StreamingLake.lakeView(spark, lake.toString)
    // 35 rows TOTAL: wave-1 files were not re-read (their rows would
    // double to 55 if the checkpoint's file log were ignored)
    assert(view.count() === 35L)
    assert(view.select(countDistinct(col("doc_id"))).head().getLong(0) === 35L)
    // the restarted query's source admitted only the 2 new files
    assert(q2.lastProgress.batchId > q1.lastProgress.batchId)
  }

  test("tailing mode picks up files that arrive while the query is live") {
    val (landing, lake, ckpt) = StreamingLake.stageDirs()
    val d1 = docs(10)
    StreamingLake.dropJsonWave(d1, landing, wave = 1, parts = 1)
    val q = StreamingLake.ingest(spark, landing.toString, lake.toString,
      ckpt.toString, schema = d1.schema, maxFilesPerTrigger = 4,
      availableNow = false)
    try {
      q.processAllAvailable()
      assert(StreamingLake.lakeView(spark, lake.toString).count() === 10L)
      // a new file lands under the SAME live query
      StreamingLake.dropJsonWave(docs(5, from = 50), landing, wave = 2, parts = 1)
      q.processAllAvailable()
      assert(StreamingLake.lakeView(spark, lake.toString).count() === 15L)
    } finally q.stop()
  }

  test("partitioned streaming lake: sink layout matches the batch lake writer") {
    val (landing, lake, ckpt) = StreamingLake.stageDirs()
    val d = docs(30)
    StreamingLake.dropJsonWave(d, landing, wave = 1, parts = 2)
    val q = StreamingLake.ingest(spark, landing.toString, lake.toString,
      ckpt.toString, schema = d.schema, maxFilesPerTrigger = 2,
      partitionBy = Seq("lang"))
    q.awaitTermination()
    assert(Files.exists(lake.resolve("lang=en")) &&
      Files.exists(lake.resolve("lang=fr")),
      "streaming sink must write hive-partitioned directories")
    // pruned read over the streamed lake: the filter must land in
    // PartitionFilters exactly as on the batch-written lake (q141)
    val slice = StreamingLake.lakeView(spark, lake.toString)
      .where(col("lang") === "en")
    // the AQE-safe shared assertion (sparkPlan, not executedPlan —
    // an AQE-wrapped executedPlan hides FileSourceScanExec until
    // materialization and would fail here spuriously)
    graft.sources.FileSources.assertPartitionPruned(slice)
    assert(slice.count() === 15L)
  }

  test("parquet landing drops stream with the same exactly-once contract") {
    val (landing, lake, ckpt) = StreamingLake.stageDirs()
    val d = docs(25)
    // typed drops land as parquet files (an upstream Spark job's
    // output directory IS the landing prefix)
    d.where(col("doc_id") < 10).repartition(2)
      .write.mode("append").parquet(landing.toString)
    val q1 = StreamingLake.ingest(spark, landing.toString, lake.toString,
      ckpt.toString, schema = d.schema, format = "parquet",
      maxFilesPerTrigger = 1)
    q1.awaitTermination()
    assert(StreamingLake.lakeView(spark, lake.toString).count() === 10L)
    d.where(col("doc_id") >= 10).repartition(2)
      .write.mode("append").parquet(landing.toString)
    val q2 = StreamingLake.ingest(spark, landing.toString, lake.toString,
      ckpt.toString, schema = d.schema, format = "parquet",
      maxFilesPerTrigger = 1)
    q2.awaitTermination()
    val view = StreamingLake.lakeView(spark, lake.toString)
    assert(view.count() === 25L) // typed round trip, no re-reads
    val got = view.select("doc_id", "text", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val want = d.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got === want)
  }

  test("cleanSource archive: consumed landing files move to the archive after commit") {
    val (landing, lake, ckpt) = StreamingLake.stageDirs()
    val archive = Files.createDirectory(landing.getParent.resolve("archive"))
    val d = docs(12)
    StreamingLake.dropJsonWave(d, landing, wave = 1, parts = 3)
    val q = StreamingLake.ingest(spark, landing.toString, lake.toString,
      ckpt.toString, schema = d.schema, maxFilesPerTrigger = 1,
      archiveDir = Some(archive.toString))
    q.awaitTermination()
    assert(StreamingLake.lakeView(spark, lake.toString).count() === 12L)
    // Spark archives batch N's files when batch N+1 STARTS, so after
    // a 3-batch drain the last batch's file legitimately remains in
    // landing until a later batch runs — the steady-state contract is
    // "landing holds at most the un-succeeded tail", not "empty".
    def landingFiles() = Files.list(landing).iterator().asScala
      .count(_.getFileName.toString.endsWith(".json"))
    def archivedFiles() = Files.walk(archive).iterator().asScala
      .count(p => p.getFileName.toString.endsWith(".json"))
    var waited = 0
    while (landingFiles() > 1 && waited < 100) { Thread.sleep(100); waited += 1 }
    assert(landingFiles() <= 1,
      "all but the final batch's file must leave the landing prefix")
    assert(archivedFiles() >= 2)
    // a follow-up wave archives the leftover during its own batches
    StreamingLake.dropJsonWave(docs(4, from = 50), landing, wave = 2, parts = 2)
    val q2 = StreamingLake.ingest(spark, landing.toString, lake.toString,
      ckpt.toString, schema = d.schema, maxFilesPerTrigger = 1,
      archiveDir = Some(archive.toString))
    q2.awaitTermination()
    waited = 0
    while (landingFiles() > 1 && waited < 100) { Thread.sleep(100); waited += 1 }
    assert(landingFiles() <= 1)
    // the raw drops remain REPLAYABLE: archive + landing leftovers
    // together hold every original byte (sourceArchiveDir preserves
    // the original path shape under the archive root)
    assert(archivedFiles() + landingFiles() == 5)
    val replay = spark.read.schema(d.schema)
      .option("recursiveFileLookup", "true") // archive keeps the
      // original (deep) path shape under its root
      .json(archive.toString, landing.toString)
    assert(replay.count() === 16L)
  }

  test("corrupt lines stream into the lake as countable rows, never crash") {
    val (landing, lake, ckpt) = StreamingLake.stageDirs()
    val d = docs(8)
    StreamingLake.dropJsonWave(d, landing, wave = 1, parts = 1,
      rawExtraLines = Seq("""{BROKEN""", "not json"))
    val q = StreamingLake.ingest(spark, landing.toString, lake.toString,
      ckpt.toString, schema = d.schema, maxFilesPerTrigger = 2)
    q.awaitTermination()
    val view = StreamingLake.lakeView(spark, lake.toString)
    assert(view.where(col("_corrupt_record").isNotNull).count() === 2L)
    assert(view.where(col("_corrupt_record").isNull).count() === 8L)
  }

  test("byte-based admission: maxBytesPerTrigger bounds batches when file sizes vary") {
    val (landing, lake, ckpt) = StreamingLake.stageDirs()
    // real drops vary 1000× in size — a count knob alone admits either
    // a trickle or a monster batch; the byte cap self-paces both
    val d = docs(30)
    StreamingLake.dropJsonWave(d, landing, wave = 1, parts = 6)
    val oneFileBytes = Files.list(landing).iterator().asScala
      .map(Files.size).max
    val q = StreamingLake.ingest(spark, landing.toString, lake.toString,
      ckpt.toString, schema = d.schema,
      maxBytesPerTrigger = Some(oneFileBytes)) // replaces the count knob
    q.awaitTermination()
    // 6 files with a ~1-file byte cap → several micro-batches, not one
    assert(q.lastProgress.batchId >= 2,
      s"byte cap must split the drain, got batchId=${q.lastProgress.batchId}")
    val got = StreamingLake.lakeView(spark, lake.toString)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === d.collect().map(_.getLong(0)).toSet) // census intact
  }

  test("latestFirst backfill: the first committed batch carries the NEWEST files") {
    val (landing, lake, ckpt) = StreamingLake.stageDirs()
    StreamingLake.dropJsonWave(docs(10), landing, wave = 1, parts = 1)
    // age wave 1 so modification-time ordering is unambiguous
    Files.list(landing).iterator().asScala.foreach { f =>
      Files.setLastModifiedTime(f,
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - 120000))
    }
    StreamingLake.dropJsonWave(docs(5, from = 100), landing, wave = 2, parts = 1)
    val q = StreamingLake.ingest(spark, landing.toString, lake.toString,
      ckpt.toString, schema = docs(1).schema, maxFilesPerTrigger = 1,
      latestFirst = true)
    q.awaitTermination()
    assert(StreamingLake.lakeView(spark, lake.toString).count() === 15L)
    // read batch 0's files straight from the sink's commit log: under
    // latestFirst they must hold wave 2 (doc_id >= 100) only
    val batch0 = Files.readAllLines(lake.resolve("_spark_metadata").resolve("0"))
      .asScala.filter(_.contains("\"path\""))
      .map(l => l.split("\"path\":\"")(1).split("\"")(0))
    assert(batch0.nonEmpty)
    val ids = spark.read.schema(docs(1).schema)
      .parquet(batch0.toSeq: _*)
      .select("doc_id").collect().map(_.getLong(0))
    assert(ids.nonEmpty && ids.forall(_ >= 100L),
      s"latestFirst must drain the newest wave first, batch 0 held ${ids.toSeq}")
  }

  test("binary media drops: streamed ≡ batch on a growing directory (q149 twin)") {
    import graft.sources.FileSources
    val (landing, lake, ckpt) = StreamingLake.stageDirs()
    // wave 1: six own-codec WAV blobs + a foreign file the glob must
    // prune AT LISTING (a mixed drop directory never enumerates
    // non-media files into tasks)
    val wavs1 = graft.ops.WavOps.textToWavOwn(
      docs(6).select("doc_id", "text"), "doc_id", "text")
    FileSources.writeBinaryFiles(wavs1, landing,
      concat(col("id"), lit(".wav")), col("wav"))
    Files.write(landing.resolve("README.txt"), "not media".getBytes)
    val q1 = StreamingLake.ingestBinary(spark, landing.toString,
      lake.toString, ckpt.toString, glob = "*.wav", maxFilesPerTrigger = 2)
    q1.awaitTermination()
    assert(q1.lastProgress.batchId >= 2,
      s"6 files at 2/trigger must split, got batchId=${q1.lastProgress.batchId}")
    // wave 2 lands AFTER the first drain — the growing media directory;
    // the same checkpoint must ingest ONLY the new files (exactly-once)
    val wavs2 = graft.ops.WavOps.textToWavOwn(
      docs(4, from = 100).select("doc_id", "text"), "doc_id", "text")
    FileSources.writeBinaryFiles(wavs2, landing,
      concat(col("id"), lit(".wav")), col("wav"))
    val q2 = StreamingLake.ingestBinary(spark, landing.toString,
      lake.toString, ckpt.toString, glob = "*.wav", maxFilesPerTrigger = 2)
    q2.awaitTermination()
    // streamed ≡ batch: identical (file, content-hash) sets
    def keys(df: org.apache.spark.sql.DataFrame): Set[(String, String)] = df
      .select(regexp_extract(col("path"), "([^/]+\\.wav)$", 1).as("f"),
        sha2(col("content"), 256).as("h"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val streamed = StreamingLake.lakeView(spark, lake.toString)
    val batch = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.wav").load(landing.toString)
    assert(streamed.count() === 10L,
      "10 media files total, each ingested exactly once across both drains")
    assert(keys(streamed) === keys(batch),
      "streamed lake must hold byte-identical payloads to the batch read")
    // payload integrity THROUGH the stream: the repo's own codec must
    // decode every streamed blob (one corrupted byte breaks this)
    val frames = graft.ops.WavOps.wavStats(
        streamed.select(
          regexp_extract(col("path"), "(\\d+)\\.wav$", 1).cast("long").as("id"),
          col("content").as("wav")), "id", "wav")
      .where(col("n_frames") > 0).count()
    assert(frames === 10L)
  }
}
