package graft.sources

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Streaming file-source ingestion — the landing-directory twin of
  * topic consumption (faust's only source is a topic,
  * `faust/topics.py:57-494`; in the lake world the "topic" is a
  * landing prefix that files keep arriving under).
  *
  * `readStream` over the landing directory with
  *  - an EXPLICIT schema (required for streaming file sources anyway —
  *    the same no-inference discipline as the batch connectors);
  *  - `maxFilesPerTrigger` admission control: a backlogged landing
  *    prefix drains in bounded micro-batches instead of one giant
  *    batch that overwhelms executor memory (the 100 TB backfill
  *    case: point the stream at a year of drops and it self-paces);
  *  - EXACTLY-ONCE file tracking: the source checkpoint records which
  *    files each batch consumed (so a restart never re-reads them),
  *    and the parquet sink writes a `_spark_metadata` commit log that
  *    batch readers of the lake honor — files from a batch that died
  *    mid-write are invisible, so landing→lake is end-to-end
  *    exactly-once (the idempotent-sink posture ChangelogSink proves
  *    for tables, here at file grain);
  *  - PERMISSIVE decode with a counted `_corrupt_record` column for
  *    JSON drops — malformed lines land in the lake as countable rows,
  *    never crash the continuous query (faust's decode-error contract,
  *    `faust/serializers/codecs.py:1-60`).
  *
  * Scale posture: the streaming file source lists the landing prefix
  * per trigger — on an object store that listing is the steady-state
  * cost, so production prefixes are date-bucketed (`landing/dt=.../`)
  * and rotated; the checkpoint's seen-files log compacts itself
  * (`spark.sql.streaming.fileSource.log.compactInterval`). The sink
  * side partitions by the lake key (e.g. lang) exactly like the batch
  * lake writer, so downstream pruned reads see the same layout.
  */
object StreamingLake {

  /** Start a landing→lake continuous query.
    *
    * @param format  "json" (PERMISSIVE + `_corrupt_record` appended to
    *                the schema) or "parquet" (typed drops)
    * @param clean   transform applied per micro-batch (narrow ops keep
    *                the ingest shuffle-free)
    * @param availableNow true → drain the current backlog in
    *                maxFilesPerTrigger-bounded batches and stop (the
    *                batch-backfill mode); false → keep running and
    *                pick up new files per trigger (the tailing mode)
    */
  /** @param archiveDir when set, consumed landing files are MOVED
    *                    here after their batch commits (`cleanSource
    *                    archive`) — the landing prefix stays small
    *                    (listing cost is the steady-state tax) and
    *                    the raw drops remain replayable from the
    *                    archive; the faust-world analog of consumed-
    *                    offset retention. Archival is best-effort and
    *                    asynchronous by Spark's contract — files move
    *                    after commit, so exactly-once is unaffected.
    * @param maxBytesPerTrigger BYTE-based admission: real drops vary
    *                    1000× in file size, so a file-count knob alone
    *                    admits either a trickle of tiny files or one
    *                    micro-batch holding a multi-GB drop. With a
    *                    byte cap a batch closes at whichever limit
    *                    hits first (Spark processes past the cap only
    *                    to finish the file that crossed it — admission
    *                    is at file grain, so one file larger than the
    *                    cap still forms a single batch rather than
    *                    splitting). Production ingest should size this
    *                    to executor memory, not file counts.
    * @param latestFirst backfill trade: process NEWEST files first so
    *                    a tailing query pointed at a deep backlog
    *                    serves fresh data immediately and drains
    *                    history behind it. The cost is ORDER — batches
    *                    no longer replay landing order, so any
    *                    order-sensitive `clean` (dedup-keep-first,
    *                    session stitching) must not combine with it.
    */
  def ingest(spark: SparkSession,
             landingDir: String,
             lakeDir: String,
             checkpointDir: String,
             schema: StructType,
             format: String = "json",
             maxFilesPerTrigger: Int = 2,
             partitionBy: Seq[String] = Nil,
             clean: DataFrame => DataFrame = identity,
             availableNow: Boolean = true,
             archiveDir: Option[String] = None,
             maxBytesPerTrigger: Option[Long] = None,
             latestFirst: Boolean = false): StreamingQuery = {
    // Spark forbids setting both admission knobs at once — the byte
    // cap, when given, REPLACES the file-count cap (it is the knob
    // production ingest should size anyway; see the param doc)
    val reader0 = spark.readStream
      .option("latestFirst", latestFirst.toString)
    val reader1 = maxBytesPerTrigger.fold(
      reader0.option("maxFilesPerTrigger", maxFilesPerTrigger))(cap =>
      reader0.option("maxBytesPerTrigger", cap.toString))
    val reader = archiveDir.fold(reader1)(dir =>
      reader1.option("cleanSource", "archive")
        .option("sourceArchiveDir", dir))
    val raw = format match {
      case "json" =>
        val withCorrupt = StructType(schema.fields :+
          StructField("_corrupt_record", StringType, nullable = true))
        reader.schema(withCorrupt)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt_record")
          .json(landingDir)
      case "parquet" =>
        reader.schema(schema).parquet(landingDir)
      case other =>
        throw new IllegalArgumentException(s"unsupported format: $other")
    }
    val writer = clean(raw).writeStream
      .format("parquet")
      .option("path", lakeDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(if (availableNow) Trigger.AvailableNow()
               else Trigger.ProcessingTime("1 second"))
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*)
     else writer).start()
  }

  /** Streaming twin of q149's BATCH media-directory ingest — real
    * media drops land continuously (r17 verdict item 4): a
    * `binaryFile` readStream over the landing prefix tails image/
    * audio/shard drops into a parquet lake with the same machinery
    * text ingest gets — glob pruning AT LISTING (foreign files never
    * enumerate into tasks), file-count or byte admission (media files
    * are exactly the 1000×-size-variance case the byte knob exists
    * for), exactly-once file tracking across restarts, and the
    * `_spark_metadata` commit log on the sink. The source's fixed
    * `(path, modificationTime, length, content)` schema is supplied
    * explicitly — streaming file sources require one, and binaryFile
    * cannot infer in streaming mode.
    *
    * Scale posture: content blobs ride WHOLE into the lake (decode /
    * feature-extraction happens downstream at lake grain, m-series);
    * size admission by bytes so one trigger never holds more blob
    * bytes than executor memory. Listing is the steady-state cost —
    * date-bucket and rotate the landing prefix like the JSON path.
    */
  def ingestBinary(spark: SparkSession,
                   landingDir: String,
                   lakeDir: String,
                   checkpointDir: String,
                   glob: String,
                   maxFilesPerTrigger: Int = 2,
                   maxBytesPerTrigger: Option[Long] = None,
                   availableNow: Boolean = true): StreamingQuery = {
    import org.apache.spark.sql.types.{BinaryType, LongType, TimestampType}
    val binarySchema = StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
    val reader0 = spark.readStream.format("binaryFile")
      .option("pathGlobFilter", glob)
      .schema(binarySchema)
    val reader = maxBytesPerTrigger.fold(
      reader0.option("maxFilesPerTrigger", maxFilesPerTrigger))(cap =>
      reader0.option("maxBytesPerTrigger", cap.toString))
    reader.load(landingDir)
      .writeStream
      .format("parquet")
      .option("path", lakeDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(if (availableNow) Trigger.AvailableNow()
               else Trigger.ProcessingTime("1 second"))
      .start()
  }

  /** Batch view of a streamed lake. A plain parquet read of the sink
    * directory honors its `_spark_metadata` commit log: only files of
    * COMMITTED micro-batches are listed, so a reader never sees a
    * half-written batch (the exactly-once read side).
    */
  def lakeView(spark: SparkSession, lakeDir: String): DataFrame =
    spark.read.parquet(lakeDir)

  /** Staging triple (landing, lake, checkpoint) under FileSources'
    * managed root — same two-generation reclaim + JVM-exit cleanup as
    * the batch round-trip helpers.
    */
  def stageDirs(): (Path, Path, Path) = {
    val root = FileSources.stageDir("graft-streamlake-")
    (Files.createDirectory(root.resolve("landing")),
     root.resolve("lake"),
     root.resolve("checkpoint"))
  }

  /** Drop `df` into the landing directory as `parts` JSON-lines files
    * (one arrival wave), plus optional raw malformed lines. Returns
    * the landing dir. Multiple calls model successive waves — file
    * names are salted per wave so waves never collide.
    */
  def dropJsonWave(df: DataFrame, landing: Path, wave: Int,
                   parts: Int = 2, rawExtraLines: Seq[String] = Nil): Path = {
    val tmp = Files.createTempDirectory(landing.getParent, "wave-tmp-")
    df.repartition(parts).write.mode("overwrite").json(tmp.toString)
    // Files.list/walk streams hold an open directory descriptor until
    // closed — stress/bench paths call this repeatedly
    val listing = Files.list(tmp)
    try {
      val files = listing.iterator()
      var i = 0
      while (files.hasNext) {
        val f = files.next()
        if (f.getFileName.toString.startsWith("part-")) {
          Files.move(f, landing.resolve(s"wave$wave-part$i.json"))
          i += 1
        }
      }
    } finally listing.close()
    if (rawExtraLines.nonEmpty)
      Files.write(landing.resolve(s"wave$wave-injected.json"),
        (rawExtraLines.mkString("\n") + "\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // reclaim the move-source dir skeleton
    val walk = Files.walk(tmp)
    try walk.sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.deleteIfExists(p))
    finally walk.close()
    landing
  }
}
