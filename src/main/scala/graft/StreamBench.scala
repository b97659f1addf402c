package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Structured-Streaming throughput scenario: replay the events table
  * through a MemoryStream in micro-batches driving a watermarked
  * tumbling-window aggregation — the reference's windowed_aggregation
  * workload shape (its bench reports sec per 10k events consumed;
  * divide wall seconds by rows/10k for comparability).
  *
  * The reference bench times the CONSUME loop only (`RECV {i}` after
  * the producer has filled the topic) — so [[prepare]] (producer side)
  * and [[warmup]] (one-row query: streaming planner + codegen JIT)
  * run outside the timed region, and [[windowedReplay]] times
  * ingestion through state commit. Spark is free to coalesce the
  * queued chunks into fewer micro-batches — that adaptive batching IS
  * micro-batch throughput behavior, same as the reference's aiokafka
  * client fetching as much as is buffered.
  */
object StreamBench {

  /** Producer side: materialize the replay rows (not timed). */
  def prepare(spark: SparkSession, sfDir: String): Array[(Long, String, Double)] = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .select($"ts_sec", $"event_type", $"value")
      .as[(Long, String, Double)]
      .collect()
  }

  /** One-row end-to-end run to JIT the streaming planner/codegen paths
    * before timing (not timed).
    */
  def warmup(spark: SparkSession): Unit =
    stageReplay(spark, Array((0L, "warm", 0.0)), chunks = 1)()

  /** Stage the replay and return the timed consume closure.
    *
    * Measurement envelope mirrors the reference bench, which times
    * ONLY its RECV loop on an already-booted worker
    * (`t/bench/base.py:59-102`): here the streaming query is STARTED
    * and PRIMED with one sentinel micro-batch at stage time (query
    * startup, first-batch planning, state-store creation = faust
    * worker boot, untimed), and the closure times the consume of the
    * replay rows: enqueue (row→InternalRow encode — faust's RECV also
    * pays per-event json decode), micro-batch processing through state
    * commit, and shutdown.
    *
    * Conf isolation: each replay runs on a `cloneSession()`, so the
    * scenario's shuffle-partition / no-data settings never leak into
    * the shared bench session (streaming captures conf at start
    * anyway — the clone makes that explicit and mutation-free).
    */
  def stageReplay(spark: SparkSession, rows: Array[(Long, String, Double)],
                  chunks: Int = defaultChunks,
                  shufflePartitions: Int = defaultShuffle): () => Unit = {
    // cloneSession is private[sql] in Spark 4 (same bridge situation
    // as ColumnBridge): inherits current conf + shares the context
    val s: SparkSession =
      org.apache.spark.sql.graftbridge.ColumnBridge.cloneSession(spark)
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    // streaming state is per-shuffle-partition: for this row volume a
    // handful of state stores beats 32 (less per-batch store overhead)
    s.conf.set("spark.sql.shuffle.partitions", shufflePartitions.toString)
    // After the last data batch, the watermark advance schedules one
    // EMPTY no-data micro-batch (state eviction tick) — ~0.3s of pure
    // bookkeeping for zero rows in this finite replay, with no output
    // in update mode and no analog in the reference's RECV loop (faust
    // has no watermark machinery). Skip it for the scenario;
    // long-running pipelines keep the default (eviction must fire).
    s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")

    val input = MemoryStream[(Long, String, Double)]
    val chunkSize = math.max(1, rows.length / chunks)

    val df = input.toDS().toDF("ts_sec", "event_type", "value")
      .withColumn("ts", timestamp_seconds($"ts_sec"))
    val agg = df.withWatermark("ts", "1 hour")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"), sum($"value").as("sum_v"))
    val checkpoint =
      java.nio.file.Files.createTempDirectory("graft-bench-cp").toString

    val q = agg.writeStream.outputMode("update")
      .format("noop")
      .option("checkpointLocation", checkpoint)
      .start()
    // prime: sentinel batch runs startup costs here, not in the timing.
    // The sentinel (ts=0, type="warm") keys its own window+group, far
    // below every replay window (real event times are ~1.7e9 s), so it
    // never merges with replay state — but it DOES occupy one extra
    // group row in the state store for the run's lifetime. That is the
    // whole skew; at 2 shuffle partitions and thousands of replay
    // groups it is unmeasurable, and the faust analog (worker boot
    // leaves heartbeat state around) has the same shape.
    input.addData(Seq((0L, "warm", 0.0)))
    q.processAllAvailable()

    () => {
      try {
        rows.grouped(chunkSize).foreach(chunk => input.addData(chunk.toSeq))
        q.processAllAvailable()
      } finally {
        q.stop()
        if (debug) dumpProgress(q)
        // each stage creates its own checkpoint; without this, a
        // multi-iteration bench leaks one temp dir per replay
        deleteRecursively(java.nio.file.Paths.get(checkpoint))
      }
    }
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import java.nio.file.Files
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.deleteIfExists(f))
    }
  }

  /** Replay knobs for the b03 profiling loop (defaults = the shipped
    * scenario: 10 chunks mirrors the reference's 10k-event commit
    * cadence at 100k events, `BASELINE.md` row 4).
    */
  private def defaultChunks: Int =
    sys.env.getOrElse("SPARK_GRAFT_B03_CHUNKS", "10").toInt
  private def defaultShuffle: Int =
    sys.env.getOrElse("SPARK_GRAFT_B03_SHUFFLE", "2").toInt
  private def debug: Boolean =
    sys.env.get("SPARK_GRAFT_B03_DEBUG").contains("1")

  /** Per-batch duration breakdown (stderr, debug only): where each
    * micro-batch spends its wall time — addBatch (processing + state
    * commit) vs the offset/WAL bookkeeping around it.
    */
  private def dumpProgress(q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    val ps = q.recentProgress
    System.err.println(s"[b03] ${ps.length} micro-batches")
    ps.foreach { p =>
      val d = p.durationMs
      System.err.println(s"[b03] batch=${p.batchId} rows=${p.numInputRows} " +
        s"trigger=${d.get("triggerExecution")} addBatch=${d.get("addBatch")} " +
        s"getBatch=${d.get("getBatch")} planning=${d.get("queryPlanning")} " +
        s"walCommit=${d.get("walCommit")} commitOffsets=${d.get("commitOffsets")} " +
        s"latestOffset=${d.get("latestOffset")}")
    }
  }
}
