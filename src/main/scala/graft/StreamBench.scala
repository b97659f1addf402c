package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Structured-Streaming throughput scenario: replay the events table
  * through a MemoryStream in micro-batches driving a watermarked
  * tumbling-window aggregation — the reference's windowed_aggregation
  * workload shape (its bench reports sec per 10k events consumed;
  * divide wall seconds by rows/10k for comparability).
  */
object StreamBench {

  def windowedReplay(spark: SparkSession, sfDir: String, chunks: Int = 10): Unit = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val rows = Tables.events(spark, sfDir)
      .select($"ts_sec", $"event_type", $"value")
      .as[(Long, String, Double)]
      .collect()

    // streaming state is per-shuffle-partition: for this row volume a
    // handful of state stores beats 32 (less per-batch store overhead)
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    val input = MemoryStream[(Long, String, Double)]
    val df = input.toDS().toDF("ts_sec", "event_type", "value")
      .withColumn("ts", timestamp_seconds($"ts_sec"))
    val agg = df.withWatermark("ts", "1 hour")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"), sum($"value").as("sum_v"))
    val q = agg.writeStream.outputMode("update")
      .format("noop")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-bench-cp").toString)
      .start()
    try {
      val chunkSize = math.max(1, rows.length / chunks)
      rows.grouped(chunkSize).foreach { chunk =>
        input.addData(chunk.toSeq)
      }
      q.processAllAvailable()
    } finally {
      q.stop()
      spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    }
  }
}
