package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Changelog sink — the faust compacted changelog topic
  * (`/root/reference/faust/tables/base.py:253-286,449-478`) as a
  * batch-versioned parquet log with read-side compaction.
  *
  * Write path: each micro-batch appends `(key..., value..., _batch_id)`
  * — idempotent per batchId (re-run of a batch overwrites its own
  * partition directory, giving exactly-once-per-sink on retry, the
  * `foreachBatch` txn pattern from SURVEY §2.8).
  *
  * Read path: "compaction" = latest row per key, a window over
  * `_batch_id` — what Kafka log compaction does continuously, done
  * lazily at read. For production-scale serving this directory layout
  * is partition-pruned on `_batch_id` and Z-order-able by key.
  */
object ChangelogSink {

  /** foreachBatch body: append this batch's changed rows. */
  def appendBatch(dir: String)(batch: DataFrame, batchId: Long): Unit =
    batch.withColumn("_batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("_batch_id")
      .parquet(dir)

  /** Compacted view: latest record per key (ties broken by later batch). */
  def readCompacted(spark: SparkSession, dir: String, keyCols: Seq[String]): DataFrame = {
    val raw = spark.read.parquet(dir)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col("_batch_id").desc)
    raw.withColumn("_rk", row_number().over(w))
      .where(col("_rk") === 1)
      .drop("_rk", "_batch_id")
  }
}
