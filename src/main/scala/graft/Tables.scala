package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated TPC-H-ish corpus (TESTDATA.md).
  *
  * `events.parquet` carries INT64 TIMESTAMP(NANOS) which Spark's
  * microsecond `TimestampType` rejects; we read it as epoch-nanos LONG
  * (`spark.sql.legacy.parquet.nanosAsLong`) and derive `ts_sec`
  * (epoch seconds, exact integer division — no double roundtrip, so it
  * agrees bit-for-bit with any other engine's `floor(epoch(ts))`).
  */
object Tables {

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Events with `ts_sec: LONG` (epoch seconds) added. `ts` stays raw ns. */
  def events(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "events")
      .withColumn("ts_sec", expr("ts div 1000000000"))

  /** DuckDB-side equivalent of [[events]]: the oracle CTE every
    * event-time query's SQL starts from. `floor(epoch(ts))` keeps only
    * the (exactly representable) integer seconds of the ns timestamp.
    */
  val eventsCte: String =
    "WITH e AS (SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec, " +
      "user_id, event_type, value, props FROM events)"
}
