package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off environment probe (not part of the library surface). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.printSchema()
    ev.orderBy("event_id").show(3, truncate = false)
    import org.apache.spark.sql.functions._
    ev.select(min(unix_timestamp(col("ts"))), max(unix_timestamp(col("ts")))).show()
    val doc = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    doc.select(md5(col("text")).as("m"), col("doc_id")).orderBy("doc_id").show(3, truncate = false)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    emb.printSchema()
    spark.stop()
  }
}
