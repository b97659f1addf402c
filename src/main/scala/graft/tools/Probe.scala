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
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.ops.VectorOps.semanticDedupClusters(
      graft.Tables.embeddings(spark, "/root/testdata/sf0.001"),
      "vec_id", "embedding", nCells = 8, threshold = 0.4)
    val plan = df.queryExecution.executedPlan.toString
    println("ReusedExchangeCount: " + (plan.split("ReusedExchange").length - 1))
    println("ScanParquetCount: " + (plan.split("Scan parquet").length - 1))
    println("WindowCount: " + (plan.split("\\bWindow\\b").length - 1))
    println(plan.linesIterator.take(80).mkString("\n"))
    spark.stop()
  }
}
