package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout operators for 100 TB pipelines: bucketing (co-located
  * joins without a shuffle) and salting (skew-resistant joins).
  */
object Layout {

  /** Write a table bucketed by `keyCol` into the session catalog —
    * subsequent equi-joins between tables bucketed on the same key
    * with the same bucket count need NO exchange (asserted in
    * `LayoutSpec`). This is the batch analog of faust's co-partitioned
    * topics (`faust/assignor/partition_assignor.py` co-partitioning —
    * a deleted concept whose benefit bucketing keeps).
    */
  def writeBucketed(df: DataFrame, table: String, keyCol: String,
                    numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, keyCol)
      .sortBy(keyCol)
      .saveAsTable(table)

  /** Write a table hive-partitioned by `partitionCols` — predicates on
    * those columns prune whole directories at PLANNING time (the scan
    * never lists, opens, or reads excluded partitions). At 100 TB the
    * partition column (ingest date, source, language) is what turns
    * "scan everything" into "scan today's slice"; bucketing handles
    * join co-location WITHIN a partition. Partition pruning + fewer
    * files read are asserted in `LayoutSpec`.
    */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Salted equi-join for skewed keys: explode the small side into
    * `saltFactor` copies, salt the big side uniformly (hash of a
    * stable id, not rand() — deterministic), join on (key, salt). Every
    * hot key's rows spread over `saltFactor` tasks instead of one.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltIdCol: String, saltFactor: Int): DataFrame = {
    val saltedBig = big.withColumn("_salt",
      pmod(xxhash64(col(saltIdCol)), lit(saltFactor)).cast("int"))
    val saltedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedBig.join(saltedSmall, Seq(key, "_salt")).drop("_salt")
  }

  /** Key-skew diagnostic for a prospective join/groupBy key — the
    * decision table behind [[saltedJoin]]'s `saltFactor` (and AQE's
    * skew-join threshold): the k heaviest keys with their row share
    * and their ratio to the mean rows-per-key. A ratio_to_mean in the
    * hundreds on a key you are about to shuffle on IS the straggler
    * task; salt it or route it through the skew-join path.
    *
    * Scale shape: one partial-aggregated groupBy on the key, a 1-row
    * (total, n_keys) scalar over the count table broadcast back (the
    * t19/p09 scalar-crossJoin class), and top-k via orderBy+limit —
    * `TakeOrderedAndProject`, k rows per partition, never a global
    * sort.
    */
  def skewReport(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n_rows"))
    val scalars = counts.agg(sum(col("n_rows")).as("total"),
      count(lit(1)).as("nkeys"))
    counts.crossJoin(broadcast(scalars))
      .select(col(keyCol), col("n_rows"),
        round(col("n_rows") / col("total").cast("double"), 6).as("share"),
        round((col("n_rows") * col("nkeys")) / col("total").cast("double"), 6)
          .as("ratio_to_mean"))
      .orderBy(col("n_rows").desc, col(keyCol))
      .limit(k)
  }
}
