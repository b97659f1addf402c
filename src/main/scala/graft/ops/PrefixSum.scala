package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed grouped running sums — the standard two-pass prefix
  * sum, expressed declaratively, replacing the
  * `Window.partitionBy(lowCardinalityCol)` running-total idiom.
  *
  * The problem (round-16 verdict finding 1): a running sum whose
  * window partition is a ~10-value column (`source`) serializes each
  * group's ENTIRE stream through one task — correct and fast at
  * sf0.1, a single-task sort of a multi-TB byte stream at 100 TB.
  * PlanHygieneSpec's exchange sweeps can't see it: the exchange is a
  * hash exchange, the skew is value-level.
  *
  * The fix is the classic two-pass prefix sum:
  *
  *   1. cut each group's order into BUCKETS via a monotone function
  *      of the leading order key (caller-supplied, e.g.
  *      `floor(doc_id / 4096)`);
  *   2. aggregate per-(group, bucket) subtotals — grain #groups ×
  *      #buckets, a ~10^4–10^7-row table at any input size;
  *   3. prefix the subtotals per group with an EXCLUSIVE running sum
  *      — this window IS partitioned by the low-cardinality group,
  *      but over the aggregated subtotal table (one row per bucket),
  *      never the raw data;
  *   4. broadcast-join the per-(group, bucket) offsets back and
  *      finish with a partition-LOCAL cumulative sum windowed on
  *      (group, bucket) — high cardinality, parallel, each task
  *      sorting ~bucketWidth rows.
  *
  * Exactness: integer sums are associative; the (group, bucket)
  * decomposition is a partition of the group's total order, so
  * offset + local-cumsum ≡ the single-window cumsum bit-for-bit.
  *
  * Sizing: pick the bucket width so both ends stay comfortable —
  * width ~sqrt(rows-per-group) balances the subtotal-table size
  * (prefixed in one task per group) against per-task sort size. The
  * default 4096 holds from the sf0.001 fixtures through ~10^10 rows
  * per group. The offsets table is broadcast; at extreme bucket
  * counts (>10^7) drop the hint and let AQE pick a shuffle join.
  */
object PrefixSum {

  /** Adds `out` = the INCLUSIVE cumulative sum of `value` within
    * `group`, under the total order `order` (which must be total
    * within each group — a unique tie-breaker column last).
    * `bucket` must be a monotone non-decreasing function of the
    * leading `order` prefix within every group.
    */
  def groupedRunningSum(df: DataFrame, group: Seq[String],
                        order: Seq[Column], bucket: Column,
                        value: Column, out: String): DataFrame = {
    val b = "__psum_bucket"
    val groupCols = group.map(col)
    val withB = df.withColumn(b, bucket)
    // pass 1: per-(group, bucket) subtotals — aggregated grain
    val subs = withB
      .groupBy(groupCols :+ col(b): _*)
      .agg(sum(value).as("__psum_sub"))
    // pass 2: EXCLUSIVE per-group prefix over the subtotal table.
    // This window partitions by the low-cardinality group on purpose:
    // its input is one row per bucket, not per row of `df`.
    val wOff = Window.partitionBy(groupCols: _*).orderBy(col(b))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = subs
      .withColumn("__psum_off",
        coalesce(sum(col("__psum_sub")).over(wOff), lit(0L)))
      .drop("__psum_sub")
    // pass 3: partition-local inclusive cumsum + the bucket's offset.
    // NULL-SAFE join keys: window partitioning groups NULLs together,
    // so a NULL group/bucket value is a legitimate partition — a
    // using-columns equi-join would silently DROP those rows where
    // the window formulation kept them.
    val offAliased = offsets.select(
      group.map(c => col(c).as(s"__psum_g_$c")) ++
        Seq(col(b).as("__psum_b"), col("__psum_off")): _*)
    val cond = (group.map(c => col(c) <=> col(s"__psum_g_$c")) :+
      (col(b) <=> col("__psum_b"))).reduce(_ && _)
    val wIn = Window.partitionBy(groupCols :+ col(b): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withB
      .join(broadcast(offAliased), cond)
      .withColumn(out, col("__psum_off") + sum(value).over(wIn))
      // restore the caller's column order (callers treat this as
      // df + out; the join appended the aliased key columns)
      .select(df.columns.map(col) :+ col(out): _*)
  }

  /** `row_number()` within `group` ordered by `order`, as a grouped
    * running COUNT — the same two-pass shape for the rank idiom
    * (`Window.partitionBy(source, modality).orderBy(doc_id)` rank is
    * the other half of the m07 packing plan that serializes per
    * group). `order` must be total within each group; the result is
    * then identical to `row_number` by definition.
    */
  def groupedRowNumber(df: DataFrame, group: Seq[String],
                       order: Seq[Column], bucket: Column,
                       out: String): DataFrame =
    groupedRunningSum(df, group, order, bucket, lit(1L), out)

  /** GLOBAL running index — faust's `enumerate` at scale: row_number
    * over a total order WITHOUT single-partition-sorting the data
    * (group-less [[groupedRowNumber]]). The only single-partition step
    * left is the exclusive prefix over the bucket-subtotal table — one
    * map-side-combined row per bucket, the same bounded-exchange class
    * as the repo's global scalar aggregates. 1-based, like row_number.
    */
  def globalRowNumber(df: DataFrame, order: Seq[Column], bucket: Column,
                      out: String): DataFrame =
    groupedRowNumber(df, Seq.empty, order, bucket, out)
}
