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
  * per group. The offsets table is broadcast-hinted by default; at
  * extreme bucket counts (>10^7 — e.g. 10^11 rows at width 4096) pass
  * `broadcastOffsets = false` so the multi-GB offsets table goes
  * through an AQE-chosen shuffle join instead of a driver collect.
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
                        value: Column, out: String,
                        broadcastOffsets: Boolean = true): DataFrame =
    groupedRunningSums(df, group, order, bucket, Seq(value -> out),
      broadcastOffsets)

  /** Multi-value variant: N running sums under ONE order share the
    * subtotal pass, the offsets join, and the final local window —
    * a rank + cumulative-value pair (the Pareto/concentration shape:
    * q88, ABC classing) costs one kernel pass, not two.
    */
  def groupedRunningSums(df: DataFrame, group: Seq[String],
                         order: Seq[Column], bucket: Column,
                         values: Seq[(Column, String)],
                         broadcastOffsets: Boolean = true): DataFrame = {
    require(values.nonEmpty, "at least one (value, out) pair")
    val b = "__psum_bucket"
    val groupCols = group.map(col)
    val withB = df.withColumn(b, bucket)
    // pass 1: per-(group, bucket) subtotals — aggregated grain
    val subAggs = values.zipWithIndex.map { case ((v, _), i) =>
      sum(v).as(s"__psum_sub_$i")
    }
    val subs = withB
      .groupBy(groupCols :+ col(b): _*)
      .agg(subAggs.head, subAggs.tail: _*)
    // pass 2: EXCLUSIVE per-group prefix over the subtotal table.
    // This window partitions by the low-cardinality group on purpose:
    // its input is one row per bucket, not per row of `df`. The
    // coalesced zero is cast back to the subtotal's own type so a
    // DECIMAL running sum keeps its exact type end-to-end (the
    // bigint zero would otherwise widen the coalesce).
    val wOff = Window.partitionBy(groupCols: _*).orderBy(col(b))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = values.indices.foldLeft(subs) { (acc, i) =>
      acc.withColumn(s"__psum_off_$i",
        coalesce(sum(col(s"__psum_sub_$i")).over(wOff), lit(0L))
          .cast(subs.schema(s"__psum_sub_$i").dataType))
    }.drop(values.indices.map(i => s"__psum_sub_$i"): _*)
    // pass 3: partition-local inclusive cumsum + the bucket's offset.
    // NULL-SAFE join keys: window partitioning groups NULLs together,
    // so a NULL group/bucket value is a legitimate partition — a
    // using-columns equi-join would silently DROP those rows where
    // the window formulation kept them.
    val offAliased = offsets.select(
      group.map(c => col(c).as(s"__psum_g_$c")) ++
        Seq(col(b).as("__psum_b")) ++
        values.indices.map(i => col(s"__psum_off_$i")): _*)
    val cond = (group.map(c => col(c) <=> col(s"__psum_g_$c")) :+
      (col(b) <=> col("__psum_b"))).reduce(_ && _)
    val wIn = Window.partitionBy(groupCols :+ col(b): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offSide = if (broadcastOffsets) broadcast(offAliased) else offAliased
    val joined = withB.join(offSide, cond)
    val withOuts = values.zipWithIndex.foldLeft(joined) {
      case (acc, ((v, out), i)) =>
        acc.withColumn(out, col(s"__psum_off_$i") + sum(v).over(wIn))
    }
    // restore the caller's column order (callers treat this as
    // df + outs; the join appended the aliased key columns)
    withOuts.select(df.columns.map(col) ++ values.map(p => col(p._2)): _*)
  }

  /** NTILE(k) over a global total order `(key, tiebreak)` WITHOUT the
    * single-task sort an unpartitioned `ntile().over(...)` window
    * plans: distributed rank via [[globalRowNumber]] under a
    * data-adaptive [[uniformBucket]] cut on `key`, then the
    * SQL-standard tile formula from (rank, n) — the first n mod k
    * tiles take ⌈n/k⌉ rows, the rest ⌊n/k⌋ — so the result matches
    * `NTILE` bit-for-bit. `key` must be non-null and `tiebreak` must
    * make the order total (ties would make tiles nondeterministic in
    * ANY engine).
    */
  def globalNtile(df: DataFrame, key: Column, descending: Boolean,
                  tiebreak: Column, k: Int, out: String): DataFrame = {
    require(k >= 1, "need at least one tile")
    val b = "__ntile_b"
    val rk = "__ntile_rk"
    val n = "__ntile_n"
    val ordered = if (descending) Seq(key.desc, tiebreak)
                  else Seq(key, tiebreak)
    val ranked = globalRowNumber(
      uniformBucket(df, key, 4096, b, descending), ordered, col(b), rk)
    val census = df.agg(count(lit(1)).as(n))
    // long floor-division via double: exact while both operands sit
    // far below 2^52 (counts and ranks — they do)
    def idiv(a: Column, bb: Column): Column =
      floor(a.cast("double") / bb.cast("double")).cast("long")
    val big = idiv(col(n), lit(k))
    val rem = col(n) % k
    val tile = when(col(rk) <= (big + 1) * rem,
        idiv(col(rk) - 1, big + 1) + 1)
      .otherwise(rem +
        idiv(col(rk) - 1 - (big + 1) * rem, greatest(big, lit(1L))) + 1)
    ranked.crossJoin(broadcast(census))
      .withColumn(out, tile.cast("int"))
      .select(df.columns.map(col) :+ col(out): _*)
  }

  /** Data-adaptive monotone bucket cut: appends `out` =
    * `floor((key − min) / ((max − min) / n))` (mirrored when
    * `descending`), capped into `[0, n)`, from a 1-row min/max
    * stats broadcast — the bucket function for [[groupedRunningSums]]
    * when the order key has no natural fixed-width cut (revenue,
    * spend: range unknown until runtime, shifts with scale). Weak
    * monotonicity is all the kernel needs, and IEEE subtraction /
    * positive-constant division / floor are each weakly monotone, so
    * the cut is valid for ANY FINITE key distribution; balance (not
    * correctness) degrades if the key mass concentrates in one
    * bucket. `key` must be non-null AND finite (aggregate outputs
    * here are both): Spark sorts NULL and NaN at the ends of the
    * order while `floor(NaN/width)` degenerates to bucket 0, and an
    * infinite min/max makes `dist/width` NaN for every row — either
    * breaks the weak-monotonicity contract silently.
    */
  def uniformBucket(df: DataFrame, key: Column, n: Int, out: String,
                    descending: Boolean = false): DataFrame = {
    require(n >= 1, "need at least one bucket")
    val st = df.agg(min(key).cast("double").as("__ub_min"),
      max(key).cast("double").as("__ub_max"))
    val span = col("__ub_max") - col("__ub_min")
    val width = when(span > lit(0.0), span / lit(n.toDouble))
      .otherwise(lit(1.0))
    val dist = if (descending) col("__ub_max") - key.cast("double")
               else key.cast("double") - col("__ub_min")
    df.crossJoin(broadcast(st))
      .withColumn(out,
        least(floor(dist / width), lit((n - 1).toLong)).cast("long"))
      .drop("__ub_min", "__ub_max")
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
                       out: String,
                       broadcastOffsets: Boolean = true): DataFrame =
    groupedRunningSum(df, group, order, bucket, lit(1L), out,
      broadcastOffsets)

  /** GLOBAL running index — faust's `enumerate` at scale: row_number
    * over a total order WITHOUT single-partition-sorting the data
    * (group-less [[groupedRowNumber]]). The only single-partition step
    * left is the exclusive prefix over the bucket-subtotal table — one
    * map-side-combined row per bucket, the same bounded-exchange class
    * as the repo's global scalar aggregates. 1-based, like row_number.
    */
  def globalRowNumber(df: DataFrame, order: Seq[Column], bucket: Column,
                      out: String,
                      broadcastOffsets: Boolean = true): DataFrame =
    groupedRowNumber(df, Seq.empty, order, bucket, out, broadcastOffsets)
}
