package graft.api

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, KeyValueGroupedDataset}
import org.apache.spark.sql.functions._

/** The faust `Stream` operator surface
  * (`/root/reference/faust/streams.py:100-1001`) as a thin value
  * wrapper over `Dataset[T]`. Each method lowers to a vanilla Catalyst
  * construct, so the optimizer sees plain projections/filters/shuffles
  * — nothing here adds a physical operator.
  *
  * Deleted concepts (owned by Spark): per-event acks (`streams.py:946-965`)
  * → checkpointing; repartition topics (`streams.py:507-604`) → shuffle
  * Exchange; passive drainers, buffer pressure, `noack` — all moot in a
  * micro-batch engine.
  */
final class GStream[T](val app: App, val ds: Dataset[T]) {

  /** `stream.filter(fun)` (`streams.py:606-627`). */
  def filter(p: T => Boolean): GStream[T] = new GStream(app, ds.filter(p))

  /** Column-predicate filter — prefer this: codegen'd, pushdown-able. */
  def where(cond: Column): GStream[T] = new GStream(app, ds.where(cond))

  /** Per-event transform — the agent body / `add_processor`
    * (`streams.py:215-229,899-906`). Adjacent maps are collapsed by
    * Catalyst.
    */
  def map[U: Encoder](f: T => U): GStream[U] = new GStream(app, ds.map(f))

  def flatMap[U: Encoder](f: T => IterableOnce[U]): GStream[U] =
    new GStream(app, ds.flatMap(f))

  /** Columnar projection — prefer over [[map]] for pure column ops. */
  def select(cols: Column*): GStream[org.apache.spark.sql.Row] =
    new GStream(app, ds.select(cols: _*))

  /** `stream.group_by(key)` (`streams.py:507-604`): repartition by a
    * new key. No internal topic round-trip — Catalyst inserts the
    * shuffle; co-partitioning for downstream tables is implicit.
    */
  def groupBy[K: Encoder](key: T => K): KeyValueGroupedDataset[K, T] =
    ds.groupByKey(key)

  /** `stream.through(topic)` (`streams.py:405-454`): an explicit
    * repartition barrier; here a plain exchange on `n` partitions.
    */
  def through(numPartitions: Int, cols: Column*): GStream[T] =
    new GStream(app,
      if (cols.isEmpty) ds.repartition(numPartitions)
      else ds.repartition(numPartitions, cols: _*))

  /** `stream.echo(*channels)` (`streams.py:487-505`): tee to a side
    * effect and keep streaming. Batch: eager side write; streaming
    * callers should use `foreachBatch` multi-write instead.
    */
  def echo(sink: Dataset[T] => Unit): GStream[T] = {
    sink(ds)
    this
  }

  /** `stream & other` / `combine` (`streams.py:674-691`). */
  def union(other: GStream[T]): GStream[T] = new GStream(app, ds.union(other.ds))

  /** `stream.take(n)` (`streams.py:303-395`) — bounded buffer; in a
    * micro-batch engine the batch *is* the buffer, so this is `limit`.
    */
  def take(n: Int): GStream[T] = new GStream(app, ds.limit(n))

  /** `stream.take(max_, within)` (`streams.py:303-395`): emit buffers
    * of up to `max` elements, flushing at least every `within`. In
    * micro-batch terms "flush every `within`" is the trigger interval
    * and "up to `max` per buffer" is the per-trigger admission cap —
    * returns the writeStream knobs to apply rather than a new plan:
    * trigger = ProcessingTime(within), plus `maxOffsetsPerTrigger`
    * (Kafka) / `maxFilesPerTrigger` (files) for the cap.
    */
  def takeWithin(max: Int, within: java.time.Duration):
      (org.apache.spark.sql.streaming.Trigger, Map[String, String]) =
    (org.apache.spark.sql.streaming.Trigger.ProcessingTime(within.toMillis),
      // row cap applies per source flavor: Kafka honors
      // maxOffsetsPerTrigger directly; file sources admit whole files,
      // so the cap is expressed in files (>=1) — one file may still
      // exceed `max` rows, which is the file source's granularity floor.
      Map("maxOffsetsPerTrigger" -> max.toString,
        "maxFilesPerTrigger" -> math.max(1, max).toString))

  /** `stream.enumerate()` (`streams.py:397-403`): attach a running
    * index. Globally ordered — requires a total order column; this is
    * a single-partition window at scale, use only on small/serving data.
    * At scale use [[enumerateLocal]].
    */
  def enumerate(orderCol: Column): DataFrame =
    ds.withColumn("index",
      row_number().over(org.apache.spark.sql.expressions.Window.orderBy(orderCol)) - 1)

  /** Partition-local enumerate — the scale-safe replacement for faust's
    * `enumerate` (`streams.py:397-403`; faust's index is per-worker
    * anyway, since each worker counts only its own partitions' events).
    * Attaches (`part`, `index`): the 0-based position within the Spark
    * partition, ordered by `orderCol`. ZERO shuffles: the sort is
    * `sortWithinPartitions` (narrow) and the numbering decomposes
    * `monotonically_increasing_id()` (documented layout: partition id
    * in the upper bits, per-partition record number in the lower 33) —
    * no Exchange of any kind in the plan, unlike a
    * `Window.partitionBy(spark_partition_id())` formulation which
    * would hash-shuffle on the very ids rows already have.
    */
  def enumerateLocal(orderCol: Column): DataFrame =
    ds.sortWithinPartitions(orderCol)
      .withColumn("_mid", monotonically_increasing_id())
      .withColumn("part", shiftright(col("_mid"), 33).cast("int"))
      .withColumn("index", col("_mid").bitwiseAND(lit((1L << 33) - 1)))
      .drop("_mid")

  /** The GLOBALLY-ordered enumerate at scale: the same total-order
    * running index as [[enumerate]], via the two-pass distributed
    * prefix sum (`PrefixSum.globalRowNumber`) instead of a
    * single-partition window sort — the data shuffles once on the
    * bucket cut and every task sorts ~bucketWidth rows; only the tiny
    * bucket-subtotal table crosses a single-partition exchange.
    * `bucket` must be a monotone non-decreasing function of
    * `orderCol` (e.g. `floor(orderCol / 4096)`).
    */
  def enumerateDistributed(orderCol: Column, bucket: Column): DataFrame =
    graft.ops.PrefixSum.globalRowNumber(
        ds.toDF(), Seq(orderCol), bucket, "__graft_enum_rk")
      .withColumn("index", col("__graft_enum_rk") - 1)
      .drop("__graft_enum_rk")

  def toDF: DataFrame = ds.toDF()
}
