package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout operators for 100 TB pipelines: bucketing (co-located
  * joins without a shuffle) and salting (skew-resistant joins).
  */
object Layout {

  /** Hash-shuffle (small) result rows before a global sort (r18).
    *
    * A global `orderBy` plans a range exchange whose partitioner must
    * SAMPLE its child first — and the sampling pass re-executes the
    * child plan a second time down to the nearest materialized
    * shuffle stage. For queries whose tail above the last shuffle is
    * expensive (codec decodes, candidate verification, wide scalar
    * projections), the whole tail runs TWICE per action (profiled on
    * d26: an extra full-cost stage per run that writes nothing — the
    * sampler). Interposing one hash exchange on the final rows makes
    * the tail run once into a materialized stage; the sampler then
    * re-reads that stage instead of re-running the tail. Rows and
    * the final sorted order are unchanged — the sort above is what
    * defines the output. Use only where the tail is expensive and
    * the result is report-sized (the extra exchange carries the
    * result rows once).
    */
  def pinBeforeSort(df: DataFrame, keys: String*): DataFrame =
    df.repartition(keys.map(col): _*)

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

  /** 32-bit Morton (Z-order) interleave of two 16-bit grid coordinates:
    * bit i of `even` lands at position 2i, bit i of `odd` at 2i+1.
    * Sixteen shift/mask terms with disjoint target bits — pure integer
    * arithmetic, whole-stage-codegen'd, replayable in any SQL engine.
    */
  def mortonInterleave16(even: Column, odd: Column): Column =
    (0 until 16).map { i =>
      shiftleft(shiftright(even, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(odd, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** Z-order data-skipping effectiveness report — the decision table
    * behind an OPTIMIZE-ZORDER-style rewrite (Morton-curve clustering
    * so per-file min/max stats prune on BOTH dimensions; the public
    * Delta/Iceberg layout idea). Both columns scale to a 16-bit grid
    * over their [min, max] span (exact integer `div` — no FP), rows
    * fall into 256 Z-prefix chunks (`morton >> 24`) for the zorder
    * layout and 256 `yCol`-prefix chunks for the `linear` baseline
    * (the natural time-sorted layout when `yCol` is event time). A
    * chunk survives pruning iff its min/max box overlaps the query
    * rectangle [xLo, xHi] × [yLo, yHi] — exactly parquet row-group
    * min/max semantics. Reports, per layout: chunk counts, rows
    * scanned vs rows actually matching, and the scan amplification.
    *
    * Scale shape: one 1-row min/max scalar broadcast (q85's seed
    * class), per-chunk partial-agg rollups (≤ 2×256 rows), a 2-row
    * layout rollup, and the 1-row exact-match count — the raw table
    * crosses no single-partition exchange and is scanned twice
    * (ONE grid pass emits both layouts' chunk labels per row +
    * the predicate count), never sorted. Column spans wider than
    * Long.MaxValue/65535 (≈4.5 years of epoch-MICROseconds — epoch
    * seconds are always safe) would overflow the exact gridding;
    * the plan raises a named error instead of reporting garbage.
    */
  def zorderSkippingReport(df: DataFrame, xCol: String, yCol: String,
                           xLo: Long, xHi: Long,
                           yLo: Long, yHi: Long): DataFrame = {
    val spanCap = Long.MaxValue / 65535L
    val bounds = df.agg(
        min(col(xCol)).as("minx"), max(col(xCol)).as("maxx"),
        min(col(yCol)).as("miny"), max(col(yCol)).as("maxy"))
      // the >= 0 legs catch the subtraction ITSELF wrapping: max >= min
      // always, so a negative difference means the true span exceeded
      // Long.MaxValue and the spanCap compare would otherwise pass on
      // the wrapped value
      .withColumn("_span_ok", assert_true(
        col("maxx") - col("minx") >= 0L
          && col("maxx") - col("minx") <= spanCap
          && col("maxy") - col("miny") >= 0L
          && col("maxy") - col("miny") <= spanCap,
        lit("zorderSkippingReport: column span exceeds Long-exact " +
          "16-bit gridding ((v - min) * 65535 would overflow)")))
    val gridded = df.select(col(xCol).as("xv"), col(yCol).as("yv"))
      .crossJoin(broadcast(bounds))
      .selectExpr("xv", "yv",
        // 16-bit grid coords; `div` keeps it exact integer floor
        // (operands non-negative after the min shift). `_span_ok` is
        // null on success and raises on overflow — referencing it here
        // (adds 0) keeps the guard from being pruned out of the plan.
        "((xv - minx) * 65535) div (CASE WHEN maxx > minx THEN maxx - minx ELSE 1 END)" +
          " + COALESCE(CAST(_span_ok AS BIGINT), 0) AS bx",
        "((yv - miny) * 65535) div (CASE WHEN maxy > miny THEN maxy - miny ELSE 1 END) AS by")
      .withColumn("morton", mortonInterleave16(col("bx"), col("by")))
    // ONE grid scan emits both layouts' (layout, chunk) labels per row
    val perChunk = gridded
      .select(col("xv"), col("yv"), explode(array(
        struct(lit("zorder").as("layout"),
          shiftright(col("morton"), 24).as("chunk")),
        struct(lit("linear").as("layout"),
          shiftright(col("by"), 8).as("chunk")))).as("lc"))
      .select(col("lc.layout").as("layout"), col("lc.chunk").as("chunk"),
        col("xv"), col("yv"))
      .groupBy("layout", "chunk")
      .agg(count(lit(1)).as("n_rows"),
        min(col("xv")).as("min_x"), max(col("xv")).as("max_x"),
        min(col("yv")).as("min_y"), max(col("yv")).as("max_y"))
      .withColumn("scanned",
        (col("max_x") >= xLo && col("min_x") <= xHi &&
          col("max_y") >= yLo && col("min_y") <= yHi).cast("long"))
    val matching = df.where(col(xCol).between(xLo, xHi)
      && col(yCol).between(yLo, yHi))
      .agg(count(lit(1)).as("rows_matching"))
    perChunk.groupBy("layout")
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("scanned")).as("chunks_scanned"),
        sum(col("n_rows")).as("rows_total"),
        sum(col("scanned") * col("n_rows")).as("rows_scanned"))
      .crossJoin(broadcast(matching))
      .select(col("layout"), col("n_chunks"), col("chunks_scanned"),
        col("rows_total"), col("rows_scanned"), col("rows_matching"),
        // explicit NULL when the rectangle matches nothing — relying
        // on non-ANSI div-by-zero would differ from an ANSI/SQL mirror
        when(col("rows_matching") > 0,
          round(col("rows_scanned").cast("double")
            / col("rows_matching"), 6)).as("scan_amplification"))
      .orderBy("layout")
  }
}
