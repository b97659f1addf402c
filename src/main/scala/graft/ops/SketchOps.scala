package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Distributed sketches with PORTABLE, engine-recomputable semantics.
  *
  * Spark's own `approx_count_distinct` (HLL++, q25) is engine-local:
  * its bias-correction tables make the estimate unverifiable outside
  * the JVM. This flavor is a textbook HyperLogLog (Flajolet et al.
  * 2007) over `xxhash64`, built from deterministic integer + IEEE
  * arithmetic only, so a warehouse engine can recompute the estimate
  * BIT-FOR-BIT (XxHashSql.hllPortableOracle) — the same
  * portable-twin pattern as the MD5 minhash flavors (d03 vs d08).
  *
  * Reference behavior: faust has no sketches; target addition for
  * corpus-scale distinct counts (unique users/urls/docs per slice).
  *
  * Scale shape: one narrow scan → 2^p-group partial-aggregatable
  * groupBy (map-side combine collapses every partition to ≤2^p rows)
  * → single tiny reduction. No window, no sort, no driver collect;
  * the shuffle carries at most executors × 2^p register rows.
  *
  * Determinism notes making bit-parity possible:
  *  - the scaled register sum Σ 2^(w+1-Mj) is summed as DECIMAL
  *    (exact, order-free), never as doubles (double-sum is
  *    order-dependent under shuffle);
  *  - every float op afterwards is a correctly-rounded IEEE
  *    division/multiplication applied in the same textual order as
  *    the oracle SQL;
  *  - raw-range estimator only (no small-range linear counting →
  *    no transcendentals, whose last-ulp rounding is libm-specific).
  *    Callers should keep true cardinality ≥ 2.5·2^p; the standard
  *    alpha constant below assumes m ≥ 128 (p ≥ 7).
  */
object SketchOps {

  /** One-row frame `(hll_est double)` estimating `countDistinct(key)`.
    * Standard error ≈ 1.04/sqrt(2^p).
    */
  def hyperLogLog(df: DataFrame, keyCol: String, p: Int = 8): DataFrame =
    hyperLogLogBy(df, Seq.empty, keyCol, p)

  /** Per-group estimates: `groupCols... , hll_est` — the
    * `groupBy(slice).approxDistinct(key)` shape. Same bit-parity
    * construction as [[hyperLogLog]]; callers keep every group's true
    * cardinality ≥ 2.5·2^p (raw-range estimator).
    *
    * Scale: register rows are (group × 2^p)-bounded and partial
    * aggregate map-side, so the shuffle carries sketch rows, not
    * events; the final per-group fold is one ordinary groupBy.
    */
  def hyperLogLogBy(df: DataFrame, groupCols: Seq[String], keyCol: String,
                    p: Int = 8): DataFrame =
    hllEstimateFromRegisters(hllRegisters(df, groupCols, keyCol, p),
      groupCols, p)

  /** KMV (k minimum values) distinct-count estimate — the fourth
    * portable sketch next to HLL (q53), CMS (q55) and Bloom (q59),
    * and the one you get FOR FREE from a
    * [[graft.ops.SampleOps.bottomKSample]]: over the distinct 60-bit
    * key hashes mapped to [0, 1), the k-th smallest value `m` yields
    * `est = (k-1)/m` (Bar-Yossef et al. 2002; stderr ≈ 1/√(k−2)).
    * When fewer than k distinct hashes exist the sample IS the
    * population and the estimate is the exact count.
    *
    * Output: one row `(k_used, kth_uh, est_distinct)`.
    *
    * Scale shape: one DISTINCT partial agg on the hash, then a
    * `TakeOrderedAndProject` bottom-k (k rows per partition cross,
    * no global sort) and an O(k) fold. Unlike HLL the sketch is
    * exact-membership on its k survivors — mergeable by unioning
    * bottom-k sets and re-truncating.
    */
  def kmvDistinctEstimate(df: DataFrame, keyCol: String,
                          k: Int = 64): DataFrame = {
    require(k >= 3, "k >= 3 (estimator needs k-1 > 1)")
    val uh = graft.functions.PortableHash.mdHash60(col(keyCol).cast("string"))
      .cast("double") / (1L << 60).toDouble
    df.select(uh.as("uh")).distinct()
      .orderBy(col("uh")).limit(k)
      .agg(count(lit(1)).as("k_used"), max(col("uh")).as("kth_uh"))
      .select(col("k_used"), col("kth_uh"),
        when(col("k_used") < k, col("k_used").cast("double"))
          .otherwise((col("k_used") - 1).cast("double") / col("kth_uh"))
          .as("est_distinct"))
  }

  /** KMV set-operation estimates (Beyer et al. 2007, "On synopses
    * for distinct-value estimation under multiset operations"):
    * from each side's bottom-k distinct-hash sketch alone —
    * union = (k−1)/m over the re-truncated combined sketch,
    * Jaccard = the fraction of combined-sketch survivors present in
    * BOTH sides, intersection = Jaccard × union. The whole point is
    * that the ESTIMATES come from two k-row synopses: at 100 TB the
    * sides never co-shuffle — each side reduces to k hashes
    * independently (mergeable, incrementally maintainable), and the
    * set algebra runs on 2k rows wherever the sketches meet.
    *
    * Output: one row `(k_used, n_both, union_est, jaccard_est,
    * intersect_est)`. When the union has fewer than k distinct
    * hashes the synopsis is the population and union_est is exact.
    */
  def kmvSetOps(dfA: DataFrame, dfB: DataFrame, keyCol: String,
                k: Int = 64): DataFrame = {
    require(k >= 3, "k >= 3 (estimator needs k-1 > 1)")
    def sketch(df: DataFrame) = {
      val uh = graft.functions.PortableHash.mdHash60(col(keyCol).cast("string"))
        .cast("double") / (1L << 60).toDouble
      df.select(uh.as("uh")).distinct().orderBy(col("uh")).limit(k)
    }
    val ka = sketch(dfA)
    val kb = sketch(dfB)
    val kab = ka.union(kb).distinct().orderBy(col("uh")).limit(k)
    val both = ka.join(kb, Seq("uh"), "left_semi")
    val inBoth = kab.join(both, Seq("uh"), "left_semi")
    val agg = kab.agg(count(lit(1)).as("k_used"), max(col("uh")).as("m"))
      .crossJoin(inBoth.agg(count(lit(1)).as("n_both")))
    agg.select(col("k_used"), col("n_both"),
        when(col("k_used") < k, col("k_used").cast("double"))
          .otherwise((col("k_used") - 1).cast("double") / col("m"))
          .as("union_est"))
      .withColumn("jaccard_est",
        round(col("n_both").cast("double") / col("k_used"), 6))
      .withColumn("intersect_est",
        round(col("n_both").cast("double") / col("k_used")
          * col("union_est"), 6))
      .withColumn("union_est", round(col("union_est"), 6))
  }

  /** Register maintenance half: `(groupCols..., reg, mj)` via ONE
    * `max` aggregation — streaming-safe (update/complete modes), so a
    * Structured Streaming query can maintain per-(key, register) state
    * incrementally: max is commutative/idempotent, state is bounded by
    * groups × 2^p registers regardless of event volume — the
    * bounded-memory upgrade for SetTable-style distinct counts
    * (faust keeps the whole set; `faust/tables/sets.py`). Fold the
    * registers into estimates at read time with
    * [[hllEstimateFromRegisters]] (chained aggregations are not
    * streaming-executable in update mode, and the fold is O(2^p) —
    * serving-side work).
    */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], keyCol: String,
                   p: Int = 8): DataFrame = {
    require(p >= 7 && p <= 14, "p in [7,14]: alpha constant assumes m >= 128")
    val w = 64 - p
    val h = xxhash64(col(keyCol))
    val gcols = groupCols.map(col)
    // null keys are excluded, matching countDistinct (which ignores
    // nulls). Without the filter Spark would hash NULL to the seed
    // (one phantom member) while the oracle's NULL row vanishes from
    // SUM but not COUNT — a silent parity break on nullable keys.
    df.where(col(keyCol).isNotNull)
      .select(gcols :+ shiftrightunsigned(h, w).as("reg") :+
        hllRank(h, p).as("rank"): _*)
      .groupBy(gcols :+ col("reg"): _*).agg(max("rank").as("mj"))
  }

  /** Estimate fold over a `(groupCols..., reg, mj)` register frame
    * (batch): the bit-parity arithmetic shared by every HLL flavor.
    *
    * Tolerates duplicate `(group, reg)` rows — exactly what an
    * update-mode register LOG accumulates (one row per register per
    * micro-batch that changed it) — by max-deduping first. Without
    * that, `cnt` could exceed 2^p and the empty-register term would
    * go negative: silently wrong estimates. The extra groupBy is over
    * ≤ groups×2^p sketch rows — serving-side noise.
    */
  def hllEstimateFromRegisters(regs: DataFrame, groupCols: Seq[String],
                               p: Int): DataFrame = {
    val m = 1 << p
    val w = 64 - p
    val scale = 1L << (w + 1)
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / m.toDouble)
    val gcols = groupCols.map(col)
    val deduped = regs.groupBy(gcols :+ col("reg"): _*).agg(max("mj").as("mj"))
    val folded = deduped.groupBy(gcols: _*)
      .agg(
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${w + 1} - mj)")
          .cast(DecimalType(38, 0))).as("sp"),
        count(lit(1)).as("cnt"))
    folded.select(gcols :+ round(
      alpha * m.toDouble * m.toDouble /
        ((col("sp") + (lit(m) - col("cnt")) *
          lit(scale).cast(DecimalType(38, 0))).cast("double") / scale.toDouble),
      4).as("hll_est"): _*)
  }

  /** Sliding-window distinct counts from MERGED HLL registers — the
    * "distinct users in the trailing 24 h, hourly" problem exact
    * methods cannot do incrementally (windowed COUNT DISTINCT
    * re-scans every window). Registers build ONCE per bucket
    * (partial-agg, ≤ buckets×2^p rows); each target bucket then
    * unions its trailing `windowSize` buckets by register MAX — set
    * union is register max, the same merge property the shard-merge
    * spec pins — and folds the standard estimate. The exact leg
    * rides along as the error report; at 100 TB you drop it and keep
    * the sketch (data is never re-joined for the sketch leg — the
    * window fan touches calendar-bounded sketch rows only).
    */
  def hllSlidingDistinct(df: DataFrame, bucketCol: String, keyCol: String,
                         windowSize: Int, p: Int = 8): DataFrame = {
    require(windowSize >= 1, "windowSize >= 1")
    val nn = df.where(col(keyCol).isNotNull)
    val regs = hllRegisters(nn, Seq(bucketCol), keyCol, p)
    val targets = nn.select(col(bucketCol).as("__t")).distinct()
    val est = hllSlidingFromRegisters(regs, bucketCol, windowSize, p)
    val exact = targets.join(
        nn.select(col(bucketCol), col(keyCol)).distinct(),
        col(bucketCol).between(col("__t") - (windowSize - 1), col("__t")))
      .groupBy(col("__t").as("bucket"))
      .agg(countDistinct(col(keyCol)).as("exact_distinct"))
    est.join(exact, Seq("bucket"))
      .select(col("bucket"), col("exact_distinct"), col("hll_est"))
  }

  /** Serving half of [[hllSlidingDistinct]]: the sliding merge over an
    * EXISTING per-bucket register frame — exactly what a streaming
    * register log maintains in update mode ([[hllRegisters]] is the
    * maintenance agg; [[hllEstimateFromRegisters]] max-dedups the log
    * rows). The dashboard query reads sketch rows only; the stream is
    * never re-scanned (spec: streamed registers ≡ batch sliding
    * estimates, bit-equal).
    */
  def hllSlidingFromRegisters(regs: DataFrame, bucketCol: String,
                              windowSize: Int, p: Int = 8): DataFrame = {
    require(windowSize >= 1, "windowSize >= 1")
    val targets = regs.select(col(bucketCol).as("__t")).distinct()
    val merged = targets.join(regs,
        col(bucketCol).between(col("__t") - (windowSize - 1), col("__t")))
      .groupBy(col("__t"), col("reg")).agg(max("mj").as("mj"))
      .withColumnRenamed("__t", "bucket")
    hllEstimateFromRegisters(merged, Seq("bucket"), p)
  }

  /** DAU/WAU/MAU stickiness served from a maintained per-day HLL
    * register log — q131's sketch twin, making the whole engagement
    * family live-serveable: the stream maintains per-(day, register)
    * maxes ([[hllRegisters]] in update/complete mode, state ≤
    * days×2^p), and this read assembles DAU (per-day fold), WAU/MAU
    * (trailing 7/28-day register merges — register max IS set union)
    * and the DAU/WAU, DAU/MAU ratios from sketch rows only. The event
    * stream is never re-scanned; the exact batch twin (q131) re-scans
    * per report. Same trailing-window convention as q131: day D
    * aggregates activity over [D − w + 1, D], reported per ACTIVE day.
    */
  def stickinessFromRegisters(regs: DataFrame, dayCol: String,
                              p: Int = 8): DataFrame = {
    val dau = hllEstimateFromRegisters(regs, Seq(dayCol), p)
      .select(col(dayCol).as("day"), col("hll_est").as("dau_est"))
    val wau = hllSlidingFromRegisters(regs, dayCol, 7, p)
      .select(col("bucket").as("day"), col("hll_est").as("wau_est"))
    val mau = hllSlidingFromRegisters(regs, dayCol, 28, p)
      .select(col("bucket").as("day"), col("hll_est").as("mau_est"))
    dau.join(wau, Seq("day")).join(mau, Seq("day"))
      .select(col("day"), col("dau_est"), col("wau_est"), col("mau_est"),
        round(col("dau_est") / col("wau_est"), 6).as("stickiness_7"),
        round(col("dau_est") / col("mau_est"), 6).as("stickiness_28"))
      .orderBy("day")
  }

  /** Batch wrapper for [[stickinessFromRegisters]]: build the per-day
    * registers in one pass, then assemble the report. At 100 TB the
    * register build is the only corpus scan (partial-aggregated,
    * output ≤ days×2^p rows); everything after is sketch-row algebra.
    */
  def hllStickiness(df: DataFrame, dayCol: String, keyCol: String,
                    p: Int = 8): DataFrame =
    stickinessFromRegisters(hllRegisters(df, Seq(dayCol), keyCol, p),
      dayCol, p)

  /** Slice-pair set-intersection estimates by inclusion–exclusion
    * over portable HLL registers: |A∩B| ≈ |A| + |B| − |A∪B|, with
    * |A∪B| folded from the element-wise max of the two slices'
    * registers (register max IS set union — the merge property the
    * shard-merge spec pins). The sketch-cost twin of d25's exact
    * overlap matrix: registers are built in ONE pass over the data,
    * then every pair estimate is assembled from #slices × 2^p sketch
    * rows — the corpus is never self-joined.
    *
    * Output per pair (a < b): (src_a, src_b, est_a, est_b, est_union,
    * est_common). Estimates are the bit-reproducible q53 fold, so the
    * whole report is engine-recomputable despite being approximate;
    * the usual inclusion–exclusion caveat applies (the intersection
    * inherits BOTH sketches' ±1.04/√m error, so small true overlaps
    * can estimate negative — returned as-is, a property of the
    * method, not a bug).
    *
    * Scale shape: one register build (partial-aggregated groupBy,
    * ≤ slices × 2^p rows), a broadcast-nested-loop pair of the tiny
    * distinct-slice list (#slices² rows — the report's own
    * cardinality), two broadcast joins fanning registers to their
    * pairs, and keyed folds. Register frames are re-derived per leg
    * here for a self-contained lazy plan; production maintains them
    * as a materialized asset ([[hllRegisters]] is the streaming-safe
    * maintenance half) and this report reads sketch rows only.
    */
  def hllOverlap(df: DataFrame, sliceCol: String, keyCol: String,
                 p: Int = 8): DataFrame =
    hllOverlapFromRegisters(hllRegisters(df, Seq(sliceCol), keyCol, p),
      sliceCol, p)

  /** Register-frame half of [[hllOverlap]] — feed it a maintained
    * register table (e.g. the streaming [[hllRegisters]] state, or an
    * update-mode register LOG with duplicate rows: every fold
    * max-dedups) and the pairwise report is served from sketch rows
    * without touching the corpus at all.
    */
  def hllOverlapFromRegisters(regs: DataFrame, sliceCol: String,
                              p: Int): DataFrame = {
    val singles = hllEstimateFromRegisters(regs, Seq(sliceCol), p)
    val sl = regs.select(col(sliceCol)).distinct()
    val pairs = sl.select(col(sliceCol).as("src_a"))
      .crossJoin(broadcast(sl.select(col(sliceCol).as("src_b"))))
      .where(col("src_a") < col("src_b"))
    val ra = pairs.join(broadcast(regs.withColumnRenamed(sliceCol, "src_a")),
      Seq("src_a"))
    val rb = pairs.join(broadcast(regs.withColumnRenamed(sliceCol, "src_b")),
      Seq("src_b"))
    // duplicate (pair, reg) rows across the two legs are exactly what
    // the estimate fold max-dedups — the union merge happens there
    val union = hllEstimateFromRegisters(
      ra.unionByName(rb).select(col("src_a"), col("src_b"),
        col("reg"), col("mj")),
      Seq("src_a", "src_b"), p)
      .withColumnRenamed("hll_est", "est_union")
    union
      .join(broadcast(singles.select(col(sliceCol).as("src_a"),
        col("hll_est").as("est_a"))), Seq("src_a"))
      .join(broadcast(singles.select(col(sliceCol).as("src_b"),
        col("hll_est").as("est_b"))), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("est_a"), col("est_b"),
        col("est_union"),
        round(col("est_a") + col("est_b") - col("est_union"), 4)
          .as("est_common"))
  }

  /** Column form of the register rank, exposed for specs. */
  def hllRank(h: Column, p: Int): Column = {
    val w = 64 - p
    val v = h.bitwiseAND(lit((1L << w) - 1))
    when(v === 0, lit(w + 1)).otherwise(lit(w + 1) - length(bin(v)))
  }

  /** Count-Min Sketch registers (Cormode & Muthukrishnan 2005):
    * `depth` independent hash rows of `width` counters; each key
    * occurrence increments one counter per row. Portable MD5-seeded
    * hashing ([[graft.functions.PortableHash.mdHash60]]), so any
    * engine rebuilds the identical register matrix.
    *
    * Scale shape: one narrow scan, `depth` hashes per row fused in a
    * single explode (no self-union), then a partial-aggregatable
    * groupBy bounded by depth × width groups — the shuffle carries
    * register rows, never the stream. `count` is commutative, so the
    * same frame is streaming-safe in update mode (bounded state,
    * mirroring [[hllRegisters]]).
    *
    * Reference behavior: faust has no sketches; target addition for
    * approximate frequency tables (token/url counts) where the exact
    * Zipf-wide groupBy is the bottleneck.
    */
  def cmsRegisters(df: DataFrame, keyCol: String,
                   depth: Int = 4, width: Int = 256): DataFrame =
    cmsRegistersBy(df, Seq.empty, keyCol, depth, width)

  /** Per-group CMS registers: one independent sketch per value of
    * `groupCols` (per-language token frequencies, per-source URL
    * counts, …) — the grouped shape [[hyperLogLogBy]] (q54) has for
    * distinct counts. Shuffle bounded by groups × depth × width.
    */
  def cmsRegistersBy(df: DataFrame, groupCols: Seq[String], keyCol: String,
                     depth: Int = 4, width: Int = 256): DataFrame =
    cmsRegistersWeightedBy(df, groupCols, keyCol, lit(1L), depth, width)

  /** Weighted register build: each key row adds `weight` instead of 1.
    * The batch fast path when the key domain is much smaller than the
    * stream: pre-aggregate a `(key, count)` census (a cheap narrow-key
    * partial agg), then hash each DISTINCT key once — identical
    * registers to the per-occurrence build (sum of per-key counts ≡
    * occurrence count), at domain-many MD5s instead of stream-many.
    * The unweighted per-occurrence form stays the streaming path
    * (update-mode state maintenance has no census to pre-aggregate).
    */
  def cmsRegistersWeightedBy(df: DataFrame, groupCols: Seq[String],
                             keyCol: String, weight: Column,
                             depth: Int = 4, width: Int = 256): DataFrame = {
    require(depth >= 1 && depth <= 16, "depth in [1,16]")
    require(width >= 2, "width >= 2")
    val gcols = groupCols.map(col)
    df.where(col(keyCol).isNotNull)
      .select(gcols ++ Seq(weight.as("_w"), explode(array((0 until depth).map { i =>
        struct(lit(i).as("i"),
          (graft.functions.PortableHash.mdHash60(i, col(keyCol)) % width)
            .as("j"))
      }: _*)).as("p")): _*)
      .groupBy(gcols ++ Seq(col("p.i").as("i"), col("p.j").as("j")): _*)
      .agg(sum("_w").as("c"))
  }

  /** Point-estimate frequencies for `keys` against CMS registers:
    * `est = min over rows of counter[i][h_i(key)]` — a deterministic
    * OVERestimate of the true count (error ≤ e/width · N with
    * probability 1 − e^-depth). Keys never inserted still probe
    * existing counters (inner join is safe: every inserted key hits
    * all its registers; absent registers mean count 0 → join with
    * zero-fill via left join + coalesce).
    * Output: (key..., est_n).
    */
  def cmsEstimates(registers: DataFrame, keys: DataFrame, keyCol: String,
                   depth: Int, width: Int): DataFrame =
    cmsEstimatesBy(registers, keys, Seq.empty, keyCol, depth, width)

  /** Grouped twin of [[cmsEstimates]]: probe each group's own sketch
    * (`keys` must carry the group columns alongside the key).
    */
  def cmsEstimatesBy(registers: DataFrame, keys: DataFrame,
                     groupCols: Seq[String], keyCol: String,
                     depth: Int, width: Int): DataFrame = {
    val gcols = groupCols.map(col)
    val probes = keys.where(col(keyCol).isNotNull)
      .select(gcols ++ Seq(col(keyCol), explode(array((0 until depth).map { i =>
        struct(lit(i).as("i"),
          (graft.functions.PortableHash.mdHash60(i, col(keyCol)) % width)
            .as("j"))
      }: _*)).as("p")): _*)
      .select(gcols ++ Seq(col(keyCol), col("p.i").as("i"),
        col("p.j").as("j")): _*)
    probes.join(registers, groupCols ++ Seq("i", "j"), "left")
      .groupBy(gcols :+ col(keyCol): _*)
      .agg(min(coalesce(col("c"), lit(0L))).as("est_n"))
  }

  /** Join-size estimate from two CMS register sets (Cormode &
    * Muthukrishnan 2005 §4.2, the AGMS/CMS inner-product estimator):
    * for each depth row, the inner product Σ_j cA[i][j]·cB[i][j]
    * OVERestimates the true equi-join cardinality Σ_k fA(k)·fB(k)
    * (colliding keys only ever add mass); taking the MIN over rows
    * bounds the excess by e/width · |A|·|B| with probability
    * 1 − e^-depth. Pure integer arithmetic over already-built
    * registers — deterministic on any engine.
    *
    * This is the plan-time diagnostic you run BEFORE shuffling two
    * 100 TB tables on an unknown key: both sketches build in one
    * narrow pass each (≤ depth·width rows cross the wire), and the
    * estimate itself touches only depth·width register rows — the
    * skew/explosion answer (q66's per-table report, lifted to the
    * JOIN) at sketch cost.
    *
    * Both register frames must share `depth`/`width` (same seeded
    * hash family by construction). Output: 1 row, `est_join_size`.
    */
  def cmsJoinSize(regA: DataFrame, regB: DataFrame): DataFrame = {
    val a = regA.select(col("i"), col("j"), col("c").as("ca"))
    val b = regB.select(col("i"), col("j"), col("c").as("cb"))
    a.join(b, Seq("i", "j"))
      .groupBy("i").agg(sum(col("ca") * col("cb")).as("ip"))
      .agg(min(col("ip")).as("est_join_size"))
  }

  /** Portable Bloom filter — the set-membership member of the
    * portable-sketch family (distinct = [[hyperLogLog]], frequency =
    * [[cmsRegisters]], quantile = [[dyadicCmsRegisters]]). Spark's
    * native `bloom_filter_agg` (the d15/d20 prefilter) is an
    * engine-local byte blob; this flavor is the textbook k-hash bit
    * set over the MD5-seeded 60-bit hash, so any engine rebuilds the
    * identical bit set and replays every probe (q59's oracle does).
    *
    * Build: one narrow scan → ≤ `numBits`-row DISTINCT (partial-agg,
    * map-side collapses each partition to ≤ numBits rows; monotone
    * set union, so streaming update-mode maintenance works like the
    * other register sketches). Probe: explode k positions per key
    * against the (broadcastable, ≤ numBits-row) bit set — might
    * contain iff all k bits are set. No false negatives ever; false
    * positive rate ≈ (1 - e^(-k·n/m))^k.
    */
  def bloomBits(df: DataFrame, keyCol: String, numBits: Int,
                numHashes: Int): DataFrame =
    bloomBitsBy(df, Seq.empty, keyCol, numBits, numHashes)

  /** Grouped twin of [[bloomBits]]: one independent bit set per value
    * of `groupCols` — the per-slice membership filter (each shard or
    * language keeps its own, so filters stay small and a slice's
    * lookups never pay another slice's false-positive mass). Same
    * grouped shape as q54/q56/q58.
    */
  def bloomBitsBy(df: DataFrame, groupCols: Seq[String], keyCol: String,
                  numBits: Int, numHashes: Int): DataFrame = {
    require(numBits >= 2 && numHashes >= 1, "numBits >= 2, numHashes >= 1")
    val gcols = groupCols.map(col)
    df.where(col(keyCol).isNotNull)
      .select(gcols :+ explode(array((0 until numHashes).map { i =>
        graft.functions.PortableHash.mdHash60(i, col(keyCol)) % numBits
      }: _*)).as("bit"): _*)
      .distinct()
  }

  /** Probe half of [[bloomBits]]: per distinct key in `keys`, whether
    * every one of its k bit positions is set. The portable analog of
    * `BloomMightContain` (d15's native probe).
    */
  def bloomMightContain(bits: DataFrame, keys: DataFrame, keyCol: String,
                        numBits: Int, numHashes: Int): DataFrame =
    bloomMightContainBy(bits, keys, Seq.empty, keyCol, numBits, numHashes)

  /** Grouped twin of [[bloomMightContain]]: probe each group's own
    * bit set (`keys` carries the group columns alongside the key).
    */
  def bloomMightContainBy(bits: DataFrame, keys: DataFrame,
                          groupCols: Seq[String], keyCol: String,
                          numBits: Int, numHashes: Int): DataFrame = {
    val gcols = groupCols.map(col)
    val probes = keys.where(col(keyCol).isNotNull)
      .select(gcols :+ col(keyCol): _*)
      .distinct() // duplicate keys would double counts
      .select(gcols ++ Seq(col(keyCol),
        explode(array((0 until numHashes).map { i =>
          graft.functions.PortableHash.mdHash60(i, col(keyCol)) % numBits
        }: _*)).as("bit")): _*)
    probes.join(broadcast(bits.withColumn("_set", lit(1))),
        groupCols :+ "bit", "left")
      .groupBy(gcols :+ col(keyCol): _*)
      .agg((count(col("_set")) === numHashes).as("might_contain"))
  }

  /** Dyadic Count-Min quantile sketch (Cormode & Muthukrishnan 2005,
    * §4.2) — the quantile member of the portable-sketch family
    * (distinct = [[hyperLogLog]], frequency = [[cmsRegisters]]).
    *
    * One CMS is maintained over COMPOSITE keys `"level:block"`: each
    * value `v` in `[0, 2^levels)` updates, per dyadic level `l`, the
    * counter of the aligned block `v >> l`. Any prefix `[0, x)` then
    * decomposes into at most `levels` blocks (one per set bit of
    * `x`), so an estimated RANK is a sum of at most `levels` CMS
    * probes — and a φ-quantile is the smallest `x-1` whose estimated
    * rank reaches `ceil(φ·N)`. Sharing one register matrix across
    * levels keeps the state a single depth × width grid; cross-level
    * collisions only ever OVERcount (CMS is one-sided), so estimated
    * ranks dominate true ranks and the estimated quantile can only
    * sit at-or-below the exact one — never above.
    *
    * Everything is integer arithmetic over MD5 hashes: no doubles
    * anywhere in the register or rank path, so a warehouse engine
    * replays the whole sketch bit-for-bit (q57's oracle does).
    *
    * Reference behavior: faust has no sketches; target addition for
    * corpus-scale latency/length percentiles where the exact sort
    * (`percentile`, q29) is the bottleneck. Spark's own
    * `approx_percentile` (q51/q52) is the engine-local twin — KLL-ish
    * and unverifiable outside the JVM, same split as q25 vs q53.
    *
    * Precondition: values must lie in `[0, 2^levels)` (nulls are
    * dropped like every sketch here; out-of-range values would
    * corrupt ranks silently — clamp or bucket first).
    *
    * Scale shape: one narrow scan exploding `levels` composite keys
    * per row into [[cmsRegisters]]' partial-aggregatable groupBy —
    * state and shuffle are depth × width register rows regardless of
    * stream length, and `count` is commutative so update-mode
    * streaming maintenance works unchanged (the q55 streaming twin's
    * contract).
    */
  def dyadicCmsRegisters(df: DataFrame, valueCol: String, levels: Int,
                         depth: Int = 3, width: Int = 128): DataFrame =
    dyadicCmsRegistersBy(df, Seq.empty, valueCol, levels, depth, width)

  /** Grouped twin of [[dyadicCmsRegisters]]: one independent quantile
    * sketch per value of `groupCols` (per-language length quantiles,
    * per-source latency percentiles, …) — the grouped shape the other
    * sketch members have (q54 HLL, q56 CMS). Shuffle bounded by
    * groups × depth × width.
    */
  def dyadicCmsRegistersBy(df: DataFrame, groupCols: Seq[String],
                           valueCol: String, levels: Int,
                           depth: Int = 3, width: Int = 128): DataFrame = {
    require(levels >= 1 && levels <= 62, "levels in [1,62]")
    val gcols = groupCols.map(col)
    val occ = df.where(col(valueCol).isNotNull)
      .select(gcols :+
        explode(dyadicUpdateKeys(col(valueCol).cast(LongType), levels))
          .as("dk"): _*)
    cmsRegistersBy(occ, groupCols, "dk", depth, width)
  }

  /** Census-first register build — the batch fast path: callers
    * pre-aggregate `(valueCol, countCol)` (for a bounded domain that
    * partial agg collapses map-side to ≤ domain rows per partition),
    * and each DISTINCT value is hashed once with its count as the
    * register weight. Bit-identical registers to
    * [[dyadicCmsRegistersBy]] over the raw stream (q57 proves it
    * against the per-occurrence oracle) at domain-many MD5s instead
    * of stream-many — at 100 TB that is the difference between
    * hashing 10^12 occurrences and 10^3 distinct values. The
    * per-occurrence form remains the streaming-update path.
    */
  def dyadicCmsRegistersFromCensus(census: DataFrame, groupCols: Seq[String],
                                   valueCol: String, countCol: String,
                                   levels: Int, depth: Int = 3,
                                   width: Int = 128): DataFrame = {
    require(levels >= 1 && levels <= 62, "levels in [1,62]")
    val gcols = groupCols.map(col)
    val occ = census.where(col(valueCol).isNotNull)
      .select(gcols ++ Seq(col(countCol).as("_n"),
        explode(dyadicUpdateKeys(col(valueCol).cast(LongType), levels))
          .as("dk")): _*)
    cmsRegistersWeightedBy(occ, groupCols, "dk", col("_n"), depth, width)
  }

  /** The `levels` composite `"level:block"` keys a value updates. */
  private def dyadicUpdateKeys(v: Column, levels: Int): Column =
    array((0 until levels).map { l =>
      concat(lit(s"$l:"), shiftrightunsigned(v, l).cast("string"))
    }: _*)

  /** The ≤ `levels` aligned-block keys covering prefix `[0, x)` — one
    * per set bit k of x, at level k with block index `2*(x >> (k+1))`
    * (the textbook dyadic decomposition). Unset bits yield nulls;
    * callers filter.
    */
  private def dyadicPrefixKeys(x: Column, levels: Int): Column =
    array((0 until levels).map { k =>
      when(shiftrightunsigned(x, k).bitwiseAND(lit(1L)) === 1L,
        concat(lit(s"$k:"),
          (shiftrightunsigned(x, k + 1) * 2L).cast("string")))
    }: _*)

  /** Serving half of [[dyadicCmsRegisters]]: fold the register grid
    * into φ-quantile estimates. `total` is a ONE-row `(n bigint)`
    * frame with the exact stream length (an `agg(count)` — kept as a
    * frame so nothing collects to the driver).
    *
    * Output: `(phi, target, q_est)` — `target = ceil(phi·n)` and
    * `q_est` the smallest domain value whose estimated rank reaches
    * it. The candidate scan enumerates all `2^levels` prefix bounds —
    * fine for bucketed domains (levels ≤ ~20, still only millions of
    * 2-column rows ACROSS THE CLUSTER and the decomposition join is
    * against a ≤ depth×width broadcast); for wider domains serve by
    * binary search over prefix probes instead (levels sequential
    * probes, driver-side, against the same registers).
    */
  /** Grouped twin of [[dyadicCmsQuantiles]]: per-group φ-quantiles
    * from per-group register grids. `totals` is a `(groupCols..., n)`
    * frame with each group's exact stream length. Candidate frames
    * are `groups × 2^levels` rows — still tiny per group for bucketed
    * domains; the probe joins stay bounded by groups × depth × width.
    */
  def dyadicCmsQuantilesBy(regs: DataFrame, totals: DataFrame,
                           groupCols: Seq[String], phis: Seq[Double],
                           levels: Int, depth: Int = 3,
                           width: Int = 128): DataFrame = {
    require(levels >= 1 && levels <= 30, "candidate enumeration needs levels <= 30")
    val spark = regs.sparkSession
    val gcols = groupCols.map(col)
    val cand = spark.range(1L, (1L << levels) + 1L).toDF("x")
    val dec = totals.select(gcols: _*).distinct()
      .crossJoin(broadcast(cand))
      .select(gcols ++ Seq(col("x"),
        explode(dyadicPrefixKeys(col("x"), levels)).as("dk")): _*)
      .where(col("dk").isNotNull)
    val est = cmsEstimatesBy(regs,
      dec.select(gcols :+ col("dk"): _*).distinct(), groupCols, "dk",
      depth, width)
    val prefix = dec.join(est, groupCols :+ "dk")
      .groupBy(gcols :+ col("x"): _*).agg(sum("est_n").as("est_rank"))
    import spark.implicits._
    val tgt = phis.toDF("phi").crossJoin(totals)
      .select(gcols ++ Seq(col("phi"),
        ceil(col("phi") * col("n")).as("target")): _*)
    tgt.join(prefix, groupCols)
      .groupBy(gcols ++ Seq(col("phi"), col("target")): _*)
      .agg(min(when(col("est_rank") >= col("target"), col("x") - 1L))
        .as("q_est"))
  }

  def dyadicCmsQuantiles(regs: DataFrame, total: DataFrame,
                         phis: Seq[Double], levels: Int,
                         depth: Int = 3, width: Int = 128): DataFrame = {
    require(levels >= 1 && levels <= 30, "candidate enumeration needs levels <= 30")
    val spark = regs.sparkSession
    val cand = spark.range(1L, (1L << levels) + 1L).toDF("x")
    // prefix [0, x) = one aligned block per set bit k of x, at level k
    // with block index 2*(x >> (k+1)) — the textbook decomposition.
    val dec = cand.select(col("x"), explode(array((0 until levels).map { k =>
        when(shiftrightunsigned(col("x"), k).bitwiseAND(lit(1L)) === 1L,
          concat(lit(s"$k:"),
            (shiftrightunsigned(col("x"), k + 1) * 2L).cast("string")))
      }: _*)).as("dk"))
      .where(col("dk").isNotNull)
    val est = cmsEstimates(regs, dec.select("dk").distinct(), "dk",
      depth, width)
    val prefix = dec.join(est, Seq("dk"))
      .groupBy("x").agg(sum("est_n").as("est_rank"))
    import spark.implicits._
    val tgt = phis.toDF("phi").crossJoin(total)
      .select(col("phi"), ceil(col("phi") * col("n")).as("target"))
    tgt.crossJoin(prefix)
      .groupBy("phi", "target")
      .agg(min(when(col("est_rank") >= col("target"), col("x") - 1L))
        .as("q_est"))
  }
}
