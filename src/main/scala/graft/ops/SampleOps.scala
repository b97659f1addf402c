package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** Deterministic sampling / splitting for training-data pipelines.
  *
  * Everything keys off the portable 60-bit MD5 hash of the row id
  * ([[PortableHash]]), so assignment is: (a) stable under reruns and
  * engine changes (no RNG state, no partition-order dependence),
  * (b) stable under data growth — a row keeps its split/sample fate
  * when other rows are added or removed (the property that keeps
  * train/test splits leak-free across dataset versions), and
  * (c) embarrassingly parallel: a narrow map with no shuffle; the
  * filter pushes down to the scan at any scale.
  */
object SampleOps {

  private val Range60: Double = (1L << 60).toDouble

  /** Uniform unit-interval value in [0, 1) from the row id (salted). */
  def unitHash(id: Column, salt: String = ""): Column =
    PortableHash.mdHash60(concat(lit(salt), lit("#"), id.cast("string")))
      .cast("double") / Range60

  /** Deterministic Bernoulli sample: keep rows whose unit hash falls
    * below `fraction`. No shuffle; survives reruns and appends.
    */
  def sampleByHash(df: DataFrame, idCol: String, fraction: Double,
                   salt: String = ""): DataFrame =
    df.where(unitHash(col(idCol), salt) < fraction)

  /** EXACTLY-k uniform sample — the bottom k rows by salted unit
    * hash: the deterministic distributed analog of reservoir sampling
    * ([[sampleByHash]] gives a fraction, never an exact count). The
    * kept set is simultaneously a KMV sketch of the id population
    * (see [[graft.ops.SketchOps.kmvDistinctEstimate]]). Adds the
    * `sample_uh` hash column.
    *
    * Scale shape: plans as `TakeOrderedAndProject` — each partition
    * forwards only its OWN bottom k rows, no global sort (plan-
    * asserted in SampleOpsSpec). Rerun-stable, and append-stable in
    * the bottom-k sense: a new row enters only by evicting the
    * current k-th, so membership never reshuffles on growth.
    */
  def bottomKSample(df: DataFrame, idCol: String, k: Int,
                    salt: String = ""): DataFrame = {
    require(k >= 1, "k >= 1")
    require(!df.columns.contains("sample_uh"),
      "bottomKSample writes column 'sample_uh'; rename the existing one first")
    df.withColumn("sample_uh", unitHash(col(idCol), salt))
      .orderBy(col("sample_uh"), col(idCol))
      .limit(k)
  }

  /** Deterministic train/validation/test split. `weights` are
    * (label, weight) in assignment order; cumulative weight fractions
    * partition [0, 1). Adds a `split` column.
    */
  def hashSplit(df: DataFrame, idCol: String,
                weights: Seq[(String, Double)],
                salt: String = ""): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0), "positive weights")
    require(!df.columns.contains("split"),
      "hashSplit writes column 'split'; rename the existing one first")
    val total = weights.map(_._2).sum
    val cuts = weights.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }
    val u = unitHash(col(idCol), salt)
    // fold from the last bucket backwards: u < cut_i picks bucket i
    val expr = weights.zip(cuts.tail).reverse
      .foldLeft(lit(weights.last._1)) { case (els, ((label, _), cut)) =>
        when(u < cut, lit(label)).otherwise(els)
      }
    df.withColumn("split", expr)
  }

  /** Stratified EXACT-proportion split: within every stratum, rows are
    * ranked by salted unit hash and the split boundaries are cut at
    * `floor(n_stratum * cumulative_fraction)` — so each stratum lands
    * the target proportions exactly (±1 row), unlike [[hashSplit]]
    * whose per-stratum composition is only proportional in
    * expectation. The price of exactness is one shuffle on the
    * stratum key and the loss of append-stability (adding rows can
    * move the boundary); use [[hashSplit]] when stability across
    * dataset versions matters more than exact counts.
    *
    * Cross-engine determinism note: the cumulative cut fractions are
    * compared via `floor(n * cut)`, so callers wanting oracle parity
    * should pick weights whose cumulative fractions are exactly
    * representable doubles (e.g. 6/1/1 → 0.75, 0.875) — a near-integer
    * `n * cut` under two different roundings of the cut is the one way
    * this op can disagree with a replay.
    */
  def stratifiedExactSplit(df: DataFrame, strataCol: String, idCol: String,
                           weights: Seq[(String, Double)],
                           salt: String = ""): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0), "positive weights")
    require(!df.columns.contains("split"),
      "stratifiedExactSplit writes column 'split'; rename the existing one first")
    val total = weights.map(_._2).sum
    val cum = weights.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }.tail
    val rkCol = "__graft_strat_rk"
    val nCol = "__graft_strat_n"
    // rank via the two-pass distributed prefix (strata are a handful of
    // values — a Window.partitionBy(strataCol) rank would serialize
    // each stratum through one task at scale; PrefixSum scaladoc), and
    // the per-stratum census as a broadcast rollup instead of an
    // unordered whole-group count window
    val ranked = hashRank(df, strataCol, idCol, salt, rkCol)
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as(nCol))
    // fold from the last bucket backwards: rk <= floor(n*cf_i) picks
    // bucket i; cf_last = 1 makes the final branch catch everything
    val assign = weights.zip(cum).reverse
      .foldLeft(lit(weights.last._1)) { case (els, ((label, _), cf)) =>
        when(col(rkCol) <= floor(col(nCol) * lit(cf)), lit(label))
          .otherwise(els)
      }
    // NULL-safe census join: NULL strata form a legitimate stratum
    // (the Window.partitionBy formulation this replaced grouped NULLs
    // together), so a using-column inner join would silently drop
    // them — same reasoning as PrefixSum's offAliased <=> join.
    val kCol = "__graft_strat_key"
    val countsAliased = counts.select(col(strataCol).as(kCol), col(nCol))
    ranked.join(broadcast(countsAliased), col(strataCol) <=> col(kCol))
      .withColumn("split", assign)
      .select(df.columns.map(col) :+ col("split"): _*)
  }

  /** row_number within `groupCol` under the salted (unitHash, id)
    * order, computed via [[PrefixSum.groupedRowNumber]] — the shared
    * rank kernel of every per-group sampling op here. The unit hash is
    * uniform in [0, 1), so `floor(uh · 4096)` is a monotone 4096-way
    * bucket cut and each final sort task sees ~1/4096 of a group
    * regardless of how few groups there are (round-16 verdict
    * finding 1: `Window.partitionBy(lowCardGroup)` ranks serialize
    * each group through one task at 100 TB).
    */
  private def hashRank(df: DataFrame, groupCol: String, idCol: String,
                       salt: String, rkCol: String): DataFrame = {
    val uh = "__graft_rank_uh"
    val withUh = df.withColumn(uh, unitHash(col(idCol), salt))
    PrefixSum.groupedRowNumber(withUh, Seq(groupCol),
        order = Seq(col(uh), col(idCol)),
        bucket = floor(col(uh) * lit(4096.0)).cast("long"),
        out = rkCol)
      .drop(uh)
  }

  /** Epoch-budget planning table — the data-constrained-scaling
    * allocation step (Muennighoff et al. 2023, arXiv:2305.16264:
    * repeating data beyond ~4 epochs stops helping): given per-group
    * token inventories, target mixture `weights` (normalized here),
    * and a total token `budget`, compute each group's wanted tokens,
    * the epoch count after the `maxEpochs` repetition cap, tokens
    * actually usable, and the unfillable deficit. Pure scalar math on
    * the per-group rollup (one partial-agg shuffle, groups-many rows);
    * every float op is a fixed-order IEEE expression, 6-dp snapped.
    */
  def epochBudgetPlan(df: DataFrame, groupCol: String, tokensCol: Column,
                      weights: Seq[(String, Double)], budget: Double,
                      maxEpochs: Double): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0), "positive weights")
    val wTotal = weights.map(_._2).sum
    val wExpr = weights.foldRight(lit(0.0)) { case ((g, w), els) =>
      when(col(groupCol) === g, lit(w / wTotal)).otherwise(els)
    }
    val per = df.groupBy(groupCol)
      .agg(sum(tokensCol).cast("double").as("n_tokens"))
    val want = lit(budget) * wExpr
    val epochs = least(want / col("n_tokens"), lit(maxEpochs))
    val usable = least(want, col("n_tokens") * lit(maxEpochs))
    per.select(col(groupCol), col("n_tokens"),
      round(wExpr, 6).as("target_weight"),
      round(want, 6).as("tokens_wanted"),
      round(epochs, 6).as("epochs"),
      round(usable, 6).as("tokens_usable"),
      round(want - usable, 6).as("deficit"))
  }

  /** Materialize an [[epochBudgetPlan]] into actual training rows:
    * each doc emits `floor(epochs)` full copies (copy_idx 0..⌊e⌋−1)
    * plus one fractional copy kept when the salted unit hash falls
    * below `e − ⌊e⌋` — so every group's expected row volume equals
    * its planned epoch count exactly, deterministically, and append-
    * stably (a doc's copy set never changes as other docs arrive).
    * The plan is a groups-many broadcast; the explode is narrow.
    */
  def materializeEpochPlan(df: DataFrame, groupCol: String, idCol: String,
                           tokensCol: Column, weights: Seq[(String, Double)],
                           budget: Double, maxEpochs: Double,
                           salt: String = ""): DataFrame = {
    val plan = epochBudgetPlan(df, groupCol, tokensCol, weights, budget,
      maxEpochs).select(col(groupCol), col("epochs"))
    val joined = df.join(broadcast(plan), Seq(groupCol))
    val full = floor(col("epochs")).cast("int")
    val frac = col("epochs") - floor(col("epochs"))
    val copies = when(full >= 1, sequence(lit(0), full - 1))
      .otherwise(array().cast("array<int>"))
    val fullRows = joined
      .select(col(idCol), col(groupCol), explode(copies).as("copy_idx"))
    val fracRows = joined
      .where(unitHash(col(idCol), salt) < frac)
      .select(col(idCol), col(groupCol), full.as("copy_idx"))
    fullRows.unionByName(fracRows)
  }

  /** Deterministic k-fold assignment: `fold = pmod(xxhash64(id), k)`
    * — the cross-validation / sharded-eval split. Same contract
    * family as [[hashSplit]]: zero-shuffle narrow projection,
    * rerun-stable, append-stable (a row's fold never changes as the
    * corpus grows), and leave-one-fold-out composes as a plain
    * filter. Uses the engine xxhash64 directly (no string round-trip)
    * — the oracle recomputes the signed long-key XXH64 in SQL.
    */
  def kFold(df: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k > 1, "k must be at least 2")
    require(!df.columns.contains("fold"),
      "kFold writes column 'fold'; rename the existing one first")
    df.withColumn("fold", pmod(xxhash64(col(idCol)), lit(k)))
  }

  /** Deterministic per-group sample of up to `n` rows: the n smallest
    * id hashes within each group — a shuffle-once, rerun-stable
    * stand-in for per-group reservoir sampling.
    */
  def samplePerGroup(df: DataFrame, groupCol: String, idCol: String,
                     n: Int, salt: String = ""): DataFrame = {
    val rk = "__graft_sample_rk" // internal; collision-proof (cf. shuffleShards)
    hashRank(df, groupCol, idCol, salt, rk)
      .where(col(rk) <= n)
      .drop(rk)
  }

  /** Training-mixture sampling: keep a per-group hash fraction so the
    * output composition matches the target `weights` (the corpus-mixing
    * step of training-set construction). Groups not listed keep
    * `defaultFraction`. Pure narrow filter — zero shuffles, and the
    * same append-stability as [[sampleByHash]]: a document's fate
    * never changes as the corpus grows or weights of OTHER groups
    * move.
    */
  def mixtureSample(df: DataFrame, groupCol: String, idCol: String,
                    weights: Seq[(String, Double)],
                    defaultFraction: Double = 0.0,
                    salt: String = ""): DataFrame = {
    val frac = weights.foldLeft(lit(defaultFraction)) {
      case (els, (g, w)) => when(col(groupCol) === g, lit(w)).otherwise(els)
    }
    df.where(unitHash(col(idCol), salt) < frac)
  }

  /** Importance (quality-weighted) sampling: each row's keep
    * probability is its own weight (scaled, clamped to [0, 1]) — the
    * DCLM-style move from hard quality thresholds to sampling
    * proportional to a quality signal, so borderline documents
    * survive at reduced rate instead of cliff-dropping. Same
    * zero-shuffle, rerun-stable hash predicate as [[sampleByHash]];
    * the weight is any Column, so the scorer fuses into the same
    * narrow projection.
    */
  def weightedSampleByHash(df: DataFrame, idCol: String, weight: Column,
                           scale: Double = 1.0, salt: String = ""): DataFrame = {
    // nanvl first: Spark orders NaN ABOVE every double, so NaN would
    // sail through both clamp orders as keep-probability 1.0 — a
    // corrupt score (0.0/0.0 ratios etc.) must drop the row, not
    // guarantee it. A null weight yields a null predicate → dropped.
    val p = nanvl(weight.cast("double") * scale, lit(0.0))
    df.where(unitHash(col(idCol), salt) < least(greatest(p, lit(0.0)), lit(1.0)))
  }

  /** Temperature-flattened mixture sampling — the multilingual /
    * multi-source rebalancing step (mBERT/XLM-R/T5 style): group g
    * with n_g rows is sampled with probability ∝ n_g^alpha, so
    * alpha=1 preserves the natural distribution, alpha→0 approaches
    * uniform-over-groups, and low-resource groups are upweighted in
    * between. Given a row `totalBudget`, the per-group keep fraction
    * is min(1, budget·p_g/n_g) with p_g = n_g^alpha / Σ n_h^alpha —
    * a group whose temperature share exceeds its size keeps
    * everything (no replication-upsampling here; that's a separate
    * explode).
    *
    * Scale shape: one tiny agg (cardinality = #groups), fractions
    * broadcast back, then the same narrow hash filter as
    * [[mixtureSample]]. The corpus itself never shuffles. Row fate is
    * rerun-stable (pure function of id, salt, and the group counts) —
    * but unlike the fixed-fraction samplers, fractions recompute as
    * the corpus grows, so re-snapshot before each training mix.
    */
  def temperatureMixture(df: DataFrame, groupCol: String, idCol: String,
                         alpha: Double, totalBudget: Long,
                         salt: String = ""): DataFrame = {
    require(alpha >= 0.0, "alpha must be non-negative")
    require(totalBudget > 0, "totalBudget must be positive")
    val nc = "__graft_temp_n" // internals; collision-proof names
    val zc = "__graft_temp_z"
    val kc = "__graft_temp_kf"
    val gc = "__graft_temp_g"
    // Oracle-parity note (accepted measure-zero risk): the normalizer
    // sums pow(n_g, alpha) in DOUBLE — pow is not correctly rounded
    // and the sum is order-dependent, so exactness vs DuckDB relies on
    // Java's Math.pow and libm agreeing to the last ulp on these
    // inputs (they do for the corpus's small-integer counts). A ulp
    // difference in the derived fraction only flips a row whose unit
    // hash lands inside that 2^-52-wide gap. If it ever flakes, snap
    // the fraction to fixed precision (e.g. round(kf, 12)) on BOTH
    // engines — same hazard class SketchOps sidesteps for HLL.
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as(nc))
    val z = counts.agg(sum(pow(col(nc), alpha)).as(zc))
    val fracs = counts.crossJoin(broadcast(z))
      .select(col(groupCol).as(gc),
        least(lit(1.0),
          lit(totalBudget.toDouble) * pow(col(nc), alpha) / col(zc) / col(nc))
          .as(kc))
    // null-SAFE join: groupBy counts a null group (it participates in
    // the Σ n_g^alpha normalizer), so an equi-join would silently drop
    // its rows while still charging its budget share — null-group rows
    // must sample at their fraction like everyone else (mixtureSample,
    // the fixed-fraction sibling, keeps them too)
    df.join(broadcast(fracs), df(groupCol) <=> fracs(gc))
      .where(unitHash(col(idCol), salt) < col(kc))
      .select(df.columns.map(df(_)).toIndexedSeq: _*)
  }

  /** Balanced downsampling: cap every group at the size of its
    * smallest peer (or an explicit `targetPerGroup`), choosing
    * survivors by id-hash order — the class-rebalancing step before
    * training on skewed category distributions.
    *
    * Scale shape: one window shuffle on the group key. With an
    * explicit target the literal rank filter lowers to
    * `WindowGroupLimit` (per-partition top-n pruning before the
    * shuffle); the derived-minimum variant joins a broadcast 1-row
    * minimum instead — lazy, no driver action, at the cost of that
    * pruning.
    */
  def balancePerGroup(df: DataFrame, groupCol: String, idCol: String,
                      targetPerGroup: Option[Long] = None,
                      salt: String = ""): DataFrame = {
    val rk = "__graft_balance_rk" // internals; collision-proof names
    val mc = "__graft_balance_min"
    val ranked = hashRank(df, groupCol, idCol, salt, rk)
    targetPerGroup match {
      case Some(n) => ranked.where(col(rk) <= n).drop(rk)
      case None =>
        val m = df.groupBy(col(groupCol)).agg(count(lit(1)).as(rk))
          .agg(min(col(rk)).as(mc))
        ranked.crossJoin(broadcast(m))
          .where(col(rk) <= col(mc)).drop(rk, mc)
    }
  }

  /** Deterministic global training-order shuffle, realized the way
    * shuffled training shards are actually written at scale: a
    * pseudorandom 60-bit key from the row id assigns each row to one
    * of `nShards` shards (`shard`) and orders it within the shard
    * (`pos`) — reading shards round-robin replays a uniform global
    * permutation without any global sort. One window shuffle on the
    * shard key; shards are hash-balanced and each sorts independently
    * on its executor, so 1000 shards shuffle a 100 TB corpus with no
    * single-partition stage. Rerun-stable: no RNG state, the
    * permutation is a pure function of (id, salt).
    */
  def shuffleShards(df: DataFrame, idCol: String, nShards: Int,
                    salt: String = ""): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    // `shard`/`pos` are the operator's OUTPUT contract (like `split`
    // in hashSplit); refuse to silently clobber caller data under
    // those names. The hash key is internal — give it a
    // collision-proof temp name instead of `_h`.
    Seq("shard", "pos").foreach { c =>
      require(!df.columns.contains(c),
        s"shuffleShards writes column '$c'; rename the existing one first")
    }
    val hc = "__graft_shuffle_h"
    val h = PortableHash.mdHash60(
      concat(lit(salt), lit("#"), col(idCol).cast("string")))
    // pos via the PrefixSum kernel rather than a per-shard window
    // sort: nShards is a parameter, so a bare partitionBy(shard) rank
    // sorts N/nShards rows per task — fine when nShards is sized to
    // the corpus, a 100 GB single-task spill sort when it isn't. The
    // hash is uniform in [0, 2^60), so its top 12 bits are a monotone
    // 4096-way bucket cut and per-task sorts stay bounded REGARDLESS
    // of the nShards choice.
    val withShard = df.withColumn(hc, h)
      .withColumn("shard", pmod(col(hc), lit(nShards.toLong)).cast("int"))
    PrefixSum.groupedRowNumber(withShard, Seq("shard"),
        order = Seq(col(hc), col(idCol)),
        bucket = floor(col(hc) / lit(1L << 48)).cast("long"), out = "pos")
      .withColumn("pos", col("pos").cast("int"))
      .drop(hc)
  }

  /** Token-budget mixture sampling — [[mixtureSample]] with the
    * recipe written the way data mixes actually are: a TOKEN budget
    * per group, not a doc fraction. Keep probability per group is
    * `min(1, budget_g / total_tokens_g)` (derived from one bounded
    * per-group partial agg, broadcast back), so each group's kept
    * token mass lands on its budget in expectation regardless of the
    * groups' wildly different doc lengths and sizes. Groups without a
    * budget drop entirely (null fraction → null predicate), which is
    * the recipe semantics: unlisted sources are out of the mix.
    *
    * Same zero-shuffle hash predicate as every sampler here —
    * rerun/append-stable, composable downstream of dedup/quality.
    */
  def tokenBudgetMixture(df: DataFrame, groupCol: String, idCol: String,
                         tokenCol: Column, budgets: Seq[(String, Long)],
                         salt: String = ""): DataFrame = {
    require(budgets.nonEmpty, "at least one group budget")
    val tc = "__graft_tbm_tot"
    val totals = df.groupBy(groupCol)
      .agg(sum(tokenCol.cast("long")).as(tc))
    val budget = budgets.foldLeft(lit(null).cast("long")) {
      case (els, (g, b)) => when(col(groupCol) === g, lit(b)).otherwise(els)
    }
    // the isNotNull guard is load-bearing: least() IGNORES nulls (both
    // engines), so least(1.0, null/tot) would silently read as keep
    // fraction 1.0 and unlisted groups would sail through whole
    val kf = when(budget.isNotNull,
      least(lit(1.0), budget.cast("double") / col(tc).cast("double")))
    df.join(broadcast(totals), Seq(groupCol))
      .where(unitHash(col(idCol), salt) < kf)
      .drop(tc)
  }

  /** Curriculum-ordered shard assignment — [[shuffleShards]]' training-
    * order upgrade: docs are first bucketed by an integer difficulty/
    * quality score against φ-quantile CUTS, then hash-shuffled into
    * `(shard, pos)` WITHIN each bucket. A trainer reading buckets in
    * order (shards within a bucket in parallel) gets the curriculum —
    * easy/high-quality first, hard/noisy last — without any global
    * sort: the cuts come from the portable dyadic-CMS quantile sketch
    * (q57's census-first build, one bounded partial agg + a tiny
    * broadcast), the bucket id is a broadcast array probe, and the
    * only window runs per (bucket, shard) like p08's.
    *
    * `scoreCol` must be integer-valued in `[0, 2^levels)` (floor a
    * float score onto a fixed grid first — floor, not round: rounding
    * half-cases are the one float op engines disagree on).
    * `phis.size + 1` buckets come out; bucket k = score above exactly
    * k of the cuts.
    */
  def curriculumShards(df: DataFrame, idCol: String, scoreCol: Column,
                       nShards: Int, phis: Seq[Double] = Seq(0.25, 0.5, 0.75),
                       levels: Int = 10, depth: Int = 3, width: Int = 512,
                       salt: String = ""): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    Seq("bucket", "shard", "pos").foreach { c =>
      require(!df.columns.contains(c),
        s"curriculumShards writes column '$c'; rename the existing one first")
    }
    val sc = "__graft_curr_score"
    val hc = "__graft_curr_h"
    val base = df.withColumn(sc, scoreCol.cast("long"))
    val census = base.groupBy(col(sc).as("v")).agg(count(lit(1)).as("cnt"))
    val regs = SketchOps.dyadicCmsRegistersFromCensus(census, Seq.empty,
      "v", "cnt", levels, depth, width)
    val total = census.agg(sum("cnt").as("n"))
    val cuts = SketchOps.dyadicCmsQuantiles(regs, total, phis, levels,
        depth, width)
      .agg(sort_array(collect_list(col("q_est"))).as("_cuts"))
    val h = PortableHash.mdHash60(
      concat(lit(salt), lit("#"), col(idCol).cast("string")))
    // pos via the PrefixSum kernel (see shuffleShards): per-task sorts
    // bounded by the hash-bucket cut, not by the nShards choice
    val assigned = base.crossJoin(broadcast(cuts))
      .withColumn("bucket",
        size(filter(col("_cuts"), c => col(sc) > c)).cast("int"))
      .withColumn(hc, h)
      .withColumn("shard", pmod(col(hc), lit(nShards.toLong)).cast("int"))
    PrefixSum.groupedRowNumber(assigned, Seq("bucket", "shard"),
        order = Seq(col(hc), col(idCol)),
        bucket = floor(col(hc) / lit(1L << 48)).cast("long"), out = "pos")
      .withColumn("pos", col("pos").cast("int"))
      .drop(hc, "_cuts", sc)
  }

  /** Shard-local sequence packing: assign documents to ~`budget`-token
    * bins by running token count within each group (the batch
    * construction step before training). A document lands in the bin
    * its PRECEDING cumulative count falls into, so bins fill to at
    * least `budget` and overflow by at most one document — the
    * standard streaming-packing approximation. One window shuffle on
    * the group key; packing never crosses shards, so 1000 executors
    * pack 1000 shards independently.
    */
  def packByBudget(df: DataFrame, groupCol: String, idCol: String,
                   tokenCol: Column, budget: Long,
                   bucket: Option[Column] = None): DataFrame = {
    // `bin_id` is the output contract — refuse to clobber caller data.
    // (`n_tokens` is also emitted but mirrors the caller's tokenCol,
    // so a pre-existing `n_tokens` column is the NORMAL input shape —
    // it is overwritten by its own value, never corrupted.)
    require(!df.columns.contains("bin_id"),
      "packByBudget writes column 'bin_id'; rename the existing one first")
    val nc = "__graft_pack_n" // internals; collision-proof names
    val cc = "__graft_pack_cum"
    // The running sum goes through PrefixSum's two-pass decomposition
    // (ROWS frame inside) — a Window.partitionBy(groupCol) cumsum
    // serializes each group at scale. The bucket cut must be monotone
    // in idCol within every group: derived from the id's type here
    // (integer division for numeric ids; an 8-char prefix for string
    // ids, monotone under binary collation but only as fine as the
    // ids' shared-prefix structure allows), or caller-supplied when
    // the id distribution needs a better cut.
    import org.apache.spark.sql.types._
    val bkt = bucket.getOrElse(df.schema(idCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        floor(col(idCol).cast("long") / lit(4096L)).cast("long")
      case StringType => substring(col(idCol), 1, 8)
      case _ => lit(0L)
    })
    PrefixSum.groupedRunningSum(
        df.withColumn(nc, tokenCol.cast("long")),
        group = Seq(groupCol), order = Seq(col(idCol)),
        bucket = bkt, value = col(nc), out = cc)
      .withColumn("bin_id", floor((col(cc) - col(nc)) / budget).cast("long"))
      .withColumn("n_tokens", col(nc))
      .drop(nc, cc)
  }

  /** Quantile normalization — map an integer-valued score onto its
    * approximate quantile rank (bucket/nBuckets ∈ [0, 1)): the
    * rank/quantile feature transform ML preprocessing wants, WITHOUT
    * a global sort — cut points come from the portable dyadic-CMS
    * sketch over the score census ([[curriculumShards]]' machinery at
    * feature grain) and broadcast back as an array probe.
    *
    * `scoreCol` must be integer-valued in `[0, 2^levels)`. Output
    * adds `q_norm` = (number of cuts strictly below the score) /
    * nBuckets — approximate in sketch rank, deterministic and
    * engine-replayable.
    */
  def quantileNormalize(df: DataFrame, scoreCol: Column, nBuckets: Int,
                        levels: Int = 10, depth: Int = 3,
                        width: Int = 512): DataFrame = {
    require(nBuckets >= 2, "need at least 2 buckets")
    require(!df.columns.contains("q_norm"),
      "quantileNormalize writes column 'q_norm'; rename the existing one")
    val phis = (1 until nBuckets).map(_.toDouble / nBuckets)
    val sc = "__graft_qn_s"
    val base = df.withColumn(sc, scoreCol.cast("long"))
    val census = base.groupBy(col(sc).as("v")).agg(count(lit(1)).as("cnt"))
    val regs = SketchOps.dyadicCmsRegistersFromCensus(census, Seq.empty,
      "v", "cnt", levels, depth, width)
    val total = census.agg(sum("cnt").as("n"))
    val cuts = SketchOps.dyadicCmsQuantiles(regs, total, phis, levels,
        depth, width)
      .agg(sort_array(collect_list(col("q_est"))).as("_cuts"))
    base.crossJoin(broadcast(cuts))
      .withColumn("q_norm",
        size(filter(col("_cuts"), c => col(sc) > c)).cast("double")
          / nBuckets)
      .drop("_cuts", sc)
  }

  /** Quota sampling — exact-k per group with PER-GROUP targets (the
    * balanced-eval-set constructor): group g keeps its `quotas(g)`
    * lowest-hash rows (`defaultQuota` when unlisted), ranked by the
    * salted unit hash then id — [[samplePerGroup]]'s determinism and
    * append-stability (in the bottom-k sense) with a target map
    * instead of one global n. One window shuffle on the group key;
    * `WindowGroupLimit` prunes per partition when targets are small.
    */
  def quotaSample(df: DataFrame, groupCol: String, idCol: String,
                  quotas: Map[String, Int], defaultQuota: Int,
                  salt: String = ""): DataFrame = {
    require(defaultQuota >= 0, "defaultQuota must be >= 0")
    require(quotas.values.forall(_ >= 0), "quotas must be >= 0")
    val rk = "__graft_quota_rk"
    val target = quotas.foldLeft(lit(defaultQuota)) { case (acc, (g, n)) =>
      when(col(groupCol) === g, lit(n)).otherwise(acc)
    }
    hashRank(df, groupCol, idCol, salt, rk)
      .where(col(rk) <= target)
      .drop(rk)
  }

  /** Differentially-private count release (ε-DP Laplace mechanism)
    * over a group column — the privacy-budgeted shape for publishing
    * corpus composition stats (per-source/language doc counts in a
    * datasheet) without exposing exact membership: each released
    * count is n + Lap(1/ε).
    *
    * The Laplace draw is DERIVED from the salted group-key hash via
    * the inverse CDF (x = −(1/ε)·sign(u−½)·ln(1−2|u−½|)), so the
    * release is deterministic, rerun-stable, and engine-replayable —
    * the properties every other SampleOps contract has. That makes
    * the noise PSEUDO-random per (key, salt): rotate the salt per
    * release and never re-release under two salts (classic DP budget
    * accounting still applies per release).
    *
    * `n_true` is emitted for the oracle/audit tier ONLY — a real
    * release drops it. Zero extra shuffles beyond the count census;
    * the noise is a narrow projection on groups-many rows.
    */
  def dpNoisedCounts(df: DataFrame, groupCol: String, epsilon: Double,
                     salt: String = ""): DataFrame = {
    require(epsilon > 0, "epsilon must be positive")
    val u = unitHash(col(groupCol), salt)
    // 1 − 2|u−½| ∈ (0, 1]; the 1e-12 floor guards the measure-zero
    // u=0 endpoint from ln(0) without changing any realizable draw
    val noise = round(lit(-1.0 / epsilon) * signum(u - 0.5) *
      log(greatest(lit(1e-12), lit(1.0) - lit(2.0) * abs(u - 0.5))), 6)
    df.groupBy(groupCol).agg(count(lit(1)).as("n_true"))
      .withColumn("n_released", col("n_true") + noise)
  }

  /** Duplicate frequency capping (the SlimPajama / falcon-refinedweb
    * recipe): instead of dropping ALL copies past the first (d01's
    * exact dedup), keep up to `cap` copies of each distinct content
    * key — the knob that preserves natural duplication signal (boiler-
    * plate that SHOULD appear a few times) while bounding the
    * memorization risk of heavy duplicates. Copies are ranked by
    * `idCol` so the kept set is deterministic and append-stable for
    * existing rows (a new copy can only ever rank LAST among equals).
    *
    * Output: input columns + `content_key`, `copy_rank` (1-based) and
    * `kept` (rank ≤ cap). Callers filter on `kept`; emitting the flag
    * instead of filtering keeps the audit trail queryable.
    *
    * Scale shape: ONE hash shuffle on the content key; the window
    * walks each duplicate group (size = multiplicity, naturally
    * small — a pathological mega-duplicate group is exactly the row
    * set the cap discards, and rank-k-of-many still streams through
    * the window operator without materializing the group).
    */
  def frequencyCap(df: DataFrame, contentKey: Column, idCol: String,
                   cap: Int): DataFrame = {
    require(cap > 0, "cap must be positive")
    require(!df.columns.contains("content_key") &&
      !df.columns.contains("copy_rank") && !df.columns.contains("kept"),
      "frequencyCap writes content_key/copy_rank/kept; rename existing ones")
    val w = Window.partitionBy(col("content_key")).orderBy(col(idCol))
    df.withColumn("content_key", contentKey)
      .withColumn("copy_rank", row_number().over(w).cast("long"))
      .withColumn("kept", col("copy_rank") <= cap)
  }

  /** Perplexity-filtered split — the CCNet-shaped composition a
    * pretraining corpus actually runs: score every doc under the
    * corpus's own trigram LM ([[TextOps.trigramLmScore]]), drop docs
    * whose cross-entropy exceeds `maxCrossEntropy` (unpredictable
    * text ≈ noise under the n-gram proxy), then assign the survivors
    * a leak-stable [[hashSplit]]. The threshold compares the 6-dp
    * snapped score, so the kept SET is engine-exact, and split
    * assignment is a pure id-hash — rerun/append-stable like every
    * SampleOps contract. Output: (doc_id, cross_entropy, split).
    *
    * Scale shape: inherits t16's joins (trigram table shuffle-joined
    * on token keys, unigram/bigram legs broadcast); the filter and
    * split are zero-shuffle projections on top.
    */
  def perplexitySplit(df: DataFrame, idCol: String, textCol: String,
                      maxCrossEntropy: Double,
                      weights: Seq[(String, Double)],
                      salt: String = ""): DataFrame = {
    val scored = TextOps.trigramLmScore(df, idCol, textCol)
      .withColumnRenamed("id", "doc_id")
      .where(col("cross_entropy") <= maxCrossEntropy)
    hashSplit(scored, "doc_id", weights, salt)
      .select("doc_id", "cross_entropy", "split")
  }

  /** Label-striped training batches — the in-batch-negatives
    * construction a two-tower/contrastive trainer wants: samples land
    * in batches so that same-label samples are spread as far apart as
    * possible (a batch mixes labels ⇒ every other sample in the batch
    * is a usable negative). The stripe key is pure arithmetic:
    * `(rank_within_label − 1) · n_labels + label_rank`, batched by
    * integer division — NO global sort, NO single-partition window,
    * and (round 17) no per-label window either: the within-label rank
    * runs through the PrefixSum kernel, so the construction
    * distributes at any corpus size. Uneven label counts
    * leave gaps in the stripe ⇒ some batches run short (deterministic;
    * audit with a batch-size rollup).
    */
  def stripedBatches(df: DataFrame, idCol: String, labelCol: String,
                     batchSize: Int): DataFrame = {
    require(batchSize >= 2, "batchSize must be >= 2")
    val lr = df.select(col(labelCol).as("__lbl")).distinct()
      .withColumn("__lrank",
        row_number().over(Window.orderBy(col("__lbl"))))
    val nl = lr.agg(count(lit(1)).as("__nl"))
    // the within-label rank runs through PrefixSum — labels are the
    // definitional low-cardinality column (a handful of classes), so
    // a bare partitionBy(labelCol) rank would serialize each class's
    // whole stream through one task (round-17 kernel; the bucket cut
    // follows the id's type, as in packByBudget)
    import org.apache.spark.sql.types._
    val bkt = df.schema(idCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        floor(col(idCol).cast("long") / lit(4096L)).cast("long")
      case StringType => substring(col(idCol), 1, 8)
      case _ => lit(0L)
    }
    PrefixSum.groupedRowNumber(df, Seq(labelCol),
        order = Seq(col(idCol)), bucket = bkt, out = "__rn")
      .join(broadcast(lr), col(labelCol) === col("__lbl"))
      .crossJoin(broadcast(nl))
      .withColumn("__stripe",
        (col("__rn") - 1).cast("long") * col("__nl") + col("__lrank"))
      .withColumn("batch_id",
        expr(s"CAST((__stripe - 1) DIV $batchSize AS BIGINT)"))
      .withColumn("slot",
        expr(s"CAST((__stripe - 1) % $batchSize AS INT)"))
      .drop("__lbl", "__lrank", "__nl", "__rn", "__stripe")
  }

  /** Water-filling quota allocation: split a global token budget
    * (`budgetPct`% of total supply) across groups so every group gets
    * min(its supply, a common water level λ) — small groups keep
    * everything, big groups are capped at the level that exactly
    * exhausts the budget. The fair-cap mixture rule (max-min fairness;
    * the same allocator as network rate fairness, RFC 2914 lineage)
    * a corpus mixture uses to stop one mega-source drowning the rest.
    *
    * No iteration: sort groups by supply ascending, and the cutoff k*
    * is the largest prefix where prefix(k) + (n−k)·s_k still fits the
    * budget; λ = (B − prefix(k*)) / (n − k*). All integer arithmetic
    * until the single final division.
    *
    * Scale shape: input is one row per GROUP (domains/sources — small
    * by construction at any corpus size), so the global sort window is
    * a coordinator-scale step over already-aggregated rows; the heavy
    * work (per-group supply) happens upstream in a partial agg.
    */
  def waterfillQuota(supply: DataFrame, groupCol: String,
                     supplyCol: String, budgetPct: Int): DataFrame = {
    require(budgetPct >= 1 && budgetPct <= 100, "budgetPct in 1..100")
    val tot = supply.agg(sum(col(supplyCol)).as("__total"),
      count(lit(1)).as("__n"))
    val w = Window.orderBy(col(supplyCol), col(groupCol))
    val ranked = supply.crossJoin(broadcast(tot))
      .withColumn("__b",
        expr(s"CAST(__total * $budgetPct DIV 100 AS BIGINT)"))
      .withColumn("__k", row_number().over(w))
      .withColumn("__prefix", sum(col(supplyCol))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__feasible",
        col("__prefix") + (col("__n") - col("__k")) * col(supplyCol)
          <= col("__b"))
    // argmax-by-k over the feasible prefix: (k*, prefix(k*)) — struct
    // max is order-independent, k is unique
    val cut = ranked.agg(
      max(when(col("__feasible"), struct(col("__k"), col("__prefix"))))
        .as("__cut"))
      .select(coalesce(col("__cut.__k"), lit(0L)).as("__kstar"),
        coalesce(col("__cut.__prefix"), lit(0L)).as("__pstar"))
    ranked.crossJoin(broadcast(cut))
      // CaseWhen short-circuits, so the division never runs in the
      // k*=n (everyone fully funded) branch — ANSI mode would throw
      // DIVIDE_BY_ZERO on the unguarded expression
      .withColumn("__level",
        when(col("__kstar") === col("__n"), lit(null).cast("double"))
          .otherwise((col("__b") - col("__pstar")).cast("double")
            / (col("__n") - col("__kstar")).cast("double")))
      .select(col(groupCol), col(supplyCol).as("supply"),
        when(col("__kstar") === col("__n"),
            col(supplyCol).cast("double"))
          .otherwise(round(least(col(supplyCol).cast("double"),
            col("__level")), 6)).as("allocation"),
        (col("__k") > col("__kstar")
          && col("__kstar") =!= col("__n")).as("capped"),
        round(col("__level"), 6).as("level"))
  }
}
