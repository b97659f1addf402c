package graft

/** Blanket plan hygiene over the ENTIRE query surface: properties
  * every registered query (346 at round 18 — the sweep sizes itself
  * from SparkEntry.queries, never a hardcoded count) must satisfy to
  * survive a 100× scale-up. Individual plan shapes are asserted in
  * PlanSpec / LayoutSpec / AsOfJoinSpec; this sweep guards against
  * regressions anywhere in the surface.
  */
class PlanHygieneSpec extends SparkTestBase {

  // one QueryExecution per registered query, shared by every sweep
  // (executedPlan strings for the physical checks, optimizedPlan
  // nodes for the logical ones) — plans each query exactly once
  private lazy val qes: Map[String, org.apache.spark.sql.execution.QueryExecution] =
    SparkEntry.queries.map { case (name, fn) =>
      name -> fn(spark, sf).queryExecution
    }

  // analyzed+optimized (pre-execution) plans: Cartesian products and
  // UDF nodes are visible without running the queries
  private lazy val plans: Map[String, String] =
    qes.map { case (name, qe) => name -> qe.executedPlan.toString }

  test("no low-cardinality Window.partitionBy at raw-data grain") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    // Columns whose corpus cardinality is O(10). A window partitioned
    // ONLY by these serializes each group's ENTIRE stream through one
    // task — parallelism ≡ #groups at 100 TB (round-16 verdict
    // finding 1: the m07/m21 packing cut). The single-partition
    // exchange sweep cannot see this class: the exchange is a hash
    // exchange, the skew is value-level. Exemption: a window whose
    // child subtree contains an Aggregate runs at aggregated grain
    // (one row per group×bucket — PrefixSum pass 2, cohort rollups),
    // bounded by group cardinality rather than raw rows.
    val lowCard = Set("source", "lang", "modality", "event_type",
      "label", "split",
      "l_returnflag", "l_linestatus", "o_orderstatus", "r_name")
    val offenders = qes.toSeq.flatMap { case (name, qe) =>
      qe.optimizedPlan.collect {
        case w: LWindow
            if w.partitionSpec.nonEmpty &&
              w.partitionSpec.forall(_.references.forall(a => lowCard(a.name))) &&
              w.child.collectFirst { case a: Aggregate => a }.isEmpty =>
          s"$name: Window.partitionBy(" +
            w.partitionSpec.map(_.sql).mkString(",") + ")"
      }
    }
    assert(offenders.isEmpty,
      "low-cardinality window partitions serialize each group through " +
        s"one task at scale — use graft.ops.PrefixSum: $offenders")
  }

  test("global-order windows only on bounded rollups (explicit allowlist)") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    // A Window with an EMPTY partitionSpec sorts its ENTIRE input
    // through one task (r17 verdict finding 2: the one unswept
    // single-task class). Mechanical exemption: a window whose child
    // aggregates by the PrefixSum kernel's own `__psum_bucket` column
    // runs over the bucket-subtotal table — bounded at ~#buckets rows
    // by construction (PrefixSum pass 2), never the raw data. Every
    // OTHER global-order window must be allowlisted here with its
    // bound; entity-grain sites (per-user q88, per-customer q120,
    // per-part q121/q86) were migrated to PrefixSum in round 18.
    val allow: Map[String, String] = Map(
      "q19_enumerate" ->
        "documented serving-only faust-parity global index; scale twin q147",
      "q84_growth_daily" ->
        "lag over the per-DAY rollup — rows bounded by calendar days",
      "q95_seasonal_decompose" ->
        "moving average over the gap-filled HOURLY grid — calendar-bounded",
      "m03_embed_search" ->
        "rank AFTER TakeOrderedAndProject limit(20) — k-bounded input",
      "t32_zipf_fit" ->
        "log-log rank over the VOCAB frequency rollup — vocab-bounded",
      "t51_mergeable_topk" ->
        "final rank over merged k-bounded sketch candidates",
      "t52_mg_stream_bounds" ->
        "MG counter vs true-count ranks — k- and vocab-bounded",
      "s29_inbatch_negatives" ->
        "label rank over DISTINCT labels — #classes-bounded",
      "p28_token_waterfill" ->
        "water-level scan over the per-SOURCE census — #sources-bounded")
    // The exemption accepts ONLY a window whose DIRECT input (modulo
    // projections/filters) is the kernel's bucket-subtotal Aggregate —
    // an __psum_bucket Aggregate merely SOMEWHERE below would also
    // match a later entity-grain window layered on top of a kernel
    // result, which is exactly the class this test hunts.
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
    @scala.annotation.tailrec
    def throughProjections(p: LogicalPlan): LogicalPlan = p match {
      case pr: Project => throughProjections(pr.child)
      case f: Filter => throughProjections(f.child)
      case other => other
    }
    def isSubtotalAgg(p: LogicalPlan): Boolean = throughProjections(p) match {
      case a: Aggregate => a.groupingExpressions.exists(
        _.references.exists(_.name == "__psum_bucket"))
      case _ => false
    }
    val found = qes.toSeq.flatMap { case (name, qe) =>
      qe.optimizedPlan.collect {
        case w: LWindow
            if w.partitionSpec.isEmpty && !isSubtotalAgg(w.child) =>
          name -> ("Window.orderBy(" +
            w.orderSpec.map(_.sql).mkString(",") + ")")
      }
    }
    val offenders = found.filterNot { case (n, _) => allow.contains(n) }
      .map { case (n, w) => s"$n: $w" }
    assert(offenders.isEmpty,
      "unpartitioned windows single-task-sort their whole input at " +
        "scale — use graft.ops.PrefixSum or allowlist with a bound: " +
        offenders.mkString("; "))
    // strictness: an allowlist entry whose query no longer plans a
    // global-order window is stale — delete it (keeps the list honest)
    val stale = allow.keySet -- found.map(_._1).toSet
    assert(stale.isEmpty, s"stale allowlist entries (no global-order " +
      s"window planned anymore): $stale")
  }

  test("no query plans a CartesianProduct") {
    val offenders = plans.filter(_._2.contains("CartesianProduct")).keys.toSeq
    assert(offenders.isEmpty,
      s"cartesian products do not survive scale: $offenders")
  }

  test("no query uses a Scala/Python UDF (native expressions only)") {
    val offenders = plans.filter { case (_, p) =>
      p.contains("ScalaUDF") || p.contains("BatchEvalPython") ||
        p.contains("PythonUDF")
    }.keys.toSeq
    assert(offenders.isEmpty, s"UDF found in: $offenders")
  }

  test("single-partition exchanges only where semantics demand them") {
    // q19_enumerate: faust's global running index — documented
    // serving-only semantics parity; the scale paths are
    // enumerateLocal (PlanSpec proves it zero-Exchange) and the
    // round-17 q147 distributed global index (bounded-tail class,
    // allowlisted below with a runtime cap).
    // p04_balance: the final reduce of MIN over per-group counts — the
    // exchange carries one row per GROUP (cardinality = #classes, not
    // #rows), the unavoidable and harmless tail of any global scalar
    // aggregate.
    // t11_unigram_lm: the corpus-total token count — a 1-row global
    // scalar aggregate over the (already shuffled) term counts. The
    // partial sums combine map-side, so the single-partition exchange
    // carries one row per upstream partition, not per term; that tail
    // is identical at sf0.01 and 100 TB.
    // q53_approx_distinct_portable: the HLL register fold — a 1-row
    // global aggregate whose exchange carries at most 2^p=256 register
    // rows (map-side combined), regardless of input size; the sketch's
    // entire point is that this tail is O(m) at any scale.
    // p09_temperature_mixture: the Σ n_g^alpha normalizer — a 1-row
    // global aggregate over the per-GROUP counts (cardinality =
    // #groups, map-side combined), broadcast back; same class as
    // p04's min-over-groups tail.
    // t14_bigram_lm / t16_trigram_lm: the corpus-total token count —
    // identical 1-row global-scalar class as t11's (map-side combined
    // partials). p14_perplexity_split wraps t16's plan, so it carries
    // the same (and only the same) scalar exchange.
    // t20_pmi_collocations: the corpus token total and bigram total —
    // two 1-row global scalar aggregates over already-combined count
    // tables (t14's exact class), broadcast back for the PMI ratio.
    // t19_bm25: the avgdl scalar — sum(dl)/count over doc lengths,
    // map-side combined to one row per partition, broadcast back via
    // the scalar crossJoin idiom. Same class as p09's normalizer.
    // t18_quality_classifier: the final-MSE aggregate — a 1-row
    // global average of per-row squared errors (map-side combined
    // partials; one row per upstream partition crosses the exchange).
    // The per-STEP gradient aggregates are the same class and run at
    // train time, not in this inference plan.
    // q57_dyadic_quantile: the exact stream length N — a 1-row
    // count(*) broadcast back as the rank target (ceil(phi*N)), plus
    // the tiny (2^levels-row) candidate/prefix folds it crosses into.
    // Register maintenance itself is the partial-agg CMS groupBy.
    // t24_source_drift: the corpus token total — t11's exact scalar
    // class, broadcast back into the slice×vocab probability grid.
    // p15_curriculum: q57's scalar N plus the 1-row sorted-cuts array
    // (a phis-sized collect_list), broadcast back as the bucket probe.
    // q63_profile: each per-column leg ends in a 1-row global
    // aggregate (count/min/max partials map-side combined; the exact
    // distinct leg reduces its partial-distinct rows) — the profiler's
    // OUTPUT is one row per column, so the single-partition tail
    // carries per-partition partials, identical at any scale.
    // q66_skew_report: the (total, n_keys) scalar over the per-KEY
    // count table (cardinality = #keys, map-side combined), broadcast
    // back via the scalar crossJoin idiom — p09/t19's exact class;
    // top-k itself is TakeOrderedAndProject, not a global sort.
    // t29_dsir_weights: the (N_raw, N_target) gram totals — a 1-row
    // global scalar over the ≤ numBuckets-row count table (map-side
    // combined), broadcast back into the log-ratio table; t11's exact
    // class.
    //
    // Collect-and-broadcast contracts (not visible in these plans but
    // policed next to them): knnBruteForceKernel and GlobalTable.join
    // carry explicit row guards (default 2^20 / 10^7 rows) that fail
    // fast with a pointer to their scale-path twins (s03/s05 LSH/IVF;
    // shuffle join / Layout bucketing) — guard-trip specs in
    // OpsSpec/ApiSpec.
    // q73_join_size_cms: the est/exact legs each end in a 1-row global
    // aggregate — est folds depth-many inner-product rows (≤ depth·width
    // register pairs upstream, map-side combined), exact reduces the
    // per-key count join; both are O(sketch)/O(partials) tails,
    // identical at any scale, then meet in a 1×1 broadcast crossJoin.
    // t32_zipf_fit: the top-50 cut is TakeOrderedAndProject (k rows per
    // partition); the rank window and the moment aggregate then run on
    // those 50 rows — the single-partition stages carry topN rows by
    // construction, never the vocabulary.
    val allowed = Set("q19_enumerate", "p04_balance", "t11_unigram_lm",
      "q53_approx_distinct_portable", "p09_temperature_mixture",
      "t14_bigram_lm", "t16_trigram_lm", "t18_quality_classifier",
      "t19_bm25", "t20_pmi_collocations", "p14_perplexity_split",
      "q57_dyadic_quantile", "t24_source_drift", "p15_curriculum",
      "q63_profile", "q66_skew_report", "t29_dsir_weights",
      "q73_join_size_cms", "t32_zipf_fit",
      // q81_session_stats: the final 1-row engagement rollup over the
      // (user, session) frame — map-side combined partials, one row per
      // upstream partition crosses; q63's exact class.
      "q81_session_stats",
      // q82_funnel_dropoff: the final 1-row step-count rollup over the
      // per-user funnel frame — q81's exact class.
      "q82_funnel_dropoff",
      // p21_quantile_normalize: p15's exact sketch-cut chain (q57
      // scalar N + the tiny sorted-cuts collect_list) — t34's class.
      "p21_quantile_normalize",
      // t35_target_encode: the global-prior scalar — a 1-row aggregate
      // over the CATEGORY census (cardinality = #categories, map-side
      // combined), broadcast back into the per-row encode; p09/t19's
      // exact normalizer class.
      "t35_target_encode",
      // t34_lift_table: p15's exact sketch-cut chain (q57 scalar N +
      // the tiny sorted-cuts collect_list) plus the per-bucket totals
      // scalar — all ≤ levels·width-row or #buckets-row tails.
      "t34_lift_table",
      // q84_growth_daily: the unpartitioned lag window runs on the
      // ~30-row DAILY rollup (time-range-bounded), never raw events.
      "q84_growth_daily",
      // q85_histogram: the 1-row global min/max scalar plus the final
      // ≤20-bucket ordered output — both O(buckets) tails.
      "q85_histogram",
      // q88_value_concentration: since round 18 the rank+cumsum run
      // through PrefixSum — the exchange carries the bucket-SUBTOTAL
      // table (≤4096 + partials) and 1-row min/max/summary scalars,
      // never the per-user rollup (q147's bounded-tail class).
      "q88_value_concentration",
      // q95_seasonal_decompose: the ±12h moving average runs on the
      // gap-filled HOURLY grid (time-range-bounded rows), never events.
      "q95_seasonal_decompose",
      // q93_dq_checks: each check reduces to a 1-row violation COUNT
      // (map-side-combined partials) before the checks-many union —
      // q63's scalar-tail class.
      "q93_dq_checks",
      // s24_ivf_balance: the 1-row totals aggregate runs over the
      // cells-many (≤ nCells) per-cell counts, then broadcasts back.
      "s24_ivf_balance",
      // q96_rfm_segments: since round 18 the three NTILEs run through
      // PrefixSum.globalNtile — the exchanges carry bucket-SUBTOTAL
      // tables (≤4096 + partials) and 1-row min/max/census scalars,
      // never the per-user rollup (q147's bounded-tail class).
      "q96_rfm_segments",
      // q100_assoc_rules: the basket-count scalar — a 1-row count over
      // the (user, session) distinct frame, broadcast back into the
      // support/lift ratios; p09/t19's normalizer class.
      "q100_assoc_rules",
      // q98_weekday_profile: the 1-row event total over the 168-cell
      // (dow, hod) rollup, broadcast back for the share — q85's class.
      "q98_weekday_profile",
      // q105_gap_spectrum: the 1-row gap total over the ≤ ~40-bucket
      // log2 census, broadcast back for the share — q98's class.
      "q105_gap_spectrum",
      // u10_param_census: the 1-row param total over the params-many
      // census — q98's class.
      "u10_param_census",
      // q106_lag_correlation: the 1-row min/max hour scalar that seeds
      // the gap-filled grid (q95's fixture) plus the 13-row lag list —
      // both calendar/constant-bounded tails.
      "q106_lag_correlation",
      // t46_heaps_curve: the 1-row max-doc scalar that seeds the
      // 8-row checkpoint frame — q106's grid-seed class.
      "t46_heaps_curve",
      // p27_split_psi: q85's 1-row min/max bucket-seed scalar plus the
      // splits-many totals broadcast — both bounded tails.
      "p27_split_psi",
      // q110_window_funnel: the 1-row entrants total over the ≤3-row
      // depth histogram, broadcast back for the share — q98's class.
      "q110_window_funnel",
      // s29_inbatch_negatives: the labels-many distinct label-rank
      // window + the 1-row label count — both label-bounded tails
      // (the per-sample striping itself shuffles on the label key).
      "s29_inbatch_negatives",
      // p29_mixture_eg: one 1-row ordered-fold normalizer per EG round
      // over the sources-many weight rows — coordinator-scale by
      // design after the quality rollup.
      "p29_mixture_eg",
      // p28_token_waterfill: the global sort window + 1-row cutoff run
      // over one-row-per-SOURCE supply rows (groups ≪ corpus); the
      // heavy census partial-aggs upstream.
      "p28_token_waterfill",
      // q112_ab_test: the 2-row arm pivot + 1-row experiment summary —
      // all counting collapses map-side before these tails.
      "q112_ab_test",
      // d37_dual_channel_dedup: the 1-row agreement census over the
      // pair-key overlay (pairs are channel-bounded, counts partial-agg
      // map-side).
      "d37_dual_channel_dedup",
      // q114_dormant_capital: the 1-row mean-balance threshold scalar,
      // broadcast back — q85's min/max-seed class.
      "q114_dormant_capital",
      // q118_cross_sell_pairs: the 1-row order-count scalar for the
      // support/lift denominators, broadcast over the brand-pair
      // rollup — q110's entrants-total class.
      "q118_cross_sell_pairs",
      // s33_cosine_spectrum: the 1-row pair-count total over the
      // ≤20-row bin histogram — q110's share-denominator class.
      "s33_cosine_spectrum",
      // p30_shuffle_quality_audit: the 1-row corpus total seeding the
      // expected per-shard source mix — q85's min/max-seed class.
      "p30_shuffle_quality_audit",
      // t49_char_trigram_lm: the 1-row trigram total normalizing the
      // LM — t11's exact scalar class at character grain.
      "t49_char_trigram_lm",
      // q119_important_brands: the 1-row revenue total + brand count
      // for the pro-rata threshold — q100's normalizer class.
      "q119_important_brands",
      // q120_tier_migration: since round 18 the two NTILEs run through
      // PrefixSum.globalNtile — bucket-subtotal + 1-row scalar tails
      // only (q96's exact class, post-migration).
      "q120_tier_migration",
      // d39_dedup_funnel: three 1-row stage rollups (map-side combined
      // partials) + the raw-total broadcast — q63's scalar-tail class.
      "d39_dedup_funnel",
      // s34_recall_curve: the 1-row query count + the 3-row cutoff
      // frame — both O(ks) tails over the once-ranked matched join.
      "s34_recall_curve",
      // p31_class_weights: the 1-row (N, K, min) scalar over the
      // K-row label census — p04's min-over-groups class.
      "p31_class_weights",
      // q86_topk_ties: since round 18 the dense_rank runs through
      // PrefixSum at DISTINCT-revenue grain — the exchange carries
      // the 1-row min/max bucket seed (q85's class); subtotals and
      // data hash-partition on (brand, bucket).
      "q86_topk_ties",
      // q121_abc_classification: the global cumulative window runs on
      // the per-PART rollup (parts ≪ lineitems) + the 1-row revenue
      // total — q88's concentration-curve class folded to 3 classes.
      "q121_abc_classification",
      // d41/m05 recrawl fixtures: the data-derived twin-id offset
      // (max(doc_id)+1, round-13 seed-audit hardening) is a 1-row
      // global scalar broadcast back into the twin union — q85's
      // min/max-seed class.
      "d41_shingle_minhash_fast", "m05_perceptual_near_dup",
      // q127/q129: 1-row global answers (TPC-H Q14/Q19 shapes) — the
      // final aggregate collapses map-side-combined partials, one row
      // per upstream partition crosses; q63's scalar-tail class.
      "q127_promo_share", "q129_disjunctive_revenue",
      // t51: the merge rank runs on the candidate census (≤ shards×k
      // summary rows, never the token stream) + the 1-row total-tail /
      // challenger scalars — t32's topN-cut class.
      "t51_mergeable_topk",
      // q130: the 1-row grid min/max seed + the 1-row exact-match
      // count — q85's min/max-seed class; chunks roll up in hash
      // exchanges.
      "q130_zorder_skipping",
      // t52: the bound-check report ranks the VOCABULARY census (tiny
      // fixture vocab; the stream itself ran through the memory sink
      // before this plan) + 1-row total-dec / invariant scalars —
      // t51's candidate-census class.
      "t52_mg_stream_bounds",
      // q136: the 1-row (total, n) balance-threshold scalar broadcast
      // back over customers — q114's mean-threshold class.
      "q136_dormant_rich",
      // q138–q140/q142: the file-source round-trip CENSUS — a 1-row
      // global aggregate over the read-back rows (count/sum/min/max/
      // hash-sum partials map-side combined, one row per upstream
      // partition crosses the exchange); q63's scalar-tail class. The
      // round trip's data volume lives in the staged write + the
      // format scan, both fully parallel; q141's per-lang census
      // hash-partitions instead and is not in this list.
      "q138_json_source", "q139_csv_source", "q140_orc_source",
      "q142_xml_source",
      // q144: the same 1-row census class over the schema-evolved lake.
      "q144_schema_evolution",
      // q145/q146: the identical 1-row census class — q145's over the
      // STREAMED lake's batch view (the drain itself ran through the
      // file sink before this plan; its per-batch work is fully
      // parallel), q146's over the zstd parquet round trip.
      "q145_stream_ingest", "q146_zstd_source",
      // q147: the GLOBAL enumerate via PrefixSum — the exchange feeds
      // the exclusive prefix over the bucket-SUBTOTAL table: one
      // map-side-combined row per bucket (≤ rows/4096 + partitions),
      // never the data (which shuffles hash on the bucket cut). This
      // is exactly the bounded tail q19's naive global window lacks.
      "q147_enumerate_distributed")
    val offenders = plans.filter { case (name, p) =>
      !allowed(name) && p.contains("Exchange SinglePartition")
    }.keys.toSeq
    assert(offenders.isEmpty,
      s"unexpected single-partition exchange in: $offenders")
  }

  // ── runtime cardinality gate (round 13): the allowlist above argues
  // each single-partition exchange carries O(groups/sketch/partitions)
  // rows, not data — this test RUNS every allowlisted query and reads
  // the exchange's shuffle-records-written SQLMetric to prove it.
  // Caps are per-query at test scale (sf0.001: events=1000,
  // lineitem=6000, documents=500), set ~2× the measured tail so any
  // change that widens an exchange to carry raw-table rows fails here
  // even though the name is allowlisted. ──────────────────────────────

  import org.apache.spark.sql.DataFrame

  /** Rows written into each SinglePartition shuffle of an EXECUTED
    * frame (AQE stages and reused exchanges unwrapped).
    */
  private def singlePartitionExchangeRows(df: DataFrame): Seq[Long] = {
    import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    df.collect()
    def flatten(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case q: QueryStageExec => flatten(q.plan)
      case other => other.children.flatMap(flatten)
    })
    flatten(df.queryExecution.executedPlan).distinct.collect {
      case e: ShuffleExchangeExec if e.outputPartitioning == SinglePartition =>
        e.metrics.get("shuffleRecordsWritten").orElse(
          e.metrics.get("numOutputRows")).map(_.value).getOrElse(-1L)
    }
  }

  // per-query row cap for the widest single-partition exchange —
  // grounded in the allowlist comment's cardinality class, measured at
  // sf0.001 and set with ~2× headroom (a widened exchange carrying the
  // raw events/lineitem/documents table blows through every cap here)
  private val exchangeRowCaps: Map[String, Long] = Map(
    "q19_enumerate" -> 1200,   // documented serving-only global index:
                               // carries the FILTERED slice (≤ events)
    "p04_balance" -> 64, "t11_unigram_lm" -> 64,
    "q53_approx_distinct_portable" -> 600, // ≤ 2^p=256 registers + partials
    "p09_temperature_mixture" -> 64, "t14_bigram_lm" -> 64,
    "t16_trigram_lm" -> 64, "t18_quality_classifier" -> 64,
    "t19_bm25" -> 64, "t20_pmi_collocations" -> 64,
    "p14_perplexity_split" -> 64,
    "q57_dyadic_quantile" -> 300,  // 2^levels candidate/prefix folds
    "t24_source_drift" -> 64, "p15_curriculum" -> 300,
    "q63_profile" -> 128,          // per-column scalar legs
    "q66_skew_report" -> 64, "t29_dsir_weights" -> 64,
    "q73_join_size_cms" -> 600,    // depth·width register pairs
    "t32_zipf_fit" -> 300,         // top-50 cut × partitions
    "q81_session_stats" -> 64, "q82_funnel_dropoff" -> 64,
    "p21_quantile_normalize" -> 300, "t35_target_encode" -> 64,
    "t34_lift_table" -> 300,
    "q84_growth_daily" -> 128,     // ~30-row daily rollup
    "q85_histogram" -> 128,        // ≤20 buckets + min/max scalar
    "q86_topk_ties" -> 64,             // 1-row min/max bucket seed
    "q88_value_concentration" -> 600,  // bucket subtotals + scalars
    "q95_seasonal_decompose" -> 1500,  // gap-filled hourly grid (~720 h)
    "q93_dq_checks" -> 64, "s24_ivf_balance" -> 64,
    "q96_rfm_segments" -> 600,     // per-customer rollup
    "q100_assoc_rules" -> 64, "q98_weekday_profile" -> 400,  // 168 cells
    "q105_gap_spectrum" -> 128, "u10_param_census" -> 128,
    "q106_lag_correlation" -> 1500,  // gap-filled hourly grid + 13 lags
    "t46_heaps_curve" -> 64, "p27_split_psi" -> 128,
    "q110_window_funnel" -> 64, "s29_inbatch_negatives" -> 128,
    "p29_mixture_eg" -> 64, "p28_token_waterfill" -> 128,
    "q112_ab_test" -> 64, "d37_dual_channel_dedup" -> 64,
    "q114_dormant_capital" -> 64, "q118_cross_sell_pairs" -> 64,
    "s33_cosine_spectrum" -> 128, "p30_shuffle_quality_audit" -> 64,
    "t49_char_trigram_lm" -> 64, "q119_important_brands" -> 64,
    "q120_tier_migration" -> 600,  // per-customer period rollup
    "d39_dedup_funnel" -> 64, "s34_recall_curve" -> 128,
    "p31_class_weights" -> 64,
    "q121_abc_classification" -> 600,  // per-part rollup (parts ≪ lines)
    "d41_shingle_minhash_fast" -> 64,  // 1-row max(doc_id) offset scalar
    "m05_perceptual_near_dup" -> 64,   // 1-row max(doc_id) offset scalar
    "q127_promo_share" -> 64,          // 1-row global answer partials
    "q129_disjunctive_revenue" -> 64,  // 1-row global answer partials
    "t51_mergeable_topk" -> 900,       // candidate census ≤ shards(20)×k(20)
    "q130_zorder_skipping" -> 64,      // 1-row min/max seed + match count
    "t52_mg_stream_bounds" -> 900,     // vocab census + report tails
    "q136_dormant_rich" -> 64,         // 1-row balance-threshold scalar
    // the file-source censuses: 1-row global aggregate, partials
    // map-side combined — one row per upstream scan partition crosses
    "q138_json_source" -> 64, "q139_csv_source" -> 64,
    "q140_orc_source" -> 64, "q142_xml_source" -> 64,
    "q144_schema_evolution" -> 64,
    "q145_stream_ingest" -> 64, "q146_zstd_source" -> 64,
    // bucket-subtotal rows: ≤ buckets(events/4096 ≈ 1 at sf0.001) ×
    // map partitions, map-side combined
    "q147_enumerate_distributed" -> 64)

  test("allowlisted single-partition exchanges carry bounded rows at runtime") {
    val over = exchangeRowCaps.toSeq.sortBy(_._1).flatMap { case (name, cap) =>
      val rows = singlePartitionExchangeRows(SparkEntry.queries(name)(spark, sf))
      val bad = rows.filter(r => r > cap || r < 0)
      if (bad.nonEmpty) Some(s"$name: exchange rows $rows exceed cap $cap")
      else None
    }
    assert(over.isEmpty, over.mkString("\n"))
  }

  test("the cardinality gate actually fires on a widened exchange") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // a global (unpartitioned) window drags the whole lineitem table
    // through one SinglePartition exchange — exactly the regression
    // class the caps exist to catch
    val widened = Tables.lineitem(spark, sf)
      .withColumn("rn", row_number().over(
        Window.orderBy(col("l_orderkey"), col("l_linenumber"))))
      .groupBy(col("l_returnflag")).agg(max(col("rn")).as("m"))
    val rows = singlePartitionExchangeRows(widened)
    assert(rows.exists(_ > 1024),
      s"expected the widened exchange to carry raw lineitem rows, got $rows")
  }
}
