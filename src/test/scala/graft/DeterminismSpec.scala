package graft

import org.apache.spark.sql.DataFrame

/** Results must be invariant to parallelism: partition count changes
  * the execution (shuffle fan-out, partial-agg grouping, row order)
  * but must never change the result multiset — the property that lets
  * the same code run on local[4] and a 1000-executor cluster.
  *
  * Exact decimals + window tie-breakers are what make this hold; a
  * double-summing or tie-unstable operator would fail here.
  */
class DeterminismSpec extends SparkSpec {

  private def canon(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    df.select(cols.head, cols.tail: _*).collect()
      .map(_.mkString("|")).sorted.toSeq
  }

  private def invariant(name: String): Unit = {
    val run = Queries.queries(name)
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val a = canon(run(spark, sfDir))
    spark.conf.set("spark.sql.shuffle.partitions", "13")
    try {
      val b = canon(run(spark, sfDir))
      assert(a == b, s"$name changed under different parallelism")
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  for (q <- Seq("q1_pricing", "gold_region_sales", "rank_topk",
    "dedup_latest", "merge_upsert", "sessionize", "dedup_exact",
    "ann_bruteforce", "expectations", "typed_revenue",
    // round-2 oracle-checked approximate/stateful operators: their
    // sampled training, signature buckets, and event logs must also
    // be partition-count-invariant for the driver gate to hold
    "ann_lsh", "ann_ivf", "ann_recall", "dedup_minhash_lsh",
    "dedup_simhash", "doc_fingerprint", "dedup_embedding_quantized",
    "pipeline_event_log", "versioned_update",
    "ann_ivf_indexed", "contamination_check", "value_quantiles",
    "running_revenue", "subquery_above_avg", "versioned_changes",
    "click_attribution", "ingest_merge_schema",
    // round-3: the iterative component loop, hash-sampled subsets and
    // windowed term ranks must not depend on partition count either
    "dedup_clusters", "tfidf_topterms", "text_repetition",
    "pii_scrub", "corpus_sample", "sequence_pack", "heavy_hitters",
    "cube_pricing", "customer_value_tiles", "ngram_containment",
    "value_outliers", "event_resample", "conversion_funnel",
    "curation_pipeline", "asof_join_tolerance",
    // round-4: two-phase ranks, grouping sets, zone-map reads and the
    // real PNG decode must hold under any fan-out too
    "corpus_shuffle", "grouping_sets_pricing", "window_analytics",
    "zonemap_pruned_read", "multimodal_meta", "rescue_repair",
    // round-4 second wave: bloom pruning (filter may pass different
    // false positives per layout — the JOIN result must not change),
    // SQL-native session windows, explicit window frames
    "bloom_pruned_join", "session_window_agg", "window_frames",
    // round-6: corpus-pipeline operators — LM scoring's integer sums,
    // span islands, fuzzy-decontamination summaries, posting ranks,
    // k-means cells, drift metrics and cohort rates must all be
    // fan-out-independent
    "lm_score", "ngram_lm", "duplicate_spans", "span_clean",
    "contamination_fuzzy", "inverted_index", "doc_chunk",
    "embedding_cluster", "random_projection", "bpe_fertility",
    "profile_diff", "cohort_retention", "multimodal_framesample",
    "hybrid_search", "dedup_apply", "ingest_text",
    "multimodal_ingest_decode", "mlm_mask", "quality_gate",
    "k_anonymity",
    // round-6 third wave: exact per-stratum ranks, two-phase
    // curriculum ranks, normalization hashes and the JSONL round-trip
    // must be fan-out-independent
    "corpus_sample_exact", "curriculum_order", "text_normalize",
    "export_jsonl", "skew_report", "dedup_stats", "l_diversity",
    "corpus_report", "quality_resample",
    // round-6 fourth wave: the TVD audit's decimal numerators and
    // window sums must not depend on fan-out, and the TextRank
    // integer fixpoint must be bit-identical under any partitioning
    "t_closeness", "textrank_keywords",
    // round-6 fifth wave: FastSS deletion-neighborhood blocking and
    // the PPJoin prefix filter must emit the same exact pair sets
    // under any fan-out
    "edit_distance_join", "similarity_join_exact",
    // the recall audit's full-outer pair counts, winsorize's exact
    // fences and the generalization-level choice are all fan-out-free
    "dedup_lsh_recall", "value_winsorize", "anonymize_generalize",
    // per-basket pair counts and the grid-window interpolation chain
    // are exact whatever the fan-out
    "market_basket", "event_interpolate",
    // the oriented wedge join must find the same triangle set under
    // any fan-out; sq8's integer ranking is exact by construction
    "graph_triangles", "ann_sq8",
    // the forward window mirror and comparison-only bucket ids are
    // fan-out-free like their backward/width siblings
    "asof_join_forward", "value_histogram_eqdepth",
    // survivorship rules are exact aggregates + a deterministic
    // windowed mode pick
    "dedup_golden",
    // round-7: the sign-once sweep's per-config counts, the ppm
    // histogram bins, integer-DIV cell shares and per-source regex
    // totals are all exact whatever the fan-out
    "dedup_param_sweep", "dedup_threshold_curve", "ivf_cell_stats",
    "pii_report", "dedup_sweep_recall", "script_mix",
    // wave 17/18: integer bin ratios and hash keeps; decimal IVM
    // partials; the two-phase exclusive prefix max (windows are the
    // classic parallelism hazard); map-side centroid comparisons
    "dsir_resample", "vocab_coverage", "moments_profile", "ab_test",
    "join_size_estimate", "ivm_delta_gold", "cluster_quality",
    "late_arrival_audit",
    // waves 19/20: real-decode hashes, container byte reads, prefix
    // binning, and the sketch CONTRACTS (the booleans must hold at
    // any fan-out even though raw sketch internals may move)
    "image_phash_dedup", "multimodal_audio_features", "compaction_plan",
    "approx_quantiles_audit", "bloom_fpp_audit", "langid_confusion",
    "session_stats", "watermark_curve", "ivm_delta_retract",
    "training_epoch", "semdedup_curve", "bucketed_agg", "ann_filtered",
    "stream_watermark_drop", "split_leakage_audit", "split_leakage_fix",
    "dsir_mix_report", "source_dedup_report",
    // r8: the CC-vs-pairwise calibration (iterative min-label loop),
    // the schema-store lifecycle, and the restartable file-sink
    // ingest must all be fan-out-independent
    "semdedup_component_drop", "ingest_schema_location",
    "stream_file_ingest", "dedup_clusters_fold",
    "dataset_fingerprint", "pii_pseudonymize", "pii_pseudonym_map",
    "stream_fingerprint",
    // r8 mixture wave: the waterfilling prefix scan (single-partition
    // window, exact long cumsums) and the bucket-refined budget
    // select (whole-bucket broadcast classification + sliver window)
    // must pick the same allocation and document set at any fan-out
    "token_budget_fit", "budget_sample", "epoch_expand",
    "mixture_curve", "stream_budget_fit", "mixture_manifest",
    // spectral wave: integer-exact moments — any fan-out must emit
    // identical longs/decimals (order-independent sums by design)
    "embedding_covariance", "embedding_pca", "pca_project",
    "stream_quantiles", "retrieval_mrr", "ref_integrity",
    "freshness_audit", "stream_expectations", "stream_ref_integrity",
    "embedding_isotropy", "stream_covariance", "source_overlap",
    "bootstrap_ci", "stream_image_dedup", "manifest_shards",
    "stream_overlap",
    // r8 lifecycle-completion wave: the commit-log readout after
    // DELETE/RESTORE/VACUUM and the CDC replay's exceptAll multiset
    // algebra must be fan-out-independent
    "table_restore", "cdc_apply",
    // the outer join's null rows are watermark-closure events — the
    // flushed set must not depend on state-store fan-out
    "stream_join_outer",
    // integer cross-multiplied thresholds — booleans exact at any
    // fan-out; the mined negative set is an exact windowed top-k
    "gopher_rules", "hard_negatives",
    // exact decimal contingency algebra + one IEEE chain per cell;
    // the ACF's decimal sums are order-independent by construction
    "chi2_drift", "ts_autocorr", "quality_calibration",
    // pure null-safe struct comparisons — no ordering anywhere; the
    // mutual-kNN closure is an iterative min-label loop like
    // dedup_clusters
    "branch_merge", "embedding_communities", "ingest_xml",
    "pack_efficiency",
    // recall legs are exact-set intersections over tie-broken top-k
    // frames; the quantizer is the frozen fit-once kernel
    "ann_dim_sweep", "ann_nprobe_curve",
    // integer detrended numerators / cents-fixed decimal power sums —
    // order-independent by construction, doubles only in fixed chains
    "ts_decompose", "column_corr",
    // pure integer fit/chunk/truncation ledger
    "context_len_fit",
    // associative integer counters over fixed sha60 cells
    "sketch_countmin", "stream_countmin",
    // endpoint counts over the deterministic LSH pair set
    "dedup_graph_degrees",
    // fixed sub-ordered distortion folds vs frozen codebooks
    "pq_distortion",
    // integer position joins / integer cross-multiplied ratio gate
    "phrase_search", "lexicon_filter",
    // pruned read ≡ full filter at any fan-out (no false negatives)
    "bloom_index_read",
    // tie-broken top-1 legs over portable cosine chains
    "triplet_audit",
    // decorrelated LATERAL: tie-broken per-key top-1, copy-only values
    "sql_lateral_topk",
    // pointer-doubling depth: exact integer hop sums, unique paths
    "hierarchy_depth",
    // level-sweep rollup: order-independent decimal(38,0) sums
    "subtree_rollup",
    // residual chains + rank-copy fences, score one fixed chain
    "ts_seasonal_anomaly",
    // round-9: the distributed BPE trainer's per-round top-1 pair
    // (count ties broken lexicographically) and the cross-correlation
    // lag join must be fan-out-independent
    "bpe_train", "ts_crosscorr",
    // the custom physical operator must give the same answer under
    // any partition fan-out (its merge is per-partition)
    "asof_join_native", "event_debounce", "table_clone",
    "asof_join_forward_native", "dedup_method_agreement",
    // round-10: append + incremental compaction are layout moves —
    // the table CONTENT must be identical at any fan-out (which files
    // qualify as "small" may differ; the rows never do); the stats-
    // pruned read row-filters survivors, so pruning luck can't leak
    "optimize_incremental", "versioned_pruned_read",
    // deletion vectors: row positions differ per fan-out (physical
    // files differ) but the LIVE content is exactly the filter
    "delete_vectors",
    // round-11: partition pruning is a metadata shortlist (which
    // files exist per partition differs by fan-out; the row set
    // never does), and the CDF follower's replayed feeds are
    // multiset-exact regardless of how commits split into files
    "versioned_partition_read", "stream_cdf_follow"))
    test(s"$q is parallelism-invariant") { invariant(q) }
}
