"""Render COVERAGE.md: SURVEY.md §2 operator inventory → graded queries.

Run: python tools/gen_coverage.py  (rewrites COVERAGE.md)
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from zmaxion_spark.queries import REGISTRY  # noqa: E402

# SURVEY.md §2 inventory: id → short name (§2.1–§2.11).
OPERATORS: dict[int, str] = {
    1: "scan_parquet", 2: "scan_csv / scan_json", 3: "source_stream_file",
    4: "source_stream_rate", 5: "source_kafka (design slot)",
    6: "sink_parquet / sink_memory", 7: "sink_foreach_batch",
    8: "project", 9: "filter / predicates", 10: "filter_exists / not_exists",
    11: "case_when", 12: "null_handling",
    13: "join_inner", 14: "join_outer", 15: "join_semi / anti",
    16: "join_broadcast", 17: "join_theta / non-equi", 18: "join_cross",
    19: "join_asof", 20: "join_interval", 21: "join_stream_static",
    22: "join_stream_stream",
    23: "agg_hash grouped", 24: "agg_global", 25: "agg_distinct",
    26: "agg_approx", 27: "grouping_sets / cube / rollup",
    28: "agg_filtered", 29: "pivot",
    30: "win_rank", 31: "win_analytic", 32: "win_agg_framed",
    33: "top_k_per_group",
    34: "sort", 35: "limit / offset", 36: "top_k global",
    37: "union_all / distinct", 38: "intersect", 39: "except",
    40: "dedup_exact",
    41: "string functions", 42: "date/time functions", 43: "math functions",
    44: "array functions", 45: "map/struct functions", 46: "json functions",
    47: "hash/misc functions",
    48: "watermark", 49: "window_tumbling", 50: "window_sliding",
    51: "window_session", 52: "dedup_stream", 53: "stateful_map",
    54: "late_data_policy", 55: "output_modes", 56: "trigger_control",
    57: "stream_checkpoint",
    58: "scalar pandas UDF", 59: "grouped-agg pandas UDF (UDAF)",
    60: "grouped-map UDF (applyInPandas)", 61: "struct-arg pandas UDF",
    62: "mapInPandas / mapInArrow", 63: "python UDTF",
    64: "text_normalize", 65: "text_tokenize", 66: "text_stats",
    67: "tf_idf", 68: "text_shingle", 69: "dedup_exact_content",
    70: "dedup_near_minhash (+simhash/jaccard)", 71: "sim_cosine_pairwise",
    72: "sim_topk_search", 73: "sim_join", 74: "sentiment_lexicon",
    75: "multimodal_column", 76: "ts_sim_search",
    # §2.12 round-2 extensions (shard-prep pipeline + graded infra)
    77: "train_test_split", 78: "context_packing", 79: "pii_redact",
    80: "sample_balanced", 81: "embedding_quantize", 82: "dedup_fragment",
    83: "ecs_tick", 84: "join_salted", 85: "heavy_hitters (+CMS sketch twin)",
    86: "sessionize_batch", 87: "ts_resample_gapfill", 88: "decayed_agg",
    89: "quality_repetition", 90: "merge_upsert", 91: "quantile_exact_hist",
    92: "anomaly_zscore", 93: "fuzzy_join_levenshtein", 94: "partition_prune",
    # §2.13 round-2 second wave (subquery patterns + CDC history)
    95: "subquery_correlated_scalar", 96: "subquery_having_join_back",
    97: "subquery_global_scalar_gate", 98: "period_over_period",
    99: "scd2_intervals", 100: "bigram_lm_score", 101: "data_profile",
    102: "rollup_hypertable", 103: "stream_trending_topk",
    104: "recursive_cte", 105: "distribution_ranks", 106: "set_ops_bag",
    107: "join_stream_left_outer", 108: "rolling_time_window",
    109: "unpivot_melt", 110: "url_parse_domain_agg",
    111: "ecs_schedule", 112: "embedding_centroid", 113: "agg_argmax",
    114: "stateful_v2 (transformWithState)",
    115: "fk_integrity_audit", 116: "snapshot_diff",
    117: "windowed_distinct_count", 118: "ratio_to_report",
    119: "join_asof_forward", 120: "nested_struct_pipeline",
    121: "join_disjunctive", 122: "subquery_exists_chain",
    123: "compact_small_files", 124: "contamination_screen",
    # §2.14 round-3 wave (corpus-engineering passes)
    125: "doc_chunking", 126: "sample_weighted", 127: "shard_manifest",
    128: "global_shuffle (no global sort)", 129: "token_histogram",
    130: "domain_mix_rebalance", 131: "length_percentile_gate",
    132: "dedup_incremental", 133: "scan_orc",
    134: "join_temporal_pit (stream)",
    135: "variant_semistructured",
    136: "python_datasource (topic simulator)",
    137: "python_datasource_stream (offset resume)",
    138: "join_lateral", 139: "runtime_metrics_observe",
    140: "hll_sketch (mergeable distinct)",
    141: "funnel_analysis (CEP-lite sequences)",
    142: "funnel_stream (stateful CEP)",
    143: "ecs_stream_tick (topic -> system -> world state)",
    144: "bucketed_colocated_join",
    # §2.15 round-3 second wave (behavioral analytics)
    145: "market_basket", 146: "retention_cohorts", 147: "ab_test_stats",
    148: "skyline_pareto", 149: "inverted_index", 150: "bm25_scoring",
    151: "cooccurrence_pmi", 152: "triangle_count", 153: "pagerank_fixed",
    154: "spatial_grid_join", 155: "incremental_mv", 156: "zorder_layout",
    157: "stream_cdc_apply",
    # §2.16 round-3 third wave (statistics + interchange + Spark 4 SQL)
    158: "stats_regression", 159: "gap_fill_locf", 160: "xml_semistructured",
    161: "feature_hashing", 162: "stream_dedup_bounded",
    163: "runtime_bloom_filter", 164: "stream_progress_metrics",
    165: "arrow_grouped_map", 166: "rocksdb_state_store",
    167: "sql_udf", 168: "pipe_syntax", 169: "collation",
    170: "try_functions", 171: "param_sql",
    # §2.17 round-3 fourth wave (control flow + state inspection)
    172: "sql_scripting", 173: "state_reader", 174: "gopher_quality_gates",
    # §2.18 transaction-log table format
    175: "txlog_snapshot", 176: "txlog_time_travel", 177: "txlog_skipping",
    178: "stream_to_txlog (exactly-once ingest)", 179: "txlog_vacuum",
    180: "ecs_snapshot_restore", 181: "txlog_schema_evolution",
    182: "txlog_merge", 183: "txlog_change_feed",
    184: "txlog_stream_source (versions as offsets)",
    # §2.19 sketches, quality gates, clustering, log protocol
    185: "countmin_sketch", 186: "constraint_suite", 187: "txlog_cluster",
    188: "txlog_bloom_index", 189: "txlog_delete_vectors",
    190: "txlog_checkpointed_log", 191: "txlog_occ",
    192: "medallion_pipeline (bronze->silver exactly-once)",
    193: "txlog_validated_commit (quality-gated publish)",
    194: "ecs_despawn (world-wide DV erasure)",
    195: "phrase_search (positional postings)",
    196: "txlog_shallow_clone (zero-copy)",
    197: "txlog_restore (head rollback commit)",
    198: "txlog_metadata_agg (manifest-only count/min/max)",
    199: "txlog_replace_where (dynamic partition overwrite)",
    200: "corpus_to_shards (capstone training-data pipeline)",
    201: "ecs_tick_history (versioned world ticks)",
    # §2.20 governance, scale diagnostics, retrieval diversity
    202: "k_anonymity (QI audit + l-diversity)",
    203: "dp_noisy_count (deterministic Laplace release)",
    204: "kmv_distinct (mergeable theta sketch)",
    205: "skew_diagnose (salt-factor recommendation)",
    206: "shortest_path (bounded-hop BFS)",
    207: "mmr_rerank (diversified top-k)",
    208: "url_canonical_dedup",
    209: "rrf_fusion (hybrid-search combiner)",
    210: "join_cardinality (sketch-based CBO estimate)",
    211: "label_propagation (majority-vote spreading)",
    212: "woe_binning (information value)",
    213: "target_encoding (smoothed category means)",
    214: "kfold_cv (deterministic folds + LOFO means)",
    215: "stream_anomaly (prequential z-score state)",
    216: "phash_dedup (banded perceptual hashing)",
    217: "embedding_covariance (outer-product agg)",
    218: "bloom_prefilter (measured-FP semi-join)",
    219: "quantile_sample (deterministic AQP sample)",
    220: "stream_countmin (sketch as streaming state)",
    221: "bpe_train (tokenizer merge learning)",
    222: "quality_classifier (logistic scoring expression)",
    223: "subject_access (GDPR export report)",
    224: "attribution_touch (first/last-touch credit)",
    225: "hard_negatives (contrastive mining)",
    226: "model_eval_auc (midrank Mann-Whitney)",
    227: "calibration_ece (reliability bins)",
    228: "entity_resolution (block-match-canonicalize)",
    229: "markov_transitions (journey chain estimation)",
    230: "bandit_ucb (deterministic allocation)",
    231: "sequence_mining (frequent trigrams)",
    232: "bpe_apply (learned-merge tokenization)",
    233: "kaplan_meier (censoring-aware survival)",
    234: "psi_drift (population stability index)",
    235: "roc_curve (threshold operating points)",
    236: "feature_store_pit (leakage-free assembly)",
    237: "cusum_changepoint (sequential control chart)",
    238: "forecast_backtest (seasonal-naive MAPE)",
    239: "model_release_gate (eval-capstone go/no-go)",
    240: "bitmap_index (packed-word set algebra)",
    241: "geohash_rollup (multi-resolution spatial index)",
    242: "fairness_audit (disparate-impact gate)",
    243: "temperature_mix (mT5-style mixture sampling)",
    244: "dead_letter (quarantine routing census)",
    245: "isotonic_calibration (minimax PAVA closed form)",
    246: "slo_burn_rate (error-budget alerting)",
    247: "rfm_segmentation (marketing quintiles)",
    248: "ltv_cohorts (lifetime-value curves)",
    249: "diff_in_diff (2x2 causal estimate)",
    250: "benford_screen (leading-digit forensics)",
    251: "abc_pareto (revenue concentration census)",
    252: "concentration (Gini / HHI / top-share)",
    253: "robust_stats (trimmed + winsorized means)",
    254: "max_drawdown (peak-to-trough risk)",
    255: "time_to_convert (funnel velocity percentiles)",
    256: "dedup_threshold_sweep (estimator calibration)",
    # §2.21 round-4 wave (custom sink protocol)
    257: "python_datasource_sink (manifest-committed writer + batchId-idempotent stream sink)",
    # §2.21 round-4 second wave: exact similarity + spectral + chained state
    258: "set_sim_join_prefix (PPJoin-filtered exact Jaccard join)",
    259: "jl_projection (Johnson-Lindenstrauss + distortion audit)",
    260: "pca_power (top principal component via power iteration)",
    261: "stream_chained_agg (two stateful operators in one query)",
    262: "containment_dedup (asymmetric near-superset detection)",
    # §2.22 round-5 wave (scale defenses graded, eval + multimodal depth)
    263: "lsh_bucket_cap (lossless oversized-bucket diversion)",
    264: "ann_recall_contract (graded IVF/LSH accuracy bounds)",
    265: "rank_metrics (NDCG@10 + MRR over BM25 rankings)",
    266: "vocab_coverage (tokenizer vocabulary health)",
    267: "audio_features (windowed PCM feature extraction)",
    268: "group_split_leakfree (group-aware split + leakage audit)",
    269: "negative_sampling (smoothed-unigram word2vec negatives)",
    270: "graph_2hop_agg (two-hop neighborhood features)",
    271: "char_entropy_gate (character-distribution spam screen)",
    # §2.23 round-5 third wave (statistical inference + clustering)
    272: "ks_test (two-sample Kolmogorov-Smirnov drift)",
    273: "kmeans_fixed (fixed-iteration Lloyd clustering)",
    274: "bootstrap_ci (Poisson-bootstrap confidence interval)",
    275: "seasonal_decompose (MA detrend + day-of-week index)",
    276: "mutual_information (MI + entropies + NMI)",
    277: "pq_ann (trained product quantization + ADC, recall-graded)",
    278: "conformal_intervals (split-conformal coverage contract)",
    279: "quantile_normalize (rank-matched global profile)",
    280: "chi2_screen (chi-square feature selection)",
    281: "stream_drift (windowed PSI vs static reference)",
    282: "k_core (bounded-round graph peel + convergence census)",
    283: "margin_bitext (mutual-NN margin-ratio parallel-pair mining)",
    284: "propensity_match (nearest-neighbor ATT with caliper)",
    285: "cep_negation (A..B with NO C between, MATCH_RECOGNIZE-style)",
    286: "sequential_ab (group-sequential monitoring boundary)",
    287: "neyman_allocation (variance-optimal stratified budgets)",
}

# Ops verified by tests rather than graded queries.
TEST_COVERED: dict[int, str] = {
    4: "tests/test_streaming.py::test_rate_source_schema",
    123: "tests/test_layout.py::test_compact_rewrites_small_files",
    6: "tests/test_streaming.py::test_parquet_sink_exactly_once",
    7: "tests/test_streaming.py::test_foreach_batch_side_channel",
    54: "tests/test_streaming.py::test_watermark_drops_late_data",
    139: "tests/test_properties.py::test_observe_metrics_single_pass",
    164: "tests/test_streaming.py::test_progress_recorder_captures_batches",
    191: "tests/test_txlog.py::test_occ_append_retries_through_race + "
         "test_occ_raises_on_removed_read_set",
}

DESIGN_SLOTS: dict[int, str] = {
    5: "kafka source: the network LOAD needs a broker (absent here), "
       "but everything behind it now executes — #136/#137 drive the "
       "same parse_kafka_topology projection and offset-resume "
       "semantics through a custom Python DataSource emitting the "
       "exact Kafka wire schema",
    # 114 CLOSED in round 5: transformWithState executes end-to-end
    # through zmaxion_spark/_protoshim and is graded by
    # q_stream_stateful_v2 (parity vs the #53 applyInPandasWithState
    # twin) — no longer a design slot.
}


def _driver_record() -> dict[str, str]:
    """Per-query driver verdict from the latest CORRECTNESS_r*.json.

    Distinguishes driver-graded evidence from local-only verification
    (round-1 judge finding: the driver grades only the first 50
    registry entries, so 'verified' must say by whom)."""
    import glob
    import json

    out: dict[str, str] = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = path[len("CORRECTNESS_r"):-len(".json")]
        with open(path) as f:
            rec = json.load(f)
        for name, row in rec.items():
            if row.get("err") == "no_oracle":
                out[name] = f"driver r{rnd}: rows-only"
            elif row.get("err"):
                out[name] = f"driver r{rnd}: ERR"
            elif row.get("hash_match"):
                out[name] = f"driver r{rnd}: exact"
            else:
                out[name] = f"driver r{rnd}: MISMATCH"
    return out


def _survey_names() -> dict[int, str]:
    """Operator ids/names parsed from SURVEY.md §2 tables — the source
    of truth for ids above the hardcoded dict (rounds 5+ add operators
    faster than this file's literal table should grow)."""
    import re

    out: dict[int, str] = {}
    try:
        text = open("SURVEY.md").read()
    except OSError:
        return out
    for m in re.finditer(r"^\| (\d+) \| `([^`]+)`", text, re.M):
        out[int(m.group(1))] = m.group(2)
    return out


def main() -> None:
    OPERATORS.update(
        {k: v for k, v in _survey_names().items() if k not in OPERATORS}
    )
    by_op: dict[int, list[str]] = {}
    for q in REGISTRY.values():
        for op in q.operators:
            by_op.setdefault(op, []).append(q.name)
    driver = _driver_record()
    from zmaxion_spark.queries import _NEXT_ROUND

    window = set(list(REGISTRY)[:50])
    queued = set(_NEXT_ROUND) - window

    lines = [
        "# COVERAGE — SURVEY.md §2 operator inventory → graded queries",
        "",
        "Generated by tools/gen_coverage.py from the query registry plus",
        "the latest driver CORRECTNESS_r{N}.json on disk.",
        "",
        "Status legend — `oracle`: DuckDB-SQL-paired, hash-verified by",
        "tools/check_oracle.py locally; `rows-only`: non-SQL-expressible,",
        "property-tested; `tests`: pytest-verified. The **driver** column",
        "is the independent evidence: the driver grades the first 50",
        "registry entries each round, so `local-only (in window)` means a",
        "driver row is expected next round and `local-only (past window)`",
        "means only the local replica of the gate has verified it.",
        "",
        "| # | operator | status | driver evidence | verified by |",
        "| --- | --- | --- | --- | --- |",
    ]
    covered = 0
    for op in sorted(OPERATORS):
        qs = sorted(by_op.get(op, []))
        if qs:
            kinds = {
                "oracle" if REGISTRY[n].oracle is not None else "rows-only" for n in qs
            }
            status = " + ".join(sorted(kinds))
            dstat = []
            for n in qs:
                if n in driver:
                    dstat.append(f"{n}: {driver[n]}")
                elif n in window:
                    dstat.append(f"{n}: local-only (in window)")
                elif n in queued:
                    dstat.append(f"{n}: local-only (queued next window)")
                else:
                    dstat.append(f"{n}: local-only (past window)")
            lines.append(
                f"| {op} | {OPERATORS[op]} | {status} | {'; '.join(dstat)} | "
                f"{', '.join(qs)} |"
            )
            covered += 1
        elif op in TEST_COVERED:
            lines.append(
                f"| {op} | {OPERATORS[op]} | tests | pytest | {TEST_COVERED[op]} |"
            )
            covered += 1
        elif op in DESIGN_SLOTS:
            lines.append(
                f"| {op} | {OPERATORS[op]} | design slot | — | {DESIGN_SLOTS[op]} |"
            )
        else:
            lines.append(f"| {op} | {OPERATORS[op]} | **TODO** | — | — |")
    n_driver_exact = sum(1 for v in driver.values() if v.endswith("exact"))
    lines += [
        "",
        f"**{covered}/{len(OPERATORS)} operators implemented and locally "
        f"verified**; {len(REGISTRY)} graded queries "
        f"({sum(1 for q in REGISTRY.values() if q.oracle)} oracle-paired, "
        f"{sum(1 for q in REGISTRY.values() if not q.oracle)} rows-only). "
        f"Driver-recorded hash-exact rows so far: {n_driver_exact} queries; "
        "the rest are verified by the local gate replica "
        "(tools/check_oracle.py) and scheduled into the driver's grading "
        "window by registry order.",
        "",
    ]
    with open("COVERAGE.md", "w") as f:
        f.write("\n".join(lines))
    print(f"COVERAGE.md written: {covered}/{len(OPERATORS)} covered")


if __name__ == "__main__":
    main()
