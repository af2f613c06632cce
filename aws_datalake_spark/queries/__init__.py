"""Query registry — the driver contract surface.

Every implemented operator from SURVEY.md §2 is exposed here as a
named query ``(spark, sf_dir) -> DataFrame`` plus (where the
semantics are SQL-expressible) a DuckDB oracle SQL twin. The driver
hash-compares the two at sf0.01; see ``/root/repo/__spark_entry__.py``.

Import side effects register the queries; keep module list exhaustive.
"""

from __future__ import annotations

from aws_datalake_spark.queries.registry import (  # noqa: F401
    QueryFn,
    all_oracles,
    all_queries,
    query,
)

# Import for registration side-effects.
from aws_datalake_spark.queries import relational  # noqa: F401,E402
from aws_datalake_spark.queries import relational_ext  # noqa: F401,E402
from aws_datalake_spark.queries import relational_tpch  # noqa: F401,E402
from aws_datalake_spark.queries import sketches  # noqa: F401,E402
from aws_datalake_spark.queries import reference_ops  # noqa: F401,E402
from aws_datalake_spark.queries import llm_text  # noqa: F401,E402
from aws_datalake_spark.queries import llm_dedup  # noqa: F401,E402
from aws_datalake_spark.queries import llm_decontam  # noqa: F401,E402
from aws_datalake_spark.queries import llm_packing  # noqa: F401,E402
from aws_datalake_spark.queries import llm_similarity  # noqa: F401,E402
from aws_datalake_spark.queries import streaming_batch  # noqa: F401,E402
from aws_datalake_spark.queries import entity_e2e  # noqa: F401,E402
from aws_datalake_spark.queries import round5  # noqa: F401,E402
from aws_datalake_spark.queries import round6  # noqa: F401,E402
from aws_datalake_spark.queries import round7  # noqa: F401,E402
from aws_datalake_spark.queries import round8  # noqa: F401,E402
from aws_datalake_spark.queries import round9  # noqa: F401,E402
from aws_datalake_spark.queries import r08_batch  # noqa: F401,E402
from aws_datalake_spark.queries import r09_batch  # noqa: F401,E402
from aws_datalake_spark.queries import r10_batch  # noqa: F401,E402

# ---------------------------------------------------------------------------
# Driver-window rotation
# ---------------------------------------------------------------------------
# The external driver hash-checks the FIRST 50 registry entries each
# round. Left in raw registration order that window never moves, so
# most of the registry would stay driver-unverified forever. Reorder
# so queries WITHOUT a green row in any prior round's
# CORRECTNESS_r*.json come first — reference-parity (ref_*) queries
# and the flagship LLM-pipeline operators ahead of the rest — and
# already-certified queries sink to the back. Each round the window
# then certifies ~50 new queries and cumulative driver coverage
# converges on the whole registry, with zero code changes per round.

# Order matters: the first entries claim whatever window slots remain
# after the ref_* family, so the externally-named flagship set
# (minhash LSH, dedup clusters, cosine/ANN top-k, decontamination,
# sequence packing, leakage-safe split) outranks the rest.
_FLAGSHIP = (
    "llm_minhash_lsh_pairs",
    "llm_dedup_clusters",
    "llm_cosine_topk",
    "llm_ann_ivf_topk",
    "llm_ann_lsh_topk",
    "llm_decontaminate",
    "llm_sequence_packing",
    "llm_train_test_split",
    # the two queries specifically flagged for round-2 certification:
    # the de-crossjoined semantic dedup and the composed entity flow
    "llm_semantic_dedup_keep",
    "ref_entity_end_to_end",
)


# Round-3 window priority (VERDICT r02 item 3): the 24 queries whose
# oracles carried the HUGEINT typing defect (13 driver-red in r02 +
# 11 that would have failed on first windowing — all fixed with
# CAST(... AS BIGINT) this round) must re-certify first, then the
# judge-named LLM surface that has never been windowed (dedup family,
# multimodal, BM25/RRF/rerank retrieval, the sampling suite). Names
# not in the registry are ignored; green names sink as usual.
_R3_PRIORITY = (
    # 13 r02 reds (HUGEINT oracles, now cast)
    "llm_sequence_packing", "ref_floats_to_int", "ref_state_delta",
    "ref_dq_expectations", "ref_pipe_csv_roundtrip", "ref_profile_columns",
    "ref_orc_roundtrip", "ref_apply_changes", "ref_txn_datasource_read",
    "ref_txn_restore", "ref_txn_delete_vectors", "ref_txn_hidden_partitioning",
    "ref_incremental_mv",
    # 11 pending HUGEINT oracles (never windowed, now cast)
    "llm_corpus_pipeline", "llm_corpus_stats", "llm_fingerprint",
    "llm_importance_weights", "llm_simhash", "q12_priority_classes",
    "q_dynamic_partition_pruning", "ref_txn_bloom_lookup",
    "ref_txn_change_feed", "ref_txn_constraints", "ref_txn_equality_delete",
    # never-windowed judge-named LLM surface
    "llm_exact_dedup", "llm_dedup_keep", "llm_incremental_dedup",
    "llm_segment_dedup", "llm_segment_dedup_keep_first", "llm_media_dedup",
    "llm_multimodal_features", "llm_frame_sample",
    "llm_bm25_indexed", "llm_bm25_search", "llm_hybrid_search_rrf",
    "llm_rerank",
    "llm_stratified_sample", "llm_budgeted_sample", "llm_priority_sample",
    "llm_mixing_weights", "llm_dsir_resample",
)


# Round-4 window priority (VERDICT r03 item 1): the previous family
# ordering put ALL generic q_* behind ALL llm_/st_, deferring the 15
# TPC-H shapes to round 5. Balance the window instead: TPC-H + the
# window/analytics set + the streaming batch twins + the text-analysis
# flagships + the three perf-reworked queries (token budget /
# curriculum bins / epoch plan — re-certify after this round's scan
# fixes) + the new paginated-API surface (VERDICT item 5). Exactly 50
# names; the ~30 remaining stragglers take the round-5 window.
_R4_PRIORITY = (
    # new driver surfaces for S1/S2/S3 and S13/S14/P20 (this round)
    "ref_paginated_scan", "ref_paginated_pushdown", "ref_paginated_keyed",
    "ref_zone_promote_roundtrip",
    # 15 round-2 TPC-H shapes
    "q02_min_cost_supplier", "q07_volume_shipping", "q08_market_share",
    "q09_product_type_profit", "q10_returned_items", "q11_important_stock",
    "q13_customer_distribution", "q14_promo_revenue", "q15_top_supplier",
    "q16_supplier_part_count", "q18_large_orders",
    "q19_disjunctive_predicates", "q20_excess_inventory_suppliers",
    "q21_blame_supplier", "q22_dormant_customers",
    # window / analytics set
    "q_window_rank_stats", "q_window_time_range_frame", "q_lateral_topn",
    "q_null_semantics", "q_decimal_exact_sum", "q_yoy_growth",
    # remaining generic shapes
    "q_exact_median_histogram", "q_grouped_median_histogram",
    "q_sql_parameterized", "q_bloom_pruned_join",
    # streaming batch-twin set
    "st_tumbling_window", "st_sliding_window", "st_session_window",
    "st_json_props_extract", "st_json_path_functions",
    "st_gap_fill_locf", "st_gap_fill_interp", "st_interval_join",
    # text-analysis flagships
    "llm_lang_id", "llm_quality_scores", "llm_token_counts",
    "llm_pii_scrub", "llm_minhash_signature", "llm_chunk_documents",
    "llm_rag_index",
    # perf-reworked this round — certify the new plans
    "llm_token_budget", "llm_curriculum_bins", "llm_epoch_plan",
    # dedup-family stragglers (llm_embedding_neardup yields its slot
    # to the zone-orchestration surface; its operator family is
    # already driver-certified via llm_semantic_dedup_keep)
    "llm_simhash_neardup", "llm_ngram_jaccard_pairs",
    "llm_edit_distance_verify",
)


# Round-5 window pin (VERDICT r04 item 1): the 48 never-green names
# (40 backlog + the 8 round-5 additions) must ALL land in the 50-slot
# window; queries added mid-round-5 (queries/round6.py) sort after
# them — they take any spare slots now and the round-6 window
# otherwise. Without this pin a new llm_* would displace a planned
# q_* out of slot ≤ 49 (family sorts llm_/st_ before q_).
_R5_PRIORITY = (
    "ref_fixed_width_roundtrip", "st_distinct_users_hll",
    "llm_heavy_hitters_by_lang", "llm_weighted_quality_by_source",
    "llm_text_normalize", "llm_sentence_split", "llm_repetition_filters",
    "llm_build_vocab", "llm_collocation_lift", "llm_tfidf_top_terms",
    "llm_rarity_scores", "llm_bigram_lm", "llm_source_drift",
    "llm_bpe_merges", "llm_vocab_coverage", "llm_dataset_card",
    "llm_quality_classifier", "llm_lm_doc_scores", "llm_filter_funnel",
    "llm_seq_len_histogram", "llm_fertility_by_lang",
    "llm_dedup_rate_by_source", "llm_diversity_by_source",
    "llm_source_overlap", "llm_duplicate_chunks", "llm_training_order",
    "llm_adaptive_quality_filter", "llm_corpus_pipeline_v2",
    "llm_bucket_packing", "llm_packing_efficiency", "llm_embedding_neardup",
    "llm_kmeans_cells", "llm_embedding_quantize", "llm_embed_documents",
    "llm_hard_negatives", "llm_audio_chunks", "llm_audio_index",
    "llm_ann_pq_topk", "st_first_event_per_key", "st_hourly_daily_rollup",
    "st_txn_stream_ingest", "st_late_data_drop", "st_ohlc_bars",
    "llm_length_outliers", "llm_stratified_eval_split",
    "q_entity_resolution", "q_skew_salted_join", "q_attribution_first_last",
)


# Round-6 window pin (VERDICT r05 item 1): the 37 never-green names
# (32 round-5-session additions that have never had a driver window +
# the 5 declared rows-only queries that re-run every round) must ALL
# land in slots 0-36; queries added mid-round-6 sort after them and
# take the 13 spare slots. Without this pin a new llm_* registered
# this round would sort (family 2) ahead of the pinned q_* tail and
# could displace e.g. q_benford_digits out of slot <= 49.
_R6_PRIORITY = (
    # the round-6 rows-only five — all five have since gained exact
    # oracles (kmeans/PQ/BPE in r07; HLL bounded-error + fixed-point
    # logistic in r08) and graduate to hash checks automatically via
    # _rows_only_certified()'s oracle test
    "st_distinct_users_hll", "llm_bpe_merges", "llm_quality_classifier",
    "llm_kmeans_cells", "llm_ann_pq_topk",
    # 32 never-windowed round-5-session additions (VERDICT r05 list)
    "llm_rbo_top_terms", "llm_lsh_recall_curve", "llm_decontam_excise",
    "llm_corpus_pipeline_v3", "llm_ann_recall", "llm_embedding_stats",
    "llm_mutual_nn", "st_interval_join_outer", "llm_winnow_fingerprints",
    "llm_source_similarity_sketch", "llm_weighted_length_quantiles",
    "llm_weighted_median_by_source", "llm_winnow_matches",
    "q_session_journeys", "q_countmin_frequencies", "q_quantile_sketch",
    "q_trigram_substring_search", "q_graph_pagerank", "q_kmv_distinct_docs",
    "q_triangle_count", "q_event_sequences", "q_correlation_exact",
    "q_shard_skew_gini", "q_session_incident_overlap",
    "q_rolling_active_days", "q_fd_violations", "q_ri_violations",
    "q_conversion_time_quantiles", "q_correlation_matrix",
    "q_winsorized_mean", "q_skyline_parts", "q_benford_digits",
)


def _driver_green_names() -> set[str]:
    """Query names with a fully-green row in any prior round's driver
    artifact (rows+schema+hash all matched)."""
    import json
    from pathlib import Path

    green: set[str] = set()
    root = Path(__file__).resolve().parents[2]
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        try:
            rows = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, r in rows.items():
            if not isinstance(r, dict):
                continue
            if r.get("rows_match") and r.get("schema_match") and (
                r.get("hash_match") in (True, None)
            ):
                green.add(name)
    return green


def _rows_only_certified() -> set[str]:
    """Declared rows-only queries that already have a driver record
    (ran, row-counted, `no_oracle`) in some prior round AND still have
    no oracle registered. These can never go hash-green, so once
    certified they stop floating to the window head (VERDICT r06 item
    2: they were re-occupying slots 0-4 every round — 10% of each
    window spent re-running queries whose status cannot change). A
    query that GAINS an oracle later (kmeans/PQ this round) drops out
    of this set automatically and re-enters the never-green pool for
    its first hash window."""
    import json
    from pathlib import Path

    oracled = set(all_oracles())
    certified: set[str] = set()
    root = Path(__file__).resolve().parents[2]
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        try:
            rows = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, r in rows.items():
            if not isinstance(r, dict) or name in oracled:
                continue
            if r.get("err") == "no_oracle" and (r.get("spark_rows") or 0) >= 0:
                certified.add(name)
    return certified


def driver_ordered_queries() -> dict[str, QueryFn]:
    """`all_queries()` reordered for the driver's 50-entry window:
    never-yet-green first (ref_* parity, then flagship llm_*, then
    remaining llm_/st_, then generic q_*), previously-green last.
    Certified rows-only queries group with the green pool (they
    cannot change status). Deterministic given the same
    CORRECTNESS_r*.json files."""
    reg = all_queries()
    green = _driver_green_names() | _rows_only_certified()
    flagship_rank = {n: i for i, n in enumerate(_FLAGSHIP)}
    r3_rank = {n: i for i, n in enumerate(_R3_PRIORITY)}
    r4_rank = {n: i for i, n in enumerate(_R4_PRIORITY)}
    r5_rank = {n: i for i, n in enumerate(_R5_PRIORITY)}
    r6_rank = {n: i for i, n in enumerate(_R6_PRIORITY)}
    order = {n: i for i, n in enumerate(reg)}

    def key(name: str) -> tuple:
        # the externally-named flagship set outranks everything (it
        # was called out by name as round-2 window priority); ref_*
        # parity next (older parity ops registered first), then the
        # remaining llm_/st_ surface, then generic queries
        if name in flagship_rank:
            family = 0
        elif name.startswith("ref_"):
            family = 1
        elif name.startswith(("llm_", "st_")):
            family = 2
        else:
            family = 3
        return (
            name in green,
            name not in r6_rank,
            r6_rank.get(name, 0),
            name not in r5_rank,
            r5_rank.get(name, 0),
            name not in r4_rank,
            r4_rank.get(name, 0),
            name not in r3_rank,
            r3_rank.get(name, 0),
            family,
            flagship_rank.get(name, 0),
            order[name],
        )

    return {n: reg[n] for n in sorted(reg, key=key)}
