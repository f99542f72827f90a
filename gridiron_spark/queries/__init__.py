"""Query catalog: every operator from SURVEY.md §2, paired with its DuckDB oracle.

Each entry registers (a) a Spark implementation ``(spark, sf_dir) -> DataFrame``
and (b) an equivalent ANSI-SQL string the driver runs in DuckDB over the same
parquet tables. The two are hash-compared (columns sorted by name,
order-insensitive value hash), so every computed column is aliased identically
on both sides and all double aggregation goes through decimal-safe helpers
(see gridiron_spark.functions.decimal_safe).

Queries whose semantics are not SQL-expressible (streaming state, grouped-map
tensorization, LSH) register with ``oracle=None`` → the driver records a
weaker rows-only check.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class CatalogEntry:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    survey_ref: str  # SURVEY.md §2 operator ids this query covers


_CATALOG: dict[str, CatalogEntry] = {}

# modules that register queries on import. ORDER MATTERS for external
# verification: the driver hash-checks the first 50 catalog entries in
# catalog order. catalog() additionally floats never-driver-checked
# queries (anything not in _VERIFIED_R1_R3) to the front, so each round's
# 50-entry window yields the maximum number of new CORRECTNESS rows.
# dedup precedes scale/tpch_final so round 3's new operators (prefix
# dedup, star components, corpus pipeline) land inside the window.
_QUERY_MODULES = (
    "gridiron_spark.queries.tpch_extra",
    "gridiron_spark.queries.advanced",
    "gridiron_spark.queries.dedup",
    "gridiron_spark.queries.scale",
    "gridiron_spark.queries.tpch_final",
    "gridiron_spark.queries.parity",
    "gridiron_spark.queries.analytics",
    "gridiron_spark.queries.text",
    "gridiron_spark.queries.similarity",
    "gridiron_spark.queries.streaming_batch",
    "gridiron_spark.queries.multimodal",
    "gridiron_spark.queries.tensor",
    "gridiron_spark.queries.mllib",
    "gridiron_spark.queries.pipeline",
    "gridiron_spark.queries.quality",
    "gridiron_spark.queries.sinks",
    "gridiron_spark.queries.curation",
)

# Rotating re-verification ring (round 5+). CORRECTNESS_r04 was 50/50 green,
# so every catalog query now carries a driver evidence row; the window's job
# shifts from gap-closing to freshness. Each query is tiered by the ROUND of
# its most recent driver evidence row (computed from CORRECTNESS_r0{1..4}):
# new queries first, then oldest evidence first, so no query's evidence ever
# goes more than ~2-3 rounds stale. In-repo pytest (test_oracle_parity)
# still re-checks every oracle each run, so nothing regresses silently while
# out of the driver's window. Update after each round's CORRECTNESS lands.

# Latest driver evidence row is from round 2 (43 queries — the stalest).
_EVIDENCE_R2 = frozenset(
    {
        "agg_summary", "ann_cosine_topk", "ann_ivf_topk", "cogroup_reconcile",
        "dedup_clusters", "dedup_embedding_cosine", "dedup_exact",
        "dedup_exact_keep_rows", "dedup_minhash_lsh", "dedup_ngram_jaccard",
        "distinct_keys", "doc_chunking", "doc_fingerprint", "filter_project",
        "join_enrich", "multi_join_topk_revenue", "multimodal_decode",
        "multimodal_frame_sample", "range_join_bands", "rollup_revenue",
        "sample_join_back", "scalar_functions", "semi_join_membership",
        "simhash_fingerprint", "simhash_near_pairs", "streaming_dedup_e2e",
        "streaming_enrich_e2e", "streaming_session_e2e",
        "streaming_tumbling_e2e", "string_functions", "text_lang_id",
        "text_normalize", "text_quality_score", "text_token_count",
        "topk_orders", "topk_per_group", "tumbling_window_agg", "udtf_bigrams",
        "union_distinct", "window_frame_stats", "window_rank_suite",
        "winnow_fingerprint", "word_topk",
    }
)

# Latest driver evidence row is from round 3 (44 queries, incl. the four
# rows-only-by-design no_oracle rows recorded that round).
_EVIDENCE_R3 = frozenset(
    {
        "ann_recall_eval", "asof_join_events", "corpus_clean_pipeline",
        "decontaminate_ngram_overlap", "dedup_clusters_star",
        "dedup_ngram_prefix", "embedding_quantize", "forecast_revenue_change",
        "generator_outer_expand", "grouped_map_tensorize",
        "higher_order_functions", "incremental_dedup_flags",
        "keyed_dedup_earliest", "knn_join_topk", "large_volume_customers",
        "local_supplier_volume", "math_functions", "mixture_token_budget",
        "mllib_ann_brp_topk", "mllib_minhash_banded", "mllib_minhash_sim_join",
        "multimodal_embed", "multimodal_resize", "multiset_ops",
        "null_functions", "paginated_orders", "pricing_summary_q1",
        "profit_by_nation_year", "promo_revenue_ratio", "ranged_global_sort",
        "resample_forward_fill", "returned_item_topk",
        "sequence_pack_bucketed", "session_window_agg", "set_intersect_users",
        "small_qty_avg_revenue", "stratified_sample_agg", "streaming_join_e2e",
        "streaming_sliding_e2e", "supplier_part_relation",
        "top_revenue_supplier", "training_data_pipeline", "unpivot_metrics",
        "window_lag_delta",
    }
)

# Latest driver evidence row is from round 4 (50/50 green window).
_EVIDENCE_R4 = frozenset(
    {
        "anti_join_customers", "array_functions", "asof_forward_tolerance",
        "boilerplate_phrase_flags", "bpe_pair_counts",
        "cluster_balanced_sample", "conditional_agg_priority",
        "countmin_sketch", "cube_order_stats", "datetime_functions",
        "disjunctive_join_revenue", "dup_span_coverage",
        "excess_shipped_suppliers", "full_outer_debt_recon",
        "gopher_repetition_flags", "grouping_sets_mix",
        "groupwise_max_balance", "histogram_quantile_sketch",
        "hll_distinct_sketch", "important_part_value", "intra_doc_repetition",
        "json_functions", "kmeans_assign", "late_supplier_blame",
        "map_functions", "market_share_ratio", "min_cost_supplier",
        "minhash_estimate_error", "nation_pair_volume", "nested_collect_agg",
        "outer_join_order_dist", "pandas_udaf_stats", "pivot_event_counts",
        "priority_exists_count", "quantile_stats", "rolling_range_revenue",
        "salted_hot_key_agg", "scalar_subquery_idle_rich", "set_except_users",
        "sink_csv_roundtrip", "sink_partitioned_roundtrip",
        "sliding_window_agg", "source_contamination_matrix", "sql_api_exists",
        "streaming_quality_gate_e2e", "table_profile",
        "temperature_mixture_sample", "text_redact_pii", "text_regex_tokens",
        "vocab_encode_checksum",
    }
)

# CORRECTNESS_r04 had zero red rows, so there is no fixed-reds tier this
# round. New round-5 queries register here (tier 1, ahead of all
# re-verification) so they get their first evidence row immediately.
_NEW_R5 = (
    "semdedup_prune",
    "bpe_merge_sequence",
    "bpe_encode_tokens",
    "staged_candidate_pairs",
    "multimodal_wav_roundtrip",
    "multimodal_ppm_roundtrip",
    "winnow_overlap_pairs",
)

# Built after the round-5 window froze at exactly 50 (7 new + all 43
# stalest): these sort LAST this round — in-repo oracle parity checks them
# every pytest run now, and round 6 promotes them into the window's new
# tier for their first driver evidence row. Without this tier a
# late-round addition would land in the "no evidence row" safety net and
# evict a stale entry from the ring.
_DEFER_R6 = (
    "corpus_rank_quality",
    "ingest_normalize_roundtrip",
    "shingle_novelty_score",
    "scan_unified_drift_roundtrip",
    "dedup_keep_best",
    "ingest_json_roundtrip",
    "cluster_split_assign",
)


def register(name: str, *, oracle: str | None, survey: str):
    """Decorator: add a query to the catalog."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in _CATALOG:
            raise ValueError(f"duplicate query name: {name}")
        _CATALOG[name] = CatalogEntry(name, fn, oracle, survey)
        return fn

    return deco


def catalog() -> dict[str, CatalogEntry]:
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    # stable rotation order (registration order within each tier):
    #   1. new this round — first evidence row (_NEW_R5)
    #   2. anything without an evidence row (safety net; empty by audit)
    #   3. stalest evidence (round 2) — the re-verification ring's head
    #   4. round-3 evidence — fills whatever window slots remain
    #   5. round-4 evidence — freshest, re-verified last
    new_r5, defer_r6 = set(_NEW_R5), set(_DEFER_R6)

    def tier(name: str) -> int:
        if name in new_r5:
            return 1
        if name in defer_r6:
            return 6
        if name in _EVIDENCE_R2:
            return 3
        if name in _EVIDENCE_R3:
            return 4
        if name in _EVIDENCE_R4:
            return 5
        return 2

    entries = list(_CATALOG.items())
    entries.sort(key=lambda kv: tier(kv[0]))
    return dict(entries)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: e.spark_fn for name, e in catalog().items()}


def oracle_sql() -> dict[str, str]:
    return {name: e.oracle for name, e in catalog().items() if e.oracle is not None}
