"""Declared engine queries + their DuckDB oracle SQL.

Each submodule registers (spark_callable, oracle_sql) pairs into the shared
registry; ``__spark_entry__.py`` exposes the registry to the driver.
Importing this package pulls in every query family.
"""

from vector_db_spark.queries.registry import ORACLES, query
from vector_db_spark.queries.registry import QUERIES as _REGISTERED

from vector_db_spark.queries import (  # noqa: E402,F401
    ann_queries,
    collection_queries,
    multimodal_queries,
    pipeline_queries,
    relational_queries,
    relational_queries2,
    retrieval_queries,
    streaming_queries,
    vector_queries,
)

# The driver's CORRECTNESS harness verifies only the FIRST 50 entries of
# ``queries()``.  Round-14 window (the standing rotation discipline,
# VERDICT r13 agenda #8):
# (1) the gates that are NEW or whose implementation/oracle changed
#     THIS round (a gate must be driver-attested in its landing round):
#     pq_adc_knn + opq_adc_knn (frozen-artifact conversions, VERDICT
#     r13 #2), delta_roundtrip (Delta interop, #6), mmr_rerank_diverse
#     (oracle gained the engine's zero-norm sim guard, ADVICE r13), and
#     maxsim_batch_range + maxsim_pq_batch_exhaustive (re-attest the
#     query-side collect paths behind the new corpus-size guard, #4),
#     and the probe-rung conversion wave — ann_ivf_probe,
#     ann_ivf_batch_probe, ann_lsh_cosine, ann_lsh_filtered,
#     ivfpq_probe, maxsim_ivf_probe, maxsim_pq_probe,
#     semantic_dedup_clustered (frozen coarse quantizers / residual
#     codebooks / cosine cells / seed-determined hyperplanes: every
#     convertible probed path is now hash-gated — the r13 audit's
#     "possible in principle" set is empty);
# (2) the full r8-stale cohort — repetition_quality,
#     stratified_sample_docs, stream_ivfopq_append_exhaustive,
#     stream_maxsim_pq_append_exhaustive, stream_opq_append_rerank_full,
#     text_quality, token_stats, tpch_q3_shipping (histogram after r13:
#     8@r8, 49@r9, 46@r10, 48@r11, 33@r12, 50@r13);
# (3) oldest-first fill: 28 of the 49 r9-cohort gates, alphabetical.
# Composition: 50/50 slots oracle-backed — every window row is
# hash-comparable (all r8/r9-stale gates are oracle-backed this round).
# Rows-only gates keep their ORACLE_FULL sweep rows and their meta-test
# pins (test_driver_contract.py).
# Round-15 rotation (standing VERDICT item): new/changed gates first —
# delta_colmap_roundtrip + iceberg_roundtrip (new), sketch_stats_orders
# (rows-only → bounded-error hash conversion), delta_roundtrip (scratch
# path change) — then the oldest-attestation cohort computed from
# CORRECTNESS_r*.json: the 21 r9-attested gates + the r10 cohort
# alphabetically up to the 50-slot window.
_VERIFY_FIRST = [
    "delta_colmap_roundtrip",
    "iceberg_roundtrip",
    "sketch_stats_orders",
    "delta_roundtrip",
    "set_ops_nations",
    "stream_dedup_events",
    "stream_quota_sample",
    "stream_session_agg",
    "stream_sliding_agg",
    "stream_static_enrich",
    "stream_upsert_readback",
    "tpch_q10_returns",
    "tpch_q14_promo_share",
    "tpch_q16_supplier_cnt",
    "tpch_q17_small_qty",
    "tpch_q18_large_orders",
    "tpch_q19_disjunctive",
    "tpch_q20_volume_suppliers",
    "tpch_q22_no_urgent",
    "tpch_q2_min_cost",
    "tpch_q4_semijoin",
    "tpch_q7_nation_volume",
    "tpch_q9_profit",
    "window_event_gaps",
    "window_running_total",
    "ann_lsh_batch_filtered_exhaustive",
    "bigram_pmi_collocations",
    "c4_filter_summary",
    "chunk_dedup_docs",
    "cohort_retention_events",
    "collection_version_diff",
    "column_stats_lineitem",
    "correlation_matrix_lineitem",
    "dedup_clusters",
    "embedding_norm_extremes",
    "events_moving_avg",
    "fuzzy_entity_canonical",
    "grouping_sets_lineitem",
    "hamming_batch_filtered_exhaustive",
    "image_phash_neardup",
    "importance_sample_docs",
    "ivfpq_batch_exhaustive",
    "ivfpq_filtered_exhaustive",
    "knn_batch",
    "knn_filtered_neq",
    "knn_hamming",
    "knn_hamming_batch",
    "knn_hamming_rerank",
    "knn_l2",
    "knn_page_two",
]


def _ordered(registered: dict) -> dict:
    out = {k: registered[k] for k in _VERIFY_FIRST if k in registered}
    out.update((k, v) for k, v in registered.items() if k not in out)
    return out


QUERIES = _ordered(_REGISTERED)

__all__ = ["ORACLES", "QUERIES", "query"]
