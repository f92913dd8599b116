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
# ``queries()``.
# Round-15 rotation (standing VERDICT item): new/changed gates first —
# delta_colmap_roundtrip + iceberg_roundtrip + iceberg_v2_deletes_
# roundtrip (new), sketch_stats_orders (rows-only → bounded-error hash
# conversion), delta_roundtrip (scratch-path change) — then the
# oldest-attestation cohort computed from CORRECTNESS_r*.json: the 21
# r9-attested gates + the r10 cohort alphabetically up to the 50-slot
# window. 50/50 slots oracle-backed; rows-only gates keep their
# ORACLE_FULL sweep rows and their meta-test pins.
_VERIFY_FIRST = [
    "delta_colmap_roundtrip",
    "iceberg_roundtrip",
    "iceberg_v2_deletes_roundtrip",
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
]


def _ordered(registered: dict) -> dict:
    out = {k: registered[k] for k in _VERIFY_FIRST if k in registered}
    out.update((k, v) for k, v in registered.items() if k not in out)
    return out


QUERIES = _ordered(_REGISTERED)

__all__ = ["ORACLES", "QUERIES", "query"]
