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
# Round-15 rotation, updated by the OPTIMIZATION pass (standing VERDICT
# rotation rule: new/changed gates first, then the oldest-attested
# cohort):
#   1-5   the r15-BUILD gates that have never been driver-attested
#         (Iceberg v1/v2 readers, Delta column mapping, the
#         sketch_stats bounded-error conversion, the delta scratch-path
#         change);
#   6-34  every gate whose COMPUTATION PATH the r15 optimization pass
#         touched: star-contraction/min-label lazy checkpoints
#         (dedup_clusters, semantic_dedup_exhaustive), the sparse
#         pagerank/LPA round rewrites and their shared unroll-built
#         5-NN edge artifact (pagerank/LPA/triangles), the
#         copurchase exchange-sharing, the batch-kNN dim hint + the
#         unroll flag plumbing (knn_* family), the PQ/OPQ
#         dim-from-sample fit change (pq/opq_adc_knn), the cached
#         event staging (stream_* drains), and the maxsim scorers the
#         unroll experiment traversed (reverted, but re-attest);
#   35-50 the oldest-attested cohort carried from the build rotation.
# 50/50 slots oracle-backed; rows-only gates keep their ORACLE_FULL
# sweep rows and their meta-test pins.
_VERIFY_FIRST = [
    "delta_colmap_roundtrip",
    "iceberg_roundtrip",
    "iceberg_v2_deletes_roundtrip",
    "sketch_stats_orders",
    "delta_roundtrip",
    "pagerank_knn_graph",
    "label_propagation_knn",
    "triangle_participation_knn",
    "copurchase_lift",
    "dedup_clusters",
    "semantic_dedup_exhaustive",
    "knn_batch_range",
    "knn_batch",
    "knn_l2",
    "knn_ip",
    "knn_cosine",
    "knn_filtered_neq",
    "knn_hamming",
    "knn_hamming_batch",
    "knn_hamming_rerank",
    "pq_adc_knn",
    "opq_adc_knn",
    "stream_tumbling_agg",
    "stream_session_agg",
    "stream_sliding_agg",
    "stream_dedup_events",
    "stream_quota_sample",
    "maxsim_label_search",
    "maxsim_range",
    "maxsim_batch_range",
    "ann_lsh_batch_filtered_exhaustive",
    "hamming_batch_filtered_exhaustive",
    "chunk_dedup_docs",
    "image_phash_neardup",
    "set_ops_nations",
    "stream_static_enrich",
    "stream_upsert_readback",
    "tpch_q10_returns",
    "tpch_q14_promo_share",
    "tpch_q16_supplier_cnt",
    "tpch_q17_small_qty",
    "tpch_q18_large_orders",
    "tpch_q19_disjunctive",
    "tpch_q2_min_cost",
    "tpch_q4_semijoin",
    "tpch_q9_profit",
    "window_event_gaps",
    "window_running_total",
    "bigram_pmi_collocations",
    "collection_version_diff",
]


def _ordered(registered: dict) -> dict:
    out = {k: registered[k] for k in _VERIFY_FIRST if k in registered}
    out.update((k, v) for k, v in registered.items() if k not in out)
    return out


QUERIES = _ordered(_REGISTERED)

__all__ = ["ORACLES", "QUERIES", "query"]
