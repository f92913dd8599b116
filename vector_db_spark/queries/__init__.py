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
# ``queries()``.  Round-10 window (VERDICT r9 agenda #6: oldest-first
# rotation over the registry):
# (1) the NEW round-10 gate (dedup_clusters_lsh) plus every gate whose
#     implementation changed this round — the star-contraction connected
#     components rewrote the clustering path under dedup_clusters /
#     fuzzy_entity_canonical / semantic_dedup_* / image_phash_neardup,
#     the _lsh_buckets refactor sits under minhash_lsh_neardup, the
#     Arrow-dispatch edit touched knn()/batch_knn(), and the zero-norm
#     guard touched semantic_decontamination;
# (2) oldest-first fill to exactly 50 from the per-gate newest driver
#     round (recomputed from CORRECTNESS_r01-r09): the single round-2
#     straggler, then the round-3 cohort.
# Everything else keeps its earlier green rows (ORACLE_FULL_r09 re-swept
# the whole registry at sf0.01 with 0 failures).
_VERIFY_FIRST = [
    # --- (1) new + changed-this-round ---
    "dedup_clusters_lsh",
    "dedup_clusters",
    "minhash_lsh_neardup",
    "image_phash_neardup",
    "fuzzy_entity_canonical",
    "semantic_dedup_exhaustive",
    "semantic_dedup_clustered",
    "knn_l2",
    "knn_batch",
    "knn_filtered_neq",
    "semantic_decontamination",
    # --- (2) oldest-first: r2, then the r3 cohort ---
    "ann_graph_filtered_exhaustive",
    "ann_lsh_batch_filtered_exhaustive",
    "bigram_pmi_collocations",
    "c4_filter_summary",
    "chunk_dedup_docs",
    "cohort_retention_events",
    "collection_version_diff",
    "column_stats_lineitem",
    "correlation_matrix_lineitem",
    "embedding_norm_extremes",
    "events_moving_avg",
    "grouping_sets_lineitem",
    "hamming_batch_filtered_exhaustive",
    "importance_sample_docs",
    "ivfpq_batch_exhaustive",
    "ivfpq_filtered_exhaustive",
    "knn_hamming",
    "knn_hamming_batch",
    "knn_hamming_rerank",
    "knn_page_two",
    "label_centroids",
    "orc_roundtrip_events",
    "order_price_percentiles",
    "pca_rerank_full_rank",
    "pq_filtered_rerank_exhaustive",
    "rag_chunk_docs",
    "salted_join_priority_revenue",
    "skipgram_pairs_docs",
    "source_cap_docs",
    "source_profile",
    "stream_ann_search",
    "stream_chunk_dedup",
    "stream_doc_dedup",
    "stream_stream_join",
    "tpch_q12_priority_class",
    "tpch_q13_custdist",
    "tpch_q15_top_supplier",
    "tpch_q21_sole_blame",
    "tpch_q6_forecast",
]


def _ordered(registered: dict) -> dict:
    out = {k: registered[k] for k in _VERIFY_FIRST if k in registered}
    out.update((k, v) for k, v in registered.items() if k not in out)
    return out


QUERIES = _ordered(_REGISTERED)

__all__ = ["ORACLES", "QUERIES", "query"]
