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
    streaming_queries,
    vector_queries,
)

# The driver's CORRECTNESS harness verifies only the FIRST 50 entries of
# ``queries()``.  Rounds 1+2 attested 99 queries (92 value-green, 7
# rows-only); this round-3 rotation front-loads ALL 44 remaining
# oracle-backed queries that have never had a driver row (VERDICT.md round
# 2, "Next round" item 1 — the full set, not the partial 26-item queue the
# round-2 comment carried).  Previously-attested queries rotate to the back
# and keep their earlier green rows.  Slots 45-50 hold new round-3 gate
# queries (filtered batch ANN, append-radii correctness).
_VERIFY_FIRST = [
    # binary / hamming family (r2 additions, locally green)
    "knn_hamming",
    "knn_hamming_rerank",
    "knn_hamming_batch",
    "knn_page_two",
    # filtered PQ / IVF-PQ exhaustive gates
    "pq_filtered_rerank_exhaustive",
    "ivfpq_filtered_exhaustive",
    "pca_rerank_full_rank",
    # collections / DML
    "collection_version_diff",
    # vector & corpus analytics
    "label_centroids",
    "embedding_norm_extremes",
    "column_stats_lineitem",
    "value_histogram_events",
    "correlation_matrix_lineitem",
    "user_value_anomalies",
    "source_profile",
    # sampling / splits
    "train_eval_split_docs",
    "training_shuffle_docs",
    "importance_sample_docs",
    # LM & tokenization pipeline
    "unigram_lm_score",
    "bigram_lm_score",
    "bigram_pmi_collocations",
    "skipgram_pairs_docs",
    "rag_chunk_docs",
    "source_cap_docs",
    "chunk_dedup_docs",
    "c4_filter_summary",
    "semantic_dedup_exhaustive",
    # relational part 3 (TPC-H remainder)
    "tpch_q6_forecast",
    "tpch_q8_market_share",
    "tpch_q12_priority_class",
    "tpch_q13_custdist",
    "tpch_q15_top_supplier",
    "tpch_q21_sole_blame",
    "grouping_sets_lineitem",
    "order_price_percentiles",
    "events_moving_avg",
    "cohort_retention_events",
    # sources / sinks
    "orc_roundtrip_events",
    "bucketed_join_revenue",
    "salted_join_priority_revenue",
    # streaming remainder
    "stream_stream_join",
    "stream_ann_search",
    "stream_doc_dedup",
    "stream_chunk_dedup",
    # --- new round-3 gate queries (registered this round); with the 44
    # above the window is exactly 50 ---
    "ann_ivf_batch_filtered_exhaustive",
    "hamming_batch_filtered_exhaustive",
    "ann_ivf_range_after_append",
    "ann_lsh_batch_filtered_exhaustive",
    "ann_graph_batch_exhaustive",
    "ivfpq_batch_exhaustive",
    # rows-only probe paths sit past the 50-query window: their exhaustive
    # SQL-backed counterparts are (or were) in a window, and recall pins in
    # tests/ guard probe quality.
    "mmr_rerank_diverse",
    "rocchio_expanded_search",
    "pca_shortlist_search",
    "semantic_dedup_clustered",
    "bpe_vocab_docs",
    "quality_classifier_score",
    "bpe_tokenize_docs",
]

# After this round every oracle-backed query registered BEFORE the window
# froze has a hard driver attestation (r1: 50, r2: 50, r3: the remaining
# 44 + 6 new gates).  ROUND-4 QUEUE: front-load the late-r3 additions
# ann_ivf_batch_cosine_full_probe + ann_ivf_batch_ip_full_probe +
# ann_ivf_retrain_ip_full_probe + zonemap_pruned_scan + zorder_box_scan
# + fuzzy_name_pairs + fuzzy_entity_canonical (all locally
# value-exact at sf0.001/sf0.01), any new round-4 queries, then the 10
# rows-only probes for rows-only attestation refresh.


def _ordered(registered: dict) -> dict:
    out = {k: registered[k] for k in _VERIFY_FIRST if k in registered}
    out.update((k, v) for k, v in registered.items() if k not in out)
    return out


QUERIES = _ordered(_REGISTERED)

__all__ = ["ORACLES", "QUERIES", "query"]
