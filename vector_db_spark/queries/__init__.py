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
# ``queries()``.  Cumulative state after round 4: ALL oracle-backed
# queries in the registry have a green driver hash row (r1-r4; VERDICT r4
# "0 never-attested").  Round-5 ordering (VERDICT r4 item 7):
# (1) the four NEW round-5 gates (PLAID MaxSim-IVF, OPQ rung);
# (2) every gate whose code path CHANGED this round (video blocking
#     rewrite, refresh resurrect fix, copurchase confidence column,
#     shared 5-NN edge artifact + auto mass units for the graph trio);
# (3) freshness re-attestation of all 17 pre-round rows-only probes;
# (4) a rotating cross-family sample of r1/r2-attested gates at the
#     CURRENT code.  Everything else keeps its earlier green rows.
_VERIFY_FIRST = [
    # --- (1) new round-5 gates ---
    "maxsim_ivf_exhaustive",
    "maxsim_ivf_batch_exhaustive",
    "opq_rerank_full",
    "ivfopq_exhaustive",
    "ivfopq_batch_exhaustive",
    "stream_maxsim_append_exhaustive",
    "opq_filtered_rerank_exhaustive",
    "ivfopq_filtered_exhaustive",
    "maxsim_ivf_filtered_exhaustive",
    "collection_ivfopq_lifecycle",
    "text_hash_embed_docs",
    "text_embed_corpus_stats",
    "maxsim_ivf_probe",
    "opq_adc_knn",
    # --- (2) gates over round-5-changed code paths ---
    "video_phash_neardup",
    "collection_incremental_refresh",
    "copurchase_lift",
    "pagerank_knn_graph",
    "label_propagation_knn",
    "triangle_participation_knn",
    # --- (3) rows-only probes: freshness re-attestation ---
    "mmr_rerank_diverse",
    "rocchio_expanded_search",
    "pca_shortlist_search",
    "semantic_dedup_clustered",
    "bpe_vocab_docs",
    "quality_classifier_score",
    "bpe_tokenize_docs",
    "minhash_lsh_neardup",
    "simhash_neardup",
    "ann_ivf_probe",
    "ann_lsh_cosine",
    "ann_lsh_filtered",
    "ann_ivf_batch_probe",
    "pq_adc_knn",
    "ivfpq_probe",
    "ann_graph_nsw",
    "sketch_stats_orders",
    # --- (4) rotating freshness sample of early-round gates ---
    "knn_l2",
    "knn_ip",
    "knn_cosine",
    "knn_filtered_neq",
    "knn_batch",
    "point_lookup",
    "upsert_readback",
    "tpch_q1_pricing",
    "tpch_q5_region",
    "window_top_customers",
    "events_sessionization",
    "dedup_exact",
    "stream_tumbling_agg",
]


def _ordered(registered: dict) -> dict:
    out = {k: registered[k] for k in _VERIFY_FIRST if k in registered}
    out.update((k, v) for k, v in registered.items() if k not in out)
    return out


QUERIES = _ordered(_REGISTERED)

__all__ = ["ORACLES", "QUERIES", "query"]
