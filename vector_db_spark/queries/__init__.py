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
# ``queries()``.  Cumulative state after round 5: every oracle-backed
# query has a green driver hash row in SOME round (VERDICT r5 registry
# audit), but the r5 backlog is zero, so round-6 spends the window on
# (1) the NEW round-6 gates (PLAID residual-PQ, HTTP transport,
#     streaming OPQ/IVF-OPQ append, the learned-embedding rung);
# (2) ``sketch_stats_orders`` — the one red r5 row, now returning scalar
#     quantile columns; its re-attestation is the round's first goal;
# (3) attestation FRESHNESS (VERDICT r5 item 5): the oldest gates — the
#     33 whose only green row is round 1 plus ``collection_index_lifecycle``
#     — so every §2 gate has a green row on post-refactor code;
# (4) the remaining slots on a cross-family sample of r2-only gates.
# Everything else keeps its earlier green rows.
_VERIFY_FIRST = [
    # --- (1) new round-6 gates ---
    "maxsim_pq_exhaustive",
    "maxsim_pq_batch_exhaustive",
    "maxsim_pq_filtered_exhaustive",
    "maxsim_pq_probe",
    "http_search_roundtrip",
    "stream_ivfopq_append_exhaustive",
    "stream_opq_append_rerank_full",
    "text_w2v_embed_ann",
    "maxsim_pq_delete_exhaustive",
    "stream_maxsim_pq_append_exhaustive",
    # --- (2) the r5 red row, fixed (scalar quantile columns) ---
    "sketch_stats_orders",
    # --- (3) oldest gates: only green row is round 1 ---
    "knn_filtered_eq",
    "knn_quantized_l2",
    "delete_then_search",
    "ann_ivf_full_probe",
    "ann_ivf_cosine_full_probe",
    "ann_ivf_ip_full_probe",
    "ann_ivf_batch_full_probe",
    "ivfpq_exhaustive",
    "pq_rerank_full_shortlist",
    "collection_index_lifecycle",
    "dedup_clusters",
    "embedding_neardup",
    "embedding_neardup_blocked",
    "neardup_jaccard",
    "neardup_char_jaccard",
    "doc_fingerprint",
    "decontamination",
    "stratified_sample_docs",
    "pack_sequences_docs",
    "pipeline_prepare_corpus",
    "bm25_topk_docs",
    "hybrid_search_rrf",
    "bpe_token_stats",
    "token_stats",
    "heavy_hitter_tokens",
    "lang_id_predict",
    "text_quality",
    "repetition_quality",
    "pii_redaction",
    "multimodal_image_features",
    "multimodal_resize",
    "multimodal_frame_sample",
    "multimodal_audio_features",
    "tpch_q3_shipping",
    # --- (4) cross-family sample of r2-only gates (fills to 50 exactly) ---
    "ann_graph_exhaustive",
    "ann_lsh_filtered_exhaustive",
    "asof_click_purchase",
    "collection_time_travel",
    "docstore_extract",
]


def _ordered(registered: dict) -> dict:
    out = {k: registered[k] for k in _VERIFY_FIRST if k in registered}
    out.update((k, v) for k, v in registered.items() if k not in out)
    return out


QUERIES = _ordered(_REGISTERED)

__all__ = ["ORACLES", "QUERIES", "query"]
