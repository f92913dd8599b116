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
# ``queries()``.  Round-13 window (VERDICT r12 agenda #3: retire the
# attestation-stale tail, keep the window's rows-only density LOW —
# r12's 16/50 diluted the hash-exact signal):
# (1) the five r5-stale gates the late-landing MaxSim-range cohort
#     displaced from the r12 window (tpch_q5_region,
#     triangle_participation_knn, upsert_readback, video_phash_neardup,
#     window_top_customers) — the only attestations older than r8;
# (2) the gates whose implementation or oracle changed THIS round (a
#     gate must be driver-attested in its landing round):
#     quality_classifier_score, rocchio_expanded_search,
#     mmr_rerank_diverse, bpe_tokenize_docs, bpe_vocab_docs and
#     pca_shortlist_search (the six rows-only → hash-exact conversions,
#     VERDICT r12 #4) and maxsim_batch_range (the batch range core now
#     folds pre-collected rows — ADVICE r12);
# (3) oldest-first fill: 38 of the 46 ORACLE-BACKED r8-cohort gates,
#     alphabetical (histogram after r12: 5@r5, 49@r8, 49@r9, 49@r10,
#     49@r11, 50@r12; the eight r8 leftovers —
#     repetition_quality, stratified_sample_docs,
#     stream_ivfopq_append_exhaustive, stream_maxsim_pq_append_exhaustive,
#     stream_opq_append_rerank_full, text_quality, token_stats,
#     tpch_q3_shipping — plus the three r8 rows-only gates lead the r14
#     fill).
# Composition: 50/50 slots oracle-backed — every window row this round
# is hash-comparable. Rows-only gates keep their ORACLE_FULL sweep rows
# and their meta-test pins (test_driver_contract.py).
_VERIFY_FIRST = [
    "tpch_q5_region",
    "triangle_participation_knn",
    "upsert_readback",
    "video_phash_neardup",
    "window_top_customers",
    "quality_classifier_score",
    "rocchio_expanded_search",
    "mmr_rerank_diverse",
    "bpe_tokenize_docs",
    "bpe_vocab_docs",
    "pca_shortlist_search",
    "maxsim_batch_range",
    "ann_graph_exhaustive",
    "ann_ivf_batch_full_probe",
    "ann_ivf_cosine_full_probe",
    "ann_ivf_full_probe",
    "ann_ivf_ip_full_probe",
    "ann_lsh_filtered_exhaustive",
    "asof_click_purchase",
    "bm25_topk_docs",
    "bpe_token_stats",
    "collection_index_lifecycle",
    "collection_time_travel",
    "decontamination",
    "delete_then_search",
    "doc_fingerprint",
    "docstore_extract",
    "embedding_neardup",
    "embedding_neardup_blocked",
    "heavy_hitter_tokens",
    "http_search_roundtrip",
    "hybrid_search_rrf",
    "ivfpq_exhaustive",
    "knn_filtered_eq",
    "knn_quantized_l2",
    "lang_id_predict",
    "maxsim_pq_batch_exhaustive",
    "maxsim_pq_delete_exhaustive",
    "maxsim_pq_exhaustive",
    "maxsim_pq_filtered_exhaustive",
    "multimodal_audio_features",
    "multimodal_frame_sample",
    "multimodal_image_features",
    "multimodal_resize",
    "neardup_char_jaccard",
    "neardup_jaccard",
    "pack_sequences_docs",
    "pii_redaction",
    "pipeline_prepare_corpus",
    "pq_rerank_full_shortlist",
]


def _ordered(registered: dict) -> dict:
    out = {k: registered[k] for k in _VERIFY_FIRST if k in registered}
    out.update((k, v) for k, v in registered.items() if k not in out)
    return out


QUERIES = _ordered(_REGISTERED)

__all__ = ["ORACLES", "QUERIES", "query"]
