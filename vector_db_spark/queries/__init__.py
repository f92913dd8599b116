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
# ``queries()``.  Round-11 window (VERDICT r10 agenda #4: oldest-first
# rotation over the registry):
# (1) the five NEW round-11 gates (graph-/LSH-family range search, the
#     batched exact + batched IVF range search, the capped MinHash
#     production twin);
# (2) gates whose implementation changed this round — the cosine
#     zero-norm backfill admission fix rewired graph search/search_batch
#     (ann_graph_filtered_exhaustive). knn_page grew an Arrow keyset arm
#     but its GATE runs at fixture dims on the byte-identical expr arm,
#     so its r10 row stands; the Arrow arm is pinned by contract tests;
# (3) oldest-first fill: ALL 44 gates whose newest driver attestation is
#     <= r4 (6 at r3, 38 at r4 — recomputed from CORRECTNESS_r01-r10).
#     This also covers the zonemap gates (two-level manifest rewrite) and
#     train_eval_split_docs (NULL-sentinel fix) directly.
# Everything else keeps its r5+ rows; ORACLE_FULL_r10 re-swept the whole
# registry at sf0.01 with 0 failures and the r11 sweep repeats that.
_VERIFY_FIRST = [
    "ann_graph_range_exhaustive",
    "ann_lsh_range_exhaustive",
    "knn_batch_range",
    "ann_ivf_batch_range",
    "minhash_lsh_neardup_capped",
    "ann_graph_filtered_exhaustive",
    "tpch_q8_market_share",
    "train_eval_split_docs",
    "training_shuffle_docs",
    "unigram_lm_score",
    "user_value_anomalies",
    "value_histogram_events",
    "ann_graph_append_exhaustive",
    "ann_graph_batch_filtered_exhaustive",
    "ann_graph_delete_exhaustive",
    "ann_graph_ip_exhaustive",
    "ann_ivf_batch_cosine_full_probe",
    "ann_ivf_batch_ip_full_probe",
    "ann_ivf_delete_full_probe",
    "ann_ivf_knn_join_exhaustive",
    "ann_ivf_range_filtered",
    "ann_ivf_retrain_ip_full_probe",
    "ann_lsh_append_exhaustive",
    "ann_lsh_delete_exhaustive",
    "audio_fp_neardup",
    "fusion_weighted_search",
    "fuzzy_name_pairs",
    "heavy_hitters_mg",
    "ivfpq_append_exhaustive",
    "ivfpq_batch_filtered_exhaustive",
    "ivfpq_delete_exhaustive",
    "ivfsq_append_rerank_exhaustive",
    "ivfsq_batch_rerank_exhaustive",
    "ivfsq_decoded_full_probe",
    "ivfsq_delete_exhaustive",
    "ivfsq_rerank_exhaustive",
    "knn_classify",
    "maxsim_batch_search",
    "maxsim_filtered_search",
    "maxsim_label_search",
    "mixture_sample_docs",
    "pipeline_prepare_corpus_v3",
    "stream_ivf_append_full_probe",
    "stream_ivf_delete_full_probe",
    "substring_dedup_docs",
    "tfidf_top_terms",
    "tpch_q11_value_share",
    "zonemap_append_scan",
    "zonemap_pruned_scan",
    "zorder_box_scan",
]


def _ordered(registered: dict) -> dict:
    out = {k: registered[k] for k in _VERIFY_FIRST if k in registered}
    out.update((k, v) for k, v in registered.items() if k not in out)
    return out


QUERIES = _ordered(_REGISTERED)

__all__ = ["ORACLES", "QUERIES", "query"]
