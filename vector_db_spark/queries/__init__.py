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
# ``queries()``.  Rounds 1-3 attested 150 slots (142 distinct queries
# value-green).  Round-4 rotation (VERDICT.md round 3, "Next round" item
# 1): slots 1-7 are the ONLY oracle-backed queries that have never had a
# driver row (all late-round-3 additions, locally value-exact at
# sf0.001/sf0.01).  The slots after them hold new round-4 gate queries as
# they land (ANN tombstone deletes, graph ip metric, filtered graph/IVF-PQ
# batch, streaming IVF append), then rows-only probes for attestation
# refresh.  Previously-attested queries rotate to the back and keep their
# earlier green rows.
_VERIFY_FIRST = [
    # --- the 7 never-attested round-3 queries (VERDICT r3 item 1) ---
    "fuzzy_name_pairs",
    "fuzzy_entity_canonical",
    "zonemap_pruned_scan",
    "zorder_box_scan",
    "ann_ivf_retrain_ip_full_probe",
    "ann_ivf_batch_cosine_full_probe",
    "ann_ivf_batch_ip_full_probe",
    # --- new round-4 gate queries (registered this round) ---
    "ann_ivf_delete_full_probe",
    "ann_lsh_delete_exhaustive",
    "ann_graph_delete_exhaustive",
    "ivfpq_delete_exhaustive",
    "ann_graph_ip_exhaustive",
    "ann_graph_batch_filtered_exhaustive",
    "ivfpq_batch_filtered_exhaustive",
    "stream_ivf_append_full_probe",
    # --- round-4 session-2 additions: IVF-SQ family, MaxSim late
    # interaction, weighted fusion, mixture sampling ---
    "ivfsq_decoded_full_probe",
    "ivfsq_rerank_exhaustive",
    "ivfsq_batch_rerank_exhaustive",
    "ivfsq_delete_exhaustive",
    "maxsim_label_search",
    "fusion_weighted_search",
    "mixture_sample_docs",
    "ann_ivf_knn_join_exhaustive",
    "tpch_q11_value_share",
    "maxsim_batch_search",
    "stream_ivf_delete_full_probe",
    "image_phash_neardup",
    "audio_fp_neardup",
    "video_phash_neardup",
    "substring_dedup_docs",
    "maxsim_filtered_search",
    "ivfsq_append_rerank_exhaustive",
    "pipeline_prepare_corpus_v3",
    "ann_ivf_range_filtered",
    "ann_lsh_append_exhaustive",
    "ivfpq_append_exhaustive",
    "ann_graph_append_exhaustive",
    "collection_incremental_refresh",
    "zonemap_append_scan",
    "tfidf_top_terms",
    "knn_classify",
    "copurchase_lift",
    "pagerank_knn_graph",
    "heavy_hitters_mg",
    "label_propagation_knn",
    "triangle_participation_knn",
    # --- rows-only probe paths: attestation refresh (rows-only rows);
    # their exhaustive SQL-backed counterparts are already green and
    # recall pins in tests/ guard probe quality ---
    "mmr_rerank_diverse",
    "rocchio_expanded_search",
    "pca_shortlist_search",
    "semantic_dedup_clustered",
    "bpe_vocab_docs",
    "quality_classifier_score",
    "bpe_tokenize_docs",
    "minhash_lsh_neardup",
    "simhash_neardup",
]


def _ordered(registered: dict) -> dict:
    out = {k: registered[k] for k in _VERIFY_FIRST if k in registered}
    out.update((k, v) for k, v in registered.items() if k not in out)
    return out


QUERIES = _ordered(_REGISTERED)

__all__ = ["ORACLES", "QUERIES", "query"]
