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
_VERIFY_FIRST = [
    "pq_adc_knn",
    "opq_adc_knn",
    "delta_roundtrip",
    "mmr_rerank_diverse",
    "maxsim_batch_range",
    "maxsim_pq_batch_exhaustive",
    "ann_ivf_probe",
    "ann_ivf_batch_probe",
    "ann_lsh_cosine",
    "ann_lsh_filtered",
    "ivfpq_probe",
    "maxsim_ivf_probe",
    "maxsim_pq_probe",
    "semantic_dedup_clustered",
    "repetition_quality",
    "stratified_sample_docs",
    "stream_ivfopq_append_exhaustive",
    "stream_maxsim_pq_append_exhaustive",
    "stream_opq_append_rerank_full",
    "text_quality",
    "token_stats",
    "tpch_q3_shipping",
    "ann_graph_batch_exhaustive",
    "ann_ivf_append_full_probe",
    "ann_ivf_batch_filtered_exhaustive",
    "ann_ivf_range_after_append",
    "ann_ivf_range_search",
    "ann_lsh_radius_exhaustive",
    "bigram_lm_score",
    "brand_part_agg",
    "bucketed_join_revenue",
    "collection_maxsim_lifecycle",
    "collection_tuned_serving",
    "csv_roundtrip_events",
    "cube_lineitem",
    "events_daily_funnel",
    "events_props_struct",
    "events_sliding",
    "events_tumbling",
    "http_maxsim_roundtrip",
    "json_roundtrip_events",
    "maxsim_pq_vacuum_exhaustive",
    "median_order_price",
    "ntile_customer_quartiles",
    "pipeline_prepare_corpus_v2",
    "pivot_order_status",
    "range_join_pairs",
    "rollup_lineitem",
    "salted_agg_lineitem",
    "scalar_functions",
]


def _ordered(registered: dict) -> dict:
    out = {k: registered[k] for k in _VERIFY_FIRST if k in registered}
    out.update((k, v) for k, v in registered.items() if k not in out)
    return out


QUERIES = _ordered(_REGISTERED)

__all__ = ["ORACLES", "QUERIES", "query"]
