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
# ``queries()``.  Round-9 window (VERDICT r8 agenda #2 — the r6/r7/r8
# windows were identical, leaving 130 gates with no green row on
# post-round-4 code):
# (1) the NEW round-9 gates — the MaxSim families through the catalog
#     (incremental refresh asserted) and the wire, plus the compressed
#     family's vacuum gate (the last cell of its maintenance matrix);
# (2) every gate whose newest green row is ROUND 2 (39 gates, recomputed
#     from CORRECTNESS_r1–r8 this round): the TPC-H declarations,
#     rollup/pivot/cube, set ops, windows, events, streaming state,
#     roundtrips — three rounds of refactors since last attested;
# (3) the oldest round-3-only gates, filling to exactly 50.
# Everything else keeps its earlier green rows.
_VERIFY_FIRST = [
    # --- (1) new round-9 gates ---
    "collection_maxsim_lifecycle",
    "http_maxsim_roundtrip",
    "maxsim_pq_vacuum_exhaustive",
    "collection_tuned_serving",
    "ann_lsh_radius_exhaustive",
    "semantic_decontamination",
    # --- (2) newest green row is round 2 ---
    "ann_ivf_append_full_probe",
    "ann_ivf_range_search",
    "brand_part_agg",
    "csv_roundtrip_events",
    "cube_lineitem",
    "events_daily_funnel",
    "events_props_struct",
    "events_sliding",
    "events_tumbling",
    "json_roundtrip_events",
    "median_order_price",
    "ntile_customer_quartiles",
    "pipeline_prepare_corpus_v2",
    "pivot_order_status",
    "range_join_pairs",
    "rollup_lineitem",
    "salted_agg_lineitem",
    "scalar_functions",
    "set_ops_nations",
    "stream_dedup_events",
    "stream_quota_sample",
    "stream_session_agg",
    "stream_sliding_agg",
    "stream_static_enrich",
    "stream_upsert_readback",
    "tpch_q2_min_cost",
    "tpch_q4_semijoin",
    "tpch_q7_nation_volume",
    "tpch_q9_profit",
    "tpch_q10_returns",
    "tpch_q14_promo_share",
    "tpch_q16_supplier_cnt",
    "tpch_q17_small_qty",
    "tpch_q18_large_orders",
    "tpch_q19_disjunctive",
    "tpch_q20_volume_suppliers",
    "tpch_q22_no_urgent",
    "window_event_gaps",
    "window_running_total",
    # --- (3) oldest round-3-only gates (fills to 50 exactly; two were
    # ceded to the round-9 additions above — they rotate back next) ---
    "ann_graph_batch_exhaustive",
    "ann_ivf_batch_filtered_exhaustive",
    "ann_ivf_range_after_append",
    "bigram_lm_score",
    "bucketed_join_revenue",
]


def _ordered(registered: dict) -> dict:
    out = {k: registered[k] for k in _VERIFY_FIRST if k in registered}
    out.update((k, v) for k, v in registered.items() if k not in out)
    return out


QUERIES = _ordered(_REGISTERED)

__all__ = ["ORACLES", "QUERIES", "query"]
