"""Benchmark harness (driver contract + BASELINE.md §"bench configuration").

Runs the headline query set at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "headline_total", "value": N, "unit": "sec",
     "queries": {"knn_l2": s, ...}, "sf": 0.1}

Each query is forced end-to-end with the ``noop`` sink (full execution,
no driver-side row transfer), timed after one engine-wide warm-up action
so JVM/codegen startup isn't billed to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vector_db_spark.queries import QUERIES  # noqa: E402
from vector_db_spark.session import get_spark  # noqa: E402

# Representative engine paths: exact kNN (3 metrics + filter + batch), the
# ANN build+probe pipeline, LLM-pipeline dedup/text ops, and the relational
# join/agg/window suite. Names must exist in the queries() registry.
HEADLINE = [
    "knn_l2",
    "knn_cosine",
    "knn_filtered_neq",
    "knn_batch",
    "knn_quantized_l2",
    "ann_ivf_probe",
    "ann_ivf_batch_probe",
    "ann_lsh_cosine",
    "pq_adc_knn",
    "ivfpq_probe",
    "dedup_exact",
    "minhash_lsh_neardup",
    "simhash_neardup",
    "dedup_clusters",
    "embedding_neardup",
    "embedding_neardup_blocked",
    "text_quality",
    "repetition_quality",
    "pii_redaction",
    "pack_sequences_docs",
    "tpch_q1_pricing",
    "tpch_q3_shipping",
    "tpch_q5_region",
    "tpch_q17_small_qty",
    "cube_lineitem",
    "window_top_customers",
    "events_sessionization",
    "multimodal_image_features",
    "stream_tumbling_agg",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm up the session (JVM, codegen, parquet footer cache) off the clock.
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
