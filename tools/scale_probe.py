"""sf1 scale probe (VERDICT r3 item 8).

Times the most expensive / most cliff-prone headline queries at sf0.1 and
at the replicated sf1 fixture (tools/make_scale.py, 10x rows with
preserved join fanout), then reports the observed scaling ratio against
the 10x-linear expectation. A query is flagged when

    t(sf1) > 2 * REP * t(sf0.1)

— the same ">2x expected linear scaling" bar VERDICT r3 set. Fixed
per-query overheads (job scheduling, plan compile) make ratios UNDER
REP the normal healthy reading at these absolute sizes.

Output: one JSON line {"probes": {name: {"sf01": s, "sf1": s,
"ratio": r, "flag": bool}}, "rep": REP}.

Usage: python tools/scale_probe.py [names...]  (default: the built-in set)
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd  # noqa: F401  (pandas_udf lazy annotation resolution)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vector_db_spark.queries import QUERIES  # noqa: E402
from vector_db_spark.session import get_spark  # noqa: E402

REP = int(os.environ.get("SPARK_GRAFT_PROBE_REP", "10"))
SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_scale/sf1")

# Per-entry replica-factor overrides (round 14, the sf10 probe): the
# sf10 fixture scales each DOMAIN to where its operators are stressed
# (documents x1000, embeddings x100, relational/events x10 vs sf0.1 —
# see tools/make_scale.py), so vs the uniformly-x10 sf1 baseline a
# document entry's linear expectation is x100, an embedding entry's is
# x10, and an events/lineitem entry's is x1. JSON env, e.g.
# SPARK_GRAFT_ENTRY_REPS='{"tfidf_top_terms": 100}'.
ENTRY_REPS: dict[str, int] = json.loads(
    os.environ.get("SPARK_GRAFT_ENTRY_REPS", "{}")
)

# The shapes VERDICT r3 called most likely to hide a cliff (dedup, fuzzy,
# connected components) + the most expensive headline entries + one
# join-heavy and one window-heavy relational representative.
DEFAULT = [
    "dedup_exact",
    "dedup_clusters",
    "dedup_clusters_lsh",
    "chunk_dedup_docs",
    "minhash_lsh_neardup_capped",
    "simhash_neardup",
    "semantic_dedup_clustered",
    "fuzzy_name_pairs",
    "fuzzy_entity_canonical",
    "bigram_lm_score",
    "repetition_quality",
    "text_quality",
    "knn_l2",
    "knn_quantized_l2",
    "embedding_neardup_blocked",
    "substring_dedup_docs",
    "maxsim_label_search",
    "maxsim_range",
    "maxsim_batch_range",
    "image_phash_neardup",
    "tpch_q3_shipping",
    "tpch_q5_region",
    "cube_lineitem",
    "events_sessionization",
]

# Policy (VERDICT r10 #6): oracle anchors that are quadratic BY
# CONSTRUCTION — their whole point is value-equivalence with an
# all-pairs / DuckDB-checkable formulation — are probed at oracle SFs
# only. Probing a deliberately-quadratic gate at sf1 measures the
# quadratic we already documented and burns the probe budget (r10:
# semantic_dedup_exhaustive 55.5 s, ratio 14.1, exactly as designed).
# The probe substitutes each anchor's production twin and says so.
ORACLE_ANCHORS = {
    "semantic_dedup_exhaustive": "semantic_dedup_clustered",
    "embedding_neardup": "embedding_neardup_blocked",
    "minhash_lsh_neardup": "minhash_lsh_neardup_capped",
}


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    resolved = []
    for n in names:
        if n in ORACLE_ANCHORS:
            twin = ORACLE_ANCHORS[n]
            print(
                f"  {n}: oracle anchor (by-construction all-pairs) — "
                f"probing production twin {twin} instead",
                file=sys.stderr,
            )
            n = twin
        if n not in resolved:
            resolved.append(n)
    names = resolved
    spark = get_spark("scale_probe")
    spark.sparkContext.setLogLevel("ERROR")

    # same warm-up policy as bench.py: JVM + Arrow worker pool off the clock
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    spark.range(1_000_000).selectExpr("sum(id)").collect()

    @pandas_udf("double")
    def _warm(v: pd.Series) -> pd.Series:
        return v * 1.0

    (
        spark.range(128, numPartitions=32)
        .select(_warm(F.col("id").cast("double")))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    runs = int(os.environ.get("SPARK_GRAFT_PROBE_RUNS", "2"))

    def run(name: str, sf_dir: str) -> float:
        # min over N runs: single-shot readings on a long-lived session
        # were measured up to 6x off (GC/codegen/JIT interleave); min is
        # the steady-state cost the scaling ratio should compare.
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        return best

    probes = {}
    for name in names:
        rep = ENTRY_REPS.get(name, REP)
        t01 = run(name, SF01)
        t1 = run(name, SF1)
        ratio = t1 / t01 if t01 > 0 else float("inf")
        probes[name] = {
            "sf01": round(t01, 3),
            "sf1": round(t1, 3),
            "ratio": round(ratio, 2),
            "rep": rep,
            "flag": ratio > 2 * rep,
        }
        print(
            f"  {name}: {t01:.2f}s -> {t1:.2f}s  ({ratio:.1f}x vs {rep}x linear)",
            file=sys.stderr,
        )

    print(
        json.dumps(
            {
                "probes": probes,
                "rep": REP,
                "base_dir": SF01,
                "sf1_dir": SF1,
            }
        )
    )


if __name__ == "__main__":
    main()
