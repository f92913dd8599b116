"""Range-coverage harness (VERDICT r11 #5): coverage of the graph and
LSH range probes at serving knobs vs the exact batched range scan —
|returned ∩ true| / |true| per query, averaged. Every returned row is
EXACT by construction (both families verify per candidate), so coverage
is the only quality axis range has; this is the range twin of
tools/recall_bench.py's recall@k.

Measures 3 thresholds per family metric (narrow / serving / wide radii,
chosen so the true match sets are non-trivial at sf0.1 and sf1), at a
small serving rung AND the tuned rung picked by the range tuners
(operators/tuning.tune_graph_range / tune_lsh_range, coverage target
0.95). Usage:

    python tools/range_recall_bench.py [sf_dir]   # default sf0.1

Prints one JSON line:
{"metric": "range_coverage", "value": <min tuned coverage>,
 "graph": {"l2": {thr: {"serving": c, "tuned": c, "knobs": {...}}}},
 "lsh": {...}, "n_queries": N, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vector_db_spark.operators.ann import CosineLshIndex  # noqa: E402
from vector_db_spark.operators.graph import GraphAnnIndex  # noqa: E402
from vector_db_spark.operators.knn import batch_range_search  # noqa: E402
from vector_db_spark.operators.tuning import (  # noqa: E402
    _recall,
    _topk_sets,
    tune_graph_range,
    tune_lsh_range,
)
from vector_db_spark.session import get_spark  # noqa: E402
from vector_db_spark.sources.fixtures import load_table  # noqa: E402

N_QUERIES = 50
NLIST = 32
TARGET = 0.95
# thresholds per metric: narrow / serving / wide (l2 is squared distance —
# larger = wider; cosine is a similarity floor — smaller = wider)
GRAPH_THRESHOLDS = {"l2": (1.2, 1.6, 2.2), "cosine": (0.3, 0.15, 0.05)}
LSH_THRESHOLDS = {"cosine": (0.3, 0.15, 0.05)}
# the "serving" (untuned) rung coverage is reported against
GRAPH_SERVING = {"nprobe": 4, "ef_search": 64}
LSH_SERVING = {"probe_radius": 1}
# MaxSim section: doc population, query count, and the exact-score ranks
# that derive the three thresholds (narrow / serving / wide floors)
MS_NDOC = 499
MS_N_QUERIES = 12
MS_KS = (5, 20, 60)


def _coverage(exact: dict, rows, id_col: str) -> float:
    return _recall(exact, _topk_sets(rows, "query_id", id_col))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if len(sys.argv) > 1:
        sf_dir = sys.argv[1]
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    spark = get_spark("range_recall_bench")
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, sf_dir, "embeddings").cache()
    emb.count()
    queries = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        .cache()
    )
    queries.count()

    report: dict = {"graph": {}, "lsh": {}}
    tuned_covs: list[float] = []

    for metric, thresholds in GRAPH_THRESHOLDS.items():
        gidx = GraphAnnIndex.build(
            emb, nlist=NLIST, m=16, ef_construction=200, seed=42,
            max_iter=5, metric=metric,
        )
        gidx.graph.cache().count()
        per_thr: dict = {}
        for thr in thresholds:
            exact = _topk_sets(
                batch_range_search(emb, queries, thr, metric=metric).collect(),
                "query_id", "vec_id",
            )
            n_true = sum(len(v) for v in exact.values())
            serving = _coverage(
                exact,
                gidx.range_search_batch(queries, thr, **GRAPH_SERVING).collect(),
                "vec_id",
            )
            tuned = tune_graph_range(gidx, queries, thr, coverage_target=TARGET)
            per_thr[str(thr)] = {
                "true_matches": n_true,
                "serving": round(serving, 4),
                "tuned": round(tuned["coverage"], 4),
                "knobs": {k: tuned[k] for k in ("nprobe", "ef_search")},
                "evals": tuned["evals"],
            }
            tuned_covs.append(tuned["coverage"])
        report["graph"][metric] = per_thr
        gidx.graph.unpersist()

    lidx = CosineLshIndex.build(emb, dim=64, n_bits=8, n_tables=4, seed=42)
    lidx.buckets.cache().count()
    for metric, thresholds in LSH_THRESHOLDS.items():
        per_thr = {}
        for thr in thresholds:
            exact = _topk_sets(
                batch_range_search(emb, queries, thr, metric=metric).collect(),
                "query_id", "vec_id",
            )
            n_true = sum(len(v) for v in exact.values())
            serving = _coverage(
                exact,
                lidx.range_search_batch(
                    queries, thr, metric=metric, **LSH_SERVING
                ).collect(),
                "vec_id",
            )
            tuned = tune_lsh_range(
                lidx, queries, thr, coverage_target=TARGET, metric=metric
            )
            per_thr[str(thr)] = {
                "true_matches": n_true,
                "serving": round(serving, 4),
                "tuned": round(tuned["coverage"], 4),
                "knobs": {"probe_radius": tuned["probe_radius"]},
                "evals": tuned["evals"],
            }
            tuned_covs.append(tuned["coverage"])
        report["lsh"][metric] = per_thr
    lidx.buckets.unpersist()

    # MaxSim (round 12): probed range coverage over the token-IVF
    # candidate generation — docs are vec_id % 499 multi-vector groups,
    # queries the first MS_N_QUERIES docs' own 3-token windows, and the
    # thresholds derive from the data (the k-th exact score of a probe
    # query for k in MS_KS) so the section holds at every SF. Serving
    # rung = the wire default nprobe=4.
    from vector_db_spark.operators.late_interaction import (
        MaxSimIvfIndex,
        maxsim_range_search_batch,
        maxsim_search,
    )
    from vector_db_spark.operators.tuning import tune_maxsim_range

    corpus = emb.select(
        (F.col("vec_id") % MS_NDOC).alias("doc"), "embedding"
    ).cache()
    corpus.count()
    msidx = MaxSimIvfIndex.build(
        corpus, nlist=NLIST, doc_col="doc", max_iter=5
    )
    ms_live = msidx.ivf._live().cache()
    ms_live.count()
    qrows = [
        (int(r.vec_id) // 3, int(r.vec_id), [float(x) for x in r.embedding])
        for r in emb.filter(F.col("vec_id") < 3 * MS_N_QUERIES)
        .orderBy("vec_id")
        .collect()
    ]
    msq = spark.createDataFrame(
        qrows, "query_id long, token_id long, token_vec array<double>"
    ).cache()
    msq.count()
    probe_toks = [t for qid, _, t in qrows if qid == 0]
    anchor = maxsim_search(
        corpus, probe_toks, max(MS_KS), doc_col="doc"
    ).collect()
    per_thr = {}
    for k_anchor in MS_KS:
        thr = float(anchor[k_anchor - 1].maxsim_score)
        exact = _topk_sets(
            maxsim_range_search_batch(
                corpus, msq, thr, doc_col="doc"
            ).collect(),
            "query_id", "doc",
        )
        n_true = sum(len(v) for v in exact.values())
        serving = _coverage(
            exact,
            msidx.range_search_batch(msq, thr, nprobe=4).collect(),
            "doc",
        )
        tuned = tune_maxsim_range(msidx, msq, thr, coverage_target=TARGET)
        per_thr[f"k{k_anchor}"] = {
            "threshold": round(thr, 4),
            "true_matches": n_true,
            "serving": round(serving, 4),
            "tuned": round(tuned["coverage"], 4),
            "knobs": {"nprobe": tuned["nprobe"]},
            "evals": tuned["evals"],
        }
        tuned_covs.append(tuned["coverage"])
    report["maxsim"] = {"ip": per_thr}
    corpus.unpersist()
    msq.unpersist()
    ms_live.unpersist()

    print(json.dumps({
        "metric": "range_coverage",
        "value": round(min(tuned_covs), 4),
        **report,
        "coverage_target": TARGET,
        "n_queries": N_QUERIES,
        "nlist": NLIST,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
