"""Tuned-recall harness for the multi-vector PLAID families (VERDICT r8
agenda #3 — the RECALL line `tests/test_tuning.py` cites).

Builds the raw (`MaxSimIvfIndex`) and residual-PQ (`MaxSimPqIndex`)
token indexes over a multi-vector corpus derived from the embeddings
fixture (doc = vec_id // 8 → 8-token documents), then runs
`tuning.tune_maxsim` (recall@K vs the exact batch MaxSim operator, cost-
ordered (nprobe, shortlist) ladder with doc-granular escalation) on a
bounded multi-token query sample. Prints ONE JSON line:

{"metric": "maxsim_recall@10", "value": <pq tuned recall>,
 "maxsim_tuned": {...}, "maxsim_pq_tuned": {...},
 "n_docs": D, "n_queries": Q, "nlist": L, "sf": ...}

Usage: python tools/maxsim_recall.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vector_db_spark.operators.late_interaction import (  # noqa: E402
    MaxSimIvfIndex,
    MaxSimPqIndex,
)
from vector_db_spark.operators.tuning import tune_maxsim  # noqa: E402
from vector_db_spark.session import get_spark  # noqa: E402
from vector_db_spark.sources.fixtures import load_table  # noqa: E402

K = 10
N_QUERIES = 16
TOKS_PER_QUERY = 3
TOKS_PER_DOC = 8
NLIST = 32
TARGET = 0.95


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if len(sys.argv) > 1:
        sf_dir = sys.argv[1]
    sf = float(
        os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1"
    )
    spark = get_spark("maxsim_recall")
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.select(
        (F.col("vec_id") / TOKS_PER_DOC).cast("long").alias("doc"), "embedding"
    ).cache()
    n_docs = corpus.select("doc").distinct().count()

    qrows = [
        (int(r.vec_id) // TOKS_PER_QUERY, int(r.vec_id),
         [float(x) for x in r.embedding])
        for r in emb.filter(F.col("vec_id") < N_QUERIES * TOKS_PER_QUERY)
        .orderBy("vec_id")
        .collect()
    ]
    sample = spark.createDataFrame(
        qrows, "query_id long, token_id long, token_vec array<double>"
    )

    ms = MaxSimIvfIndex.build(corpus, nlist=NLIST, doc_col="doc", max_iter=10)
    ms.ivf.assignments.cache().count()
    ms_tuned = tune_maxsim(ms, sample, k=K, recall_target=TARGET)

    # reuse the fitted token IVF for the compressed family (the faiss
    # composition MaxSimPqIndex.build exposes) — same cells, same probes,
    # so the two tuned lines isolate the codes' effect
    pq = MaxSimPqIndex.build(
        corpus, m=8, ksub=32, doc_col="doc", pq_iters=10, msivf=ms
    )
    pq_tuned = tune_maxsim(pq, sample, k=K, recall_target=TARGET)

    out = {
        "metric": f"maxsim_recall@{K}",
        "value": pq_tuned["recall"],
        "maxsim_tuned": ms_tuned,
        "maxsim_pq_tuned": pq_tuned,
        "n_docs": n_docs,
        "n_queries": N_QUERIES,
        "nlist": NLIST,
        "sf": sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
