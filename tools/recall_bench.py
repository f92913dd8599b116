"""ANN recall harness: recall@k of the approximate paths vs the
oracle-verified exact operator (BASELINE.md target: recall@10 ≥ 0.95 at
tuned params, sf0.1).

Usage: python tools/recall_bench.py [sf_dir] — prints one JSON line:
{"metric":"ann_recall@10", "value":<ivf tuned recall>, "ivf":{nprobe:r},
 "lsh":{radius:r}, "n_queries":N, "sf":...}
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vector_db_spark.operators.ann import CosineLshIndex, IvfIndex  # noqa: E402
from vector_db_spark.operators.knn import batch_knn  # noqa: E402
from vector_db_spark.session import get_spark  # noqa: E402
from vector_db_spark.sources.fixtures import load_table  # noqa: E402

K = 10
N_QUERIES = 50
NLIST = 32
IVF_PROBES = (4, 8, 16, 24)
LSH_RADII = (0, 1, 2)  # true Hamming-ball radii (radius 2 = two flips)


def _topk_sets(rows) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in rows:
        out.setdefault(r.query_id, set()).add(r.vec_id)
    return out


def _recall(exact: dict[int, set[int]], approx: dict[int, set[int]]) -> float:
    per_q = [
        len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact
    ]
    return sum(per_q) / len(per_q)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if len(sys.argv) > 1:
        sf_dir = sys.argv[1]
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    spark = get_spark("recall_bench")
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, sf_dir, "embeddings").cache()
    emb.count()
    queries = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
        .cache()
    )

    exact_l2 = _topk_sets(batch_knn(emb, queries, K, metric="l2").collect())
    exact_cos = _topk_sets(batch_knn(emb, queries, K, metric="cosine").collect())

    ivf = IvfIndex.build(emb, nlist=NLIST, seed=42)
    ivf.assignments.cache().count()
    ivf_recalls = {
        str(np_): round(
            _recall(exact_l2, _topk_sets(ivf.search_batch(queries, K, nprobe=np_).collect())),
            4,
        )
        for np_ in IVF_PROBES
    }

    dim = len(queries.select("query_vec").head()[0])
    lsh = CosineLshIndex.build(emb, dim=dim, n_bits=6, n_tables=8, seed=42)
    lsh.buckets.cache().count()
    qvecs = {
        r.query_id: [float(x) for x in r.query_vec] for r in queries.collect()
    }
    lsh_recalls = {}
    for radius in LSH_RADII:
        approx = {
            qid: {r.vec_id for r in lsh.search(qv, K, probe_radius=radius).collect()}
            for qid, qv in qvecs.items()
        }
        lsh_recalls[str(radius)] = round(_recall(exact_cos, approx), 4)

    from vector_db_spark.operators.graph import GraphAnnIndex

    gr = GraphAnnIndex.build(emb, nlist=8, m=16, ef_construction=200, seed=42)
    gr.graph.cache().count()
    graph_recalls = {}
    for nprobe in (4, 6, 8):
        approx = {
            qid: {
                r.vec_id
                for r in gr.search(qv, K, nprobe=nprobe, ef_search=200).collect()
            }
            for qid, qv in qvecs.items()
        }
        graph_recalls[str(nprobe)] = round(_recall(exact_l2, approx), 4)

    # compressed-search rungs: Hamming shortlist and PCA shortlist, both
    # re-ranked exact — recall is the shortlist's to lose
    from vector_db_spark.operators.binary import hamming_shortlist_rerank
    from vector_db_spark.operators.pca import fit_pca, pca_shortlist_rerank

    hamming_recall = round(
        _recall(
            exact_l2,
            {
                qid: {r.vec_id for r in hamming_shortlist_rerank(emb, qv, K, shortlist=100).collect()}
                for qid, qv in qvecs.items()
            },
        ),
        4,
    )
    pca_model = fit_pca(emb, k=24)
    pca_recall = round(
        _recall(
            exact_l2,
            {
                qid: {r.vec_id for r in pca_shortlist_rerank(emb, pca_model, qv, K, shortlist=100).collect()}
                for qid, qv in qvecs.items()
            },
        ),
        4,
    )

    # IVF-SQ decoded-distance probes (no rerank): recall loss = codec
    # reconstruction error on top of cell pruning
    from vector_db_spark.operators.ivfsq import IvfSqIndex

    ivfsq = IvfSqIndex.build(emb, ivf=ivf)
    ivfsq.encoded.cache().count()
    ivfsq_recalls = {
        str(np_): round(
            _recall(
                exact_l2,
                _topk_sets(ivfsq.search_batch(queries, K, nprobe=np_).collect()),
            ),
            4,
        )
        for np_ in IVF_PROBES
    }

    # OPQ vs plain PQ at equal code budget (the rotation rung's reason
    # to exist): raw-ADC recall over identical M-byte scans
    from vector_db_spark.operators.opq import OpqQuantizer
    from vector_db_spark.operators.pq import ProductQuantizer

    pqz = ProductQuantizer.fit(emb, m=16, ksub=64, seed=42, iters=8)
    pq_enc = pqz.encode(emb).select("vec_id", "pq_codes").cache()
    pq_enc.count()
    oqz = OpqQuantizer.fit(emb, m=16, ksub=64, seed=42, iters=8, opq_iters=4)
    opq_enc = oqz.encode(emb).select("vec_id", "opq_codes").cache()
    opq_enc.count()
    pq_recall = round(
        _recall(
            exact_l2,
            {
                qid: {r.vec_id for r in pqz.search(pq_enc, qv, K).collect()}
                for qid, qv in qvecs.items()
            },
        ),
        4,
    )
    opq_recall = round(
        _recall(
            exact_l2,
            {
                qid: {r.vec_id for r in oqz.search(opq_enc, qv, K).collect()}
                for qid, qv in qvecs.items()
            },
        ),
        4,
    )

    # recall-TARGETED tuning (operators/tuning.py): the answer to "which
    # knob do I deploy" — cheapest setting meeting 0.95 on the sample
    from vector_db_spark.operators.tuning import (
        tune_graph,
        tune_ivf,
        tune_ivfpq,
        tune_lsh,
    )

    ivf_tuned = tune_ivf(ivf, queries, k=K, recall_target=0.95)
    graph_tuned = tune_graph(gr, queries, k=K, recall_target=0.95)
    lsh_tuned = tune_lsh(lsh, queries, k=K, recall_target=0.95)
    from vector_db_spark.operators.ivfpq import IvfPqIndex

    ivfpq = IvfPqIndex.build(emb, nlist=NLIST, m=16, ksub=64, seed=42, ivf=ivf)
    ivfpq.encoded.cache().count()
    ivfpq_tuned = tune_ivfpq(ivfpq, queries, k=K, recall_target=0.95)

    tuned = ivf_recalls[str(IVF_PROBES[-1])]
    print(
        json.dumps(
            {
                "metric": "ann_recall@10",
                "value": tuned,
                "ivf": ivf_recalls,
                "ivf_tuned": {
                    k_: (round(v, 4) if isinstance(v, float) else v)
                    for k_, v in ivf_tuned.items()
                },
                "graph_tuned": {
                    k_: (round(v, 4) if isinstance(v, float) else v)
                    for k_, v in graph_tuned.items()
                },
                "ivfpq_tuned": {
                    k_: (round(v, 4) if isinstance(v, float) else v)
                    for k_, v in ivfpq_tuned.items()
                },
                "pq_adc": pq_recall,
                "opq_adc": opq_recall,
                "lsh": lsh_recalls,
                "lsh_tuned": {
                    k_: (round(v, 4) if isinstance(v, float) else v)
                    for k_, v in lsh_tuned.items()
                },
                "graph": graph_recalls,
                "hamming_rerank": hamming_recall,
                "pca_rerank": pca_recall,
                "ivfsq": ivfsq_recalls,
                "n_queries": N_QUERIES,
                "nlist": NLIST,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
