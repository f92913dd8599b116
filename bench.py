"""Benchmark harness (driver contract + BASELINE.md §"bench configuration").

Runs the headline query set at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "headline_total", "value": N, "unit": "sec",
     "queries": {"knn_l2": s, ...}, "sf": 0.1}

Each query is forced end-to-end with the ``noop`` sink (full execution,
no driver-side row transfer), timed after one engine-wide warm-up action
so JVM/codegen startup isn't billed to the first query.

Repetitions (VERDICT r9 #1): every non-build entry runs once UNTIMED
(per-query codegen/plan warm-up) and then ``$SPARK_GRAFT_BENCH_REPS``
(default 3) timed runs; ``queries`` reports the per-query MEDIAN and
``spread`` the per-query (max - min) of the timed runs, so a 1.3x delta
on a 0.4 s query is distinguishable from scheduler noise round over
round. One-time builds (knn_graph_build, ann_index_build) are excluded —
they are builds, amortized by design, and tripling them triples nothing
but wall time.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd  # module scope: pandas_udf string annotations resolve lazily

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vector_db_spark.queries import QUERIES  # noqa: E402
from vector_db_spark.session import get_spark  # noqa: E402

# Representative engine paths: exact kNN (3 metrics + filter + batch), the
# ANN search paths (probe cost from a SAVED index — build is timed once,
# separately, as ann_index_build; round-1 bench conflated the two and the
# readings were ~90% KMeans/PQ fit), LLM-pipeline dedup/text ops, and the
# relational join/agg/window suite. Names must exist in the queries()
# registry, except the ann_*_search/ann_index_build entries which come from
# the persisted-index harness below. The unblocked embedding_neardup
# (O(n²) BroadcastNestedLoopJoin) is deliberately NOT here — it exists only
# as the oracle cross-check for the blocked variant.
HEADLINE = [
    "knn_l2",
    "knn_cosine",
    "knn_filtered_neq",
    "knn_batch",
    "knn_quantized_l2",
    "knn_hamming_rerank",
    "dedup_exact",
    "chunk_dedup_docs",
    "fuzzy_name_pairs",
    # semantic_dedup_clustered is timed from the persisted-index harness
    # below: SemDeDup's blocking reuses the SAVED cosine IVF (the faiss
    # composition semantic_pairs(ivf=...) exists for), so its bench entry
    # measures blocked grams + components — not a KMeans refit the
    # deployment already paid for when it built its serving index.
    "bigram_lm_score",
    # round-11: the benched MinHash entry is the CAPPED production twin
    # (max_bucket=64 spanning-star candidates for hot buckets — VERDICT
    # r10 #2); the uncapped exhaustive query stays registered as the
    # recall-gated anchor but is no longer what the bench ships
    "minhash_lsh_neardup_capped",
    "simhash_neardup",
    "dedup_clusters",
    # round-10: the scale-safe clustering twin — LSH star-edge candidates
    # (O(b) per bucket) + O(log n)-round star-contraction components; the
    # exact variant above stays as the oracle-anchored member
    "dedup_clusters_lsh",
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
    "events_moving_avg",
    "events_sessionization",
    "multimodal_image_features",
    "stream_tumbling_agg",
    # round-4 additions: multi-vector late interaction (one max-combine
    # shuffle), target-proportion mixture sampling (one lottery window),
    # stride-1 exact-substring dedup (one window-hash shuffle), and
    # perceptual-hash image dedup (Arrow DCT + pigeonhole blocking)
    "maxsim_label_search",
    # round-12: MaxSim range (score-floor retrieval) — the exact operator
    # and the one-corpus-pass batch formulation; thresholds are
    # data-derived (the 12th exact score) so the entries are nontrivial
    # at every SF
    "maxsim_range",
    "maxsim_batch_range",
    "mixture_sample_docs",
    "substring_dedup_docs",
    "image_phash_neardup",
    # round-4 continuation: corpus-statistics keyword weighting (3
    # shuffles), iterative integer-unit graph analytics (5 chained
    # join+agg rounds), bounded-fanout basket self-join
    "tfidf_top_terms",
    "pagerank_knn_graph",
    "copurchase_lift",
    # round-5: LPA + triangles now read the SHARED persisted 5-NN edge
    # artifact (built once as knn_graph_build below, like every ANN
    # family's build is billed once in ann_index_build) — their entries
    # measure pure analytics rounds, not a per-query graph rebuild
    "label_propagation_knn",
    "triangle_participation_knn",
    # round-5: corpus-scale feature-hashing embedder (text -> dense
    # vectors, zero UDFs — one (doc, bucket) shuffle + integer reduce)
    "text_embed_corpus_stats",
]

K = 10

# Healthy-host canary bands (VERDICT r12 #1). Derived from the record
# history: a healthy boot runs the pinned GEMM in ~0.009 s and the 2M-row
# sum job in well under 0.05 s; the r12 boot (a uniform ~1.5x bench-wide
# inflation later attributed to per-job scheduling latency) measured
# job 0.087-0.103 s at an IDENTICAL healthy GEMM. Bands sit between the
# two populations. A breach does NOT abort the bench — the driver needs a
# record every round — it re-measures once after a settle and, if still
# out of band, stamps the record ``host_degraded: true`` so nobody reads
# the inflated numbers as an engine regression.
CANARY_BANDS = {
    "canary_gemm_sec": 0.020,
    "canary_job_sec": 0.055,
    "canary_shuffle_sec": 0.450,
}

# Canary-normalized series (VERDICT r14 next #1): r12/r13/r14 all booted
# host_degraded, so every absolute second since r11 carries an unmeasured
# per-job scheduling tax. Model: Spark-side entry time scales ~with the
# host's per-job dispatch cost, measured by the job canary; the healthy
# band edge is the reference point. factor = max(1, job_run / REF) where
# job_run is the MEAN of the pre-flight and end-of-run job canaries (they
# bracket the run; the mean is the run's representative dispatch cost),
# and normalized_time = raw / factor. Known approximation, documented:
# a scalar factor over-corrects compute-bound entries (GEMM canary shows
# raw CPU is identical across boots) and under-corrects many-job entries;
# the raw series stays primary, the normalized series is the
# cross-round/vs-BASELINE comparability signal. factor never drops below
# 1 — a healthy boot's numbers are never inflated.
CANARY_JOB_REF = 0.055


def measure_canaries(spark) -> dict:
    """Three fixed host-load probes, each median-of-3 after one warm run
    (the query-timing policy): a single-thread 1024^3 float64 GEMM
    (raw-CPU contention, no Spark), a narrow 2M-row sum (pure job
    dispatch + codegen scan), and a 32-partition 1M-row group-by (stage
    scheduling + exchange machinery). Costs are properties of the HOST at
    bench time, not of engine code — compare these fields across BENCH
    records before reading any round-over-round query delta as a
    regression (VERDICT r11 #6, r12 #1)."""
    import statistics

    import numpy as np

    def _median3(thunk) -> float:
        thunk()  # warm
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            thunk()
            samples.append(time.perf_counter() - t0)
        return round(statistics.median(samples), 4)

    rng = np.random.RandomState(0)
    a = rng.standard_normal((1024, 1024))
    b = rng.standard_normal((1024, 1024))
    return {
        "canary_gemm_sec": _median3(lambda: a @ b),
        "canary_job_sec": _median3(
            lambda: spark.range(2_000_000).selectExpr("sum(id * 2)").collect()
        ),
        "canary_shuffle_sec": _median3(
            lambda: spark.sql(
                "select id % 97 k, count(*) c from range(1000000) group by k"
            ).collect()
        ),
    }


def gate_canaries(spark) -> tuple[dict, bool]:
    """Pre-flight host gate: measure, and on a band breach settle 10 s
    and re-measure once (transient load — another process's startup burst
    — clears; a genuinely slow boot doesn't). Returns the BEST of the
    attempts per probe and whether the host is still out of band."""
    first = measure_canaries(spark)
    if all(first[k] <= v for k, v in CANARY_BANDS.items()):
        return first, False
    time.sleep(10)
    second = measure_canaries(spark)
    best = {k: min(first[k], second[k]) for k in first}
    return best, any(best[k] > v for k, v in CANARY_BANDS.items())


def _parquet_col_bytes(path: str, cols: tuple[str, ...]) -> list[int]:
    """Total compressed parquet bytes per named top-level column under
    ``path`` — the honest 'what would this scan read' measure."""
    import glob

    import pyarrow.parquet as pq

    totals = {c: 0 for c in cols}
    for f in glob.glob(f"{path}/**/*.parquet", recursive=True):
        meta = pq.ParquetFile(f).metadata
        for rg in range(meta.num_row_groups):
            for ci in range(meta.num_columns):
                col = meta.row_group(rg).column(ci)
                name = col.path_in_schema.split(".")[0]
                if name in totals:
                    totals[name] += col.total_compressed_size
    return [totals[c] for c in cols]


def ann_search_suite(spark, sf_dir: str, root: str):
    """Build + persist every ANN index family ONCE (returned as the
    ``ann_index_build`` timing), then hand back search thunks that load
    from the saved artifacts — so the per-query numbers measure what
    matters at 100 TB: partition-pruned probe cost, not quantizer fits.
    IVF search from a saved index is parquet partition pruning on
    cluster_id (pinned in tests/test_plans.py / tests/test_ann.py)."""
    import shutil

    from pyspark.sql import functions as F

    from vector_db_spark.operators.ann import CosineLshIndex, IvfIndex
    from vector_db_spark.operators.binary import knn_hamming as _knn_hamming
    from vector_db_spark.operators.dedup import semantic_dedup as _semantic_dedup
    from vector_db_spark.operators.graph import GraphAnnIndex
    from vector_db_spark.operators.ivfpq import IvfPqIndex
    from vector_db_spark.operators.pq import ProductQuantizer
    from vector_db_spark.sources.fixtures import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    ]
    shutil.rmtree(root, ignore_errors=True)

    # The five families build CONCURRENTLY (one thread each): every build
    # is a handful of small Spark jobs plus a bounded driver-side fit, so
    # serial execution just stacks job-scheduling latency (profiled:
    # ~2.8 s/family serial on local[32] at sf0.1 — the cluster is idle
    # ~90 % of each). Spark schedules jobs from concurrent driver threads
    # fairly; on a real cluster this is exactly how you'd run independent
    # index builds. nlist=16 on the graph (vs the oracle queries' 8): NSW
    # construction is one task per cell, so more cells = more build
    # parallelism at equal total work; search probes half either way.
    from concurrent.futures import ThreadPoolExecutor

    def _build_pq():
        # offload_fit: the Lloyd loop runs in a forked child process, not
        # this driver thread — the 9-family pool's Python fit loops
        # otherwise serialize on the driver GIL (r16, guide §5)
        pqz = ProductQuantizer.fit(
            emb, m=16, ksub=64, seed=42, iters=8, n_rows=n_rows,
            offload_fit=True,
        )
        pqz.encode(emb).select("vec_id", "pq_codes").write.mode(
            "overwrite"
        ).parquet(f"{root}/pq_codes")
        return pqz

    def _build_binary():
        from vector_db_spark.operators.binary import binary_quantize

        binary_quantize(emb, dim=64).select("vec_id", "codes").write.mode(
            "overwrite"
        ).parquet(f"{root}/sign_codes")

    def _build_ivf_and_ivfpq(pool):
        # One KMeans fit serves three families: IVF-PQ and IVF-SQ compose
        # over a trained coarse quantizer (the faiss shape) instead of
        # refitting the identical nlist/seed KMeans. The plain-IVF save,
        # the SQ encode, and the PQ encode then proceed concurrently.
        from vector_db_spark.operators.ivfsq import IvfSqIndex

        ivf = IvfIndex.build(emb, nlist=8, seed=42, max_iter=5, n_rows=n_rows)
        save_f = pool.submit(ivf.save, f"{root}/ivf")
        sq_f = pool.submit(
            lambda: IvfSqIndex.build(emb, ivf=ivf).save(f"{root}/ivfsq")
        )
        IvfPqIndex.build(
            emb, nlist=8, m=16, ksub=64, seed=42, max_iter=5, ivf=ivf,
            n_rows=n_rows,
        ).save(f"{root}/ivfpq")
        save_f.result()
        sq_f.result()

    from vector_db_spark.operators.dedup import semdedup_nlist

    sub_timings: dict[str, float] = {}

    def _build_cosine_ivf():
        # The serving-side cosine IVF doubles as the SemDeDup blocking
        # (semantic_pairs(ivf=...)): nlist follows the k ∝ n recipe so
        # cells stay ~500 rows at any corpus size. Its STANDALONE wall
        # time is reported separately (cosine_ivf_build_sec) so the
        # r2→r3 accounting move — this fit leaving the
        # semantic_dedup_clustered entry for the build pool — stays
        # auditable round over round; it is NOT added to the total (the
        # concurrent pool already bills it inside ann_index_build).
        t0 = time.perf_counter()
        IvfIndex.build(
            emb,
            nlist=semdedup_nlist(n_rows),
            seed=42,
            max_iter=5,
            metric="cosine",
            n_rows=n_rows,
        ).save(f"{root}/ivf_cos")
        sub_timings["cosine_ivf_build_sec"] = round(time.perf_counter() - t0, 3)

    def _build_opq():
        # OPQ rung at the PQ family's (m, ksub): rotation + codes persist,
        # the ADC entry below scans the same M bytes/row as plain PQ
        from vector_db_spark.operators.opq import OpqQuantizer

        # offload_fit: the alternating Lloyd/Procrustes loop — the pool's
        # measured critical path (r15 profile: 2.74 s standalone, ~8.8 s
        # wall under 8 sibling threads) — runs in a forked child process
        # instead of holding the driver GIL (r16, guide §5)
        oq = OpqQuantizer.fit(
            emb, m=16, ksub=64, seed=42, iters=8, opq_iters=4, n_rows=n_rows,
            offload_fit=True,
        )
        oq.save(f"{root}/opq")
        oq.encode(emb).select("vec_id", "opq_codes").write.mode(
            "overwrite"
        ).parquet(f"{root}/opq_codes")

    def _build_maxsim_ivf():
        # token-level IVF for PLAID MaxSim (docs = vec_id % 97 groups,
        # the gate corpus shape), then the ColBERTv2 compression rung over
        # the SAME quantizer fit: residual PQ codes ride in the cell
        # layout, giving the stage-2 scan M=8 bytes/token instead of 256
        from vector_db_spark.operators.late_interaction import (
            MaxSimIvfIndex,
            MaxSimPqIndex,
        )

        msivf = MaxSimIvfIndex.build(
            emb.select((F.col("vec_id") % 97).alias("doc"), "embedding"),
            nlist=16,
            doc_col="doc",
            max_iter=5,
        )
        msivf.save(f"{root}/msivf")
        # reuses msivf's KMeans fit + assignments (the faiss composition)
        MaxSimPqIndex.build(
            None, m=8, ksub=64, doc_col="doc", pq_iters=8, msivf=msivf
        ).save(f"{root}/mspq")

    t0 = time.perf_counter()
    # Timed contract of ann_index_build (r16, VERDICT r15 what's-wrong #3):
    # the entry bills EVERYTHING the build pool computes from the corpus,
    # including this corpus count — it sizes every family's training-sample
    # fraction, so it is engine work of the build, not fixture plumbing.
    # r15 had hoisted it above t0 (lightening the entry's definition by
    # ~1 job); restored inside the window. The operator-side n_rows hint
    # API stays: real callers that already know their row count (catalog
    # stats, a prior pass) legitimately skip the job — the BENCH does not
    # know it without computing it, so the bench pays for it.
    n_rows = emb.count()
    with ThreadPoolExecutor(max_workers=9) as pool:
        futures = [
            pool.submit(_build_ivf_and_ivfpq, pool),
            pool.submit(_build_cosine_ivf),
            pool.submit(_build_maxsim_ivf),
            pool.submit(_build_opq),
            pool.submit(
                lambda: CosineLshIndex.build(
                    emb, dim=64, n_bits=6, n_tables=4, seed=42
                ).save(f"{root}/lsh")
            ),
            pool.submit(_build_pq),
            pool.submit(_build_binary),
            pool.submit(
                lambda: GraphAnnIndex.build(
                    emb, nlist=16, m=16, ef_construction=200, seed=42,
                    n_rows=n_rows,
                ).save(f"{root}/graph")
            ),
        ]
        pqz = None
        for f in futures:
            r = f.result()
            if isinstance(r, ProductQuantizer):
                pqz = r
    build_sec = time.perf_counter() - t0
    sub_timings["ann_index_build"] = round(build_sec, 3)

    from vector_db_spark.operators.ivfsq import IvfSqIndex

    from vector_db_spark.operators.late_interaction import MaxSimIvfIndex
    from vector_db_spark.operators.opq import OpqQuantizer

    from vector_db_spark.operators.late_interaction import MaxSimPqIndex

    opqz = OpqQuantizer.load(f"{root}/opq")
    opq_codes = spark.read.parquet(f"{root}/opq_codes")
    ivf = IvfIndex.load(spark, f"{root}/ivf")
    msivf = MaxSimIvfIndex.load(spark, f"{root}/msivf")
    mspq = MaxSimPqIndex.load(spark, f"{root}/mspq")
    # The byte claim the compression rung exists for, measured from the
    # actual parquet column chunks of the saved cell layout: stage-2 scan
    # bytes with codes vs what the raw token-vector column would read.
    code_b, vec_b = _parquet_col_bytes(
        f"{root}/mspq/assignments", ("pq_codes", "embedding")
    )
    sub_timings["maxsim_pq_codes_bytes"] = code_b
    sub_timings["maxsim_pq_raw_bytes"] = vec_b
    ivfsq = IvfSqIndex.load(spark, f"{root}/ivfsq")
    ivf_cos = IvfIndex.load(spark, f"{root}/ivf_cos")
    lsh = CosineLshIndex.load(spark, f"{root}/lsh")
    ivfpq = IvfPqIndex.load(spark, f"{root}/ivfpq")
    gr = GraphAnnIndex.load(spark, f"{root}/graph")
    codes = spark.read.parquet(f"{root}/pq_codes")
    sign_codes = spark.read.parquet(f"{root}/sign_codes")
    batch_queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )

    searches = {
        "ann_ivf_search": lambda: ivf.search(qv, K, nprobe=4),
        "ann_ivf_batch_search": lambda: ivf.search_batch(batch_queries, 5, nprobe=4),
        "ann_lsh_search": lambda: lsh.search(qv, K),
        "ann_lsh_batch_search": lambda: lsh.search_batch(batch_queries, 5),
        "pq_adc_search": lambda: pqz.search(codes, qv, K),
        # OPQ ADC from persisted rotated codes: identical scan bytes to
        # pq_adc_search, better codebook geometry (recall pinned in tests)
        "opq_adc_search": lambda: opqz.search(opq_codes, qv, K),
        "ivfpq_search": lambda: ivfpq.search(qv, K, nprobe=4, shortlist=100),
        # int8 decoded-distance probe from the persisted cell layout:
        # 1/4 the scan bytes of ann_ivf_search, pure codegen (no rerank —
        # the codec-accuracy rung on its own)
        "ivfsq_search": lambda: ivfsq.search(qv, K, nprobe=4),
        "ivfpq_batch_search": lambda: ivfpq.search_batch(
            batch_queries, 5, nprobe=4, shortlist=100
        ),
        # PLAID sub-scan MaxSim from the persisted token IVF: probe a
        # quarter of the cells per token, exact-rerank a 20-doc shortlist
        "maxsim_ivf_search": lambda: msivf.search(
            [qv, qv[::-1]], K, nprobe=4, shortlist=20
        ),
        # compressed PLAID at the same probe settings: the shortlist now
        # ranks by residual ADC over 8-byte codes instead of the
        # centroid-score bound — tighter candidates, ~1/30 the stage-2
        # scan bytes (recorded as maxsim_pq_codes_bytes/raw_bytes)
        "maxsim_pq_search": lambda: mspq.search(
            [qv, qv[::-1]], K, nprobe=4, shortlist=20
        ),
        "ann_graph_search": lambda: gr.search(qv, K, nprobe=8, ef_search=200),
        "ann_graph_batch_search": lambda: gr.search_batch(
            batch_queries, 5, nprobe=8, ef_search=200
        ),
        # range probes from the same saved artifacts (round 12 — the
        # range matrix is now batched per family): IVF range is the
        # lossless triangle-inequality prune, its batch twin unions the
        # per-query surviving cells into ONE verify; graph range runs
        # the saturated beam at a serving ef
        "ann_ivf_range_search": lambda: ivf.range_search(qv, 1.6),
        "ann_ivf_batch_range_search": lambda: ivf.range_search_batch(
            batch_queries, 1.6
        ),
        "ann_graph_range_search": lambda: gr.range_search(
            qv, 1.6, nprobe=8, ef_search=64
        ),
        # MaxSim probed range from the persisted token IVF (round 12):
        # candidates from the per-token probed cells, full-token-set
        # exact verify against the 0.5 score floor at a serving nprobe
        "maxsim_ivf_range_search": lambda: msivf.range_search(
            [qv, qv[::-1]], 0.5, nprobe=4
        ),
        # Hamming over persisted 12-byte sign codes: the scan artifact the
        # binary op exists for (21x fewer bytes than the raw vector scan)
        "hamming_search": lambda: _knn_hamming(sign_codes, qv, K),
        # SemDeDup from the loaded serving index: blocked per-cell grams +
        # min-label components over the PERSISTED cell-partitioned layout
        # (assignment GEMM + quantizer fit were paid once, in
        # ann_index_build, where every other family pays them too).
        "semantic_dedup_clustered": lambda: _semantic_dedup(
            emb, threshold=0.4, ivf=ivf_cos
        ),
    }
    return build_sec, searches, sub_timings


def highdim_suite(spark, sf_dir: str, root: str):
    """Embedding-model-dim rung (VERDICT r13 #4): the Arrow GEMM serving
    path (knn.ARROW_DIM_MIN = 128) was contract-tested at 512–1024-d but
    never benched in the headline — fixtures are 64-d. A deterministic
    synthetic 768-d corpus (row count matched to the sf's embeddings
    table, 8 planted cluster centers + noise so the IVF geometry is
    non-degenerate) is staged UNTIMED (fixture synthesis, not engine
    work), then the entries time what matters: the 768-d IVF build,
    partition-pruned probe search, and the exact single/batch kNN that
    auto-dispatch to the Arrow kernel past ARROW_DIM_MIN."""
    import shutil

    import numpy as np
    from pyspark.sql import functions as F

    from vector_db_spark.operators.ann import IvfIndex
    from vector_db_spark.operators.knn import batch_knn, knn
    from vector_db_spark.sources.fixtures import load_table

    dim = 768
    n = load_table(spark, sf_dir, "embeddings").count()
    shutil.rmtree(root, ignore_errors=True)

    rng = np.random.default_rng(42)
    centers = rng.standard_normal((8, dim)).astype(np.float32) * 2.0
    import pyarrow as pa
    import pyarrow.parquet as pq_

    os.makedirs(root, exist_ok=True)
    # r15: the corpus used to land as ONE parquet file, which Spark scans
    # as ONE task until the file outgrows maxPartitionBytes — at sf1 that
    # made every 768-d exact scan single-threaded (guide §6: file layout
    # decides reader parallelism). Stage one file per chunk instead; the
    # rng consumes the identical sequence in the identical order, so the
    # corpus CONTENT (every row, every id) is byte-identical to the
    # single-file layout — only the file boundaries move. Chunk sized so
    # even small fixtures get a few files without drowning in open costs.
    chunk = max(1_000, min(50_000, (n + 7) // 8))
    os.makedirs(f"{root}/corpus.parquet", exist_ok=True)
    for part, start in enumerate(range(0, n, chunk)):
        rows = min(chunk, n - start)
        ids = np.arange(start, start + rows, dtype=np.int64)
        mat = (
            centers[ids % 8]
            + rng.standard_normal((rows, dim)).astype(np.float32)
        )
        t = pa.table(
            {
                "vec_id": pa.array(ids),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(mat.ravel(), type=pa.float32()), dim
                ).cast(pa.list_(pa.float32())),
            }
        )
        pq_.write_table(
            t, f"{root}/corpus.parquet/part-{part:05d}.parquet"
        )
    corpus = spark.read.parquet(f"{root}/corpus.parquet")
    qv = [
        float(x)
        for x in corpus.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    ]
    batch_queries = corpus.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )

    t0 = time.perf_counter()
    IvfIndex.build(corpus, nlist=8, seed=42, max_iter=5, n_rows=n).save(
        f"{root}/ivf"
    )
    build_sec = round(time.perf_counter() - t0, 3)
    ivf = IvfIndex.load(spark, f"{root}/ivf")

    searches = {
        "knn768_exact": lambda: knn(corpus, qv, K),
        "knn768_batch": lambda: batch_knn(corpus, batch_queries, 5),
        "ann768_ivf_search": lambda: ivf.search(qv, K, nprobe=4),
        # the 100 TB serving-fleet entry (VERDICT r14 next #3): probed
        # BATCH search at model dim — broadcast probe set + dynamic
        # partition pruning on cluster_id (pinned in tests/test_plans.py),
        # beside the disclosed-linear exact anchor knn768_batch
        "ann768_ivf_batch_search": lambda: ivf.search_batch(
            batch_queries, 5, nprobe=4
        ),
    }
    return build_sec, searches


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm up the session off the clock: JVM/codegen/parquet machinery AND
    # the Arrow Python worker pool — spawning 32 worker interpreters costs
    # ~6 s and is engine startup, not the cost of whichever pandas_udf
    # query happens to run first.
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

    # Streaming machinery warms separately from batch (state-store
    # provider, micro-batch planner, streaming codegen: measured ~1.8 s
    # once per session, then ~0 for every later stream) — drain a one-row
    # file stream off the clock, same policy as the batch/Arrow warm-ups.
    import tempfile
    import uuid

    warm_dir = tempfile.mkdtemp(prefix="bench_stream_warm_")
    spark.range(1).selectExpr(
        "CAST(id AS STRING) k", "current_timestamp() ts"
    ).write.mode("overwrite").parquet(warm_dir)
    warm_q = (
        spark.readStream.schema("k string, ts timestamp")
        .parquet(warm_dir)
        .groupBy("k")
        .count()
        .writeStream.format("memory")
        .queryName("w" + uuid.uuid4().hex)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="bench_ckw_"))
        .trigger(availableNow=True)
        .start()
    )
    warm_q.awaitTermination(60_000)

    # Pre-flight host gate (VERDICT r12 #1): canaries BEFORE the timing
    # loop, so a degraded boot is known before 5+ minutes of inflated
    # measurements, with one settle-and-retry for transient load. The
    # bench still runs either way — the record is stamped, not refused.
    preflight, host_degraded = gate_canaries(spark)
    if host_degraded:
        print(
            f"# WARNING host out of canary bands {CANARY_BANDS}: "
            f"{preflight} — record will carry host_degraded: true",
            file=sys.stderr,
        )

    # Materialize the shared 5-NN edge artifact ONCE, billed as its own
    # entry — the three graph-analytics queries then read parquet edges
    # (VERDICT r4 #3: the graph was being rebuilt inside each of them).
    from vector_db_spark.queries.vector_queries import shared_knn_edges

    timings: dict[str, float] = {}
    t0 = time.perf_counter()
    shared_knn_edges(spark, sf_dir).write.format("noop").mode("overwrite").save()
    timings["knn_graph_build"] = round(time.perf_counter() - t0, 3)

    import statistics

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    spreads: dict[str, float] = {}

    def _timed(name: str, thunk) -> None:
        """One untimed warm-up (first-run codegen/planning — measured up to
        2.7x the warm cost on literal-map-heavy queries like
        bigram_lm_score), then ``reps`` timed runs; true median (even rep
        counts average the middle pair) + max-min spread."""
        thunk().write.format("noop").mode("overwrite").save()
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            thunk().write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(samples), 3)
        spreads[name] = round(max(samples) - min(samples), 3)

    for name in HEADLINE:
        fn = QUERIES[name]
        _timed(name, lambda fn=fn: fn(spark, sf_dir))

    build_sec, searches, sub_timings = ann_search_suite(
        spark, sf_dir, "/tmp/spark_graft_bench_ann"
    )
    timings["ann_index_build"] = round(build_sec, 3)
    for name, thunk in searches.items():
        _timed(name, thunk)

    hd_build, hd_searches = highdim_suite(
        spark, sf_dir, "/tmp/spark_graft_bench_768"
    )
    timings["ann768_ivf_build"] = hd_build
    for name, thunk in hd_searches.items():
        _timed(name, thunk)

    total = round(sum(timings.values()), 3)

    # End-of-run canaries (VERDICT r11 #6 / r12): same three probes as
    # the pre-flight, measured after the timing loop so the two readings
    # bracket the run — load arriving mid-bench shows up as the delta.
    postflight = measure_canaries(spark)

    # canary-normalized series (model documented at CANARY_JOB_REF)
    job_run = round(
        (preflight["canary_job_sec"] + postflight["canary_job_sec"]) / 2, 4
    )
    norm_factor = round(max(1.0, job_run / CANARY_JOB_REF), 4)
    queries_norm = {k: round(v / norm_factor, 4) for k, v in timings.items()}
    value_norm = round(total / norm_factor, 3)

    record = json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "spread": spreads,
                "reps": reps,
                "sf": sf,
                # canary-normalized twin series: queries_norm[k] ==
                # queries[k] / canary_norm_factor (scalar model — either
                # series derives the other; both carried here for direct
                # reading)
                "canary_norm_factor": norm_factor,
                "canary_job_ref": CANARY_JOB_REF,
                "canary_job_run": job_run,
                "value_norm": value_norm,
                "queries_norm": queries_norm,
                # host-load calibration (see measure_canaries): the
                # canary_* fields keep their r12 meaning (end-of-run);
                # canary_preflight brackets the run from the other side,
                # and host_degraded means the PRE-flight breached
                # CANARY_BANDS even after a settle-and-retry — treat
                # every query time in such a record as inflated by host
                # scheduling latency, not engine code
                **postflight,
                "canary_preflight": preflight,
                "canary_bands": CANARY_BANDS,
                "host_degraded": host_degraded,
                # standalone wall time of the cosine-IVF (SemDeDup
                # blocking) build INSIDE the concurrent ann_index_build
                # pool — disclosed for round-over-round comparability,
                # not part of the total (ADVICE r3)
                "cosine_ivf_build_sec": sub_timings.get("cosine_ivf_build_sec"),
                # ColBERTv2 token-compression byte claim (round 6):
                # parquet bytes of the PQ codes column vs the raw token
                # vectors in the saved PLAID cell layout
                "maxsim_pq_codes_bytes": sub_timings.get("maxsim_pq_codes_bytes"),
                "maxsim_pq_raw_bytes": sub_timings.get("maxsim_pq_raw_bytes"),
            }
    )
    # The driver's BENCH_r{N}.json artifact keeps only a ~2 KB TAIL of
    # stdout; r13's full record (~3.9 KB: spreads + bracketing canaries)
    # overflowed it head-first, so the driver's own copy lost the
    # opening brace and parsed as null (VERDICT r13 #2). Contract line
    # printed LAST is therefore a compact projection guaranteed to fit:
    # metric/value/queries/sf plus the host flag, with the full record
    # (spread, reps, canary brackets, byte claims) persisted to
    # BENCH_LOCAL_r{N}.json below. Degrade by dropping precision, never
    # queries — the dict is what the judge reads.
    _DRIVER_TAIL_BUDGET = 1900
    compact_queries = dict(timings)
    compact = {
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "queries": compact_queries,
        "sf": sf,
        "host_degraded": host_degraded,
        # normalized series is queries/value divided by norm_factor
        # (scalar model) — the factor IS the second series; full
        # queries_norm dict lives in the BENCH_LOCAL record
        "value_norm": value_norm,
        "norm_factor": norm_factor,
        "full_record": "BENCH_LOCAL",
    }
    line = json.dumps(compact, separators=(",", ":"))
    for ndigits in (2, 1):
        if len(line) <= _DRIVER_TAIL_BUDGET:
            break
        compact["queries"] = {
            k: round(v, ndigits) for k, v in compact_queries.items()
        }
        line = json.dumps(compact, separators=(",", ":"))
    print(line)
    # Also persist the FULL record next to the repo (VERDICT r10 #5) —
    # the committed local record survives intact. Round number from the
    # env when the driver provides it, else "local".
    rnd = os.environ.get("SPARK_GRAFT_ROUND", "local")
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), f"BENCH_LOCAL_r{rnd}.json"
    )
    try:
        with open(out_path, "w") as fh:
            fh.write(record + "\n")
    except OSError:
        pass  # the printed line is the contract; the file is a convenience


if __name__ == "__main__":
    main()
