"""Product quantization (PQ) with asymmetric distance computation (ADC).

The compression scheme behind faiss's IVF-PQ family (Jégou et al. 2011) —
the scale path the reference's FLAT backend lacks (its exact scan is
`src/core/index/faiss_index.rs:60-69`; faiss's own PQ variants sit behind
the same `index_factory` the reference instantiates at
`src/core/index_factory.rs:92` with descriptor "IDMap,Flat"): split each
D-dim vector into M subvectors, vector-quantize each subspace against its
own ``ksub``-entry codebook, store M uint8 codes per vector — D·4 bytes
become M bytes (64-dim float32 → 8 bytes at M=8, a 32× scan reduction).

Search is ADC: per query, precompute the (M × ksub) table of squared
distances from each query subvector to every codebook entry — then a
database vector's approximate distance is M table lookups summed. No
reconstruction, no floats scanned.

Spark mapping (mirrors the IVF design in operators/ann.py):
- **fit** — driver-side seeded Lloyd's per subspace on a bounded corpus
  sample (cost independent of corpus size; same policy as IvfIndex);
- **encode** — one Arrow-batched pandas UDF: per subspace, a
  (batch × ksub) distance matmul and argmin → a ``binary`` codes column
  (M bytes per row — the column parquet actually stores and search scans);
- **search** — the query's ADC table ships as a closure constant
  ((M·ksub) float64s, ~16 KB at M=8/ksub=256); one pandas UDF turns each
  codes row into a distance via NumPy fancy indexing; top-k via
  ORDER BY + LIMIT (TakeOrderedAndProject — per-partition heaps, k rows
  per partition to the driver, never a global sort);
- **rerank** — optional: ADC selects an L-size shortlist (L ≫ k), the
  shortlist alone is joined back to raw vectors for exact distances.
  Scan cost stays M bytes/row; exactness approaches 1 as L grows.

At 100 TB: the corpus scan reads ONLY the (id, codes) columns — with
M=8 that is ~3% of the bytes of a raw-vector scan — and the rerank join
touches L rows, not the corpus. Codebooks are driver constants; nothing
but the final k rows crosses to the driver.

Accuracy contract (tests/test_pq.py): ADC distance equals the exact
squared-L2 distance to the RECONSTRUCTION (deterministic given the seed),
and recall@10 vs the oracle-verified exact kNN meets the tuned target.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sample_training_points(
    corpus: DataFrame, vec_col: str, target: int, seed: int,
    n_rows: int | None = None,
) -> np.ndarray:
    """Bounded training sample (≤ target vectors) as a float64 matrix —
    the shared fit policy of the PQ/OPQ quantizers (cost independent of
    corpus size; same trade as the IVF coarse quantizer).

    ``n_rows``: caller-known row count — skips the count job. The bench's
    index-build pool was paying 4+ identical count jobs of one corpus
    across concurrently-fitting families (r15 opt); the count only picks
    the sample fraction, so a correct hint changes nothing else."""
    n = corpus.count() if n_rows is None else int(n_rows)
    sampled = corpus.select(F.col(vec_col).alias("v"))
    if n > target:
        sampled = sampled.sample(fraction=min(1.0, 1.2 * target / n), seed=seed)
    return np.asarray(
        [r.v for r in sampled.limit(target).collect()], dtype=np.float64
    )


def shortlist_rerank(
    scored: DataFrame,
    rerank: DataFrame,
    query,
    k: int,
    ell: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Shared ADC→exact refinement tail: take the ``ell`` best ADC rows
    (ties by id), broadcast-join their ids back to the raw corpus, exact
    kNN on the raw vectors. ``query`` is whatever vector the exact
    distances should be computed against (the UNROTATED query for OPQ)."""
    from vector_db_spark.operators.knn import knn

    if ell < k:
        raise ValueError("shortlist must be >= k")
    cand = (
        scored.orderBy(F.col("distance").asc(), F.col(id_col).asc())
        .limit(ell)
        .select(id_col)
    )
    short = rerank.join(F.broadcast(cand), on=id_col, how="inner")
    return knn(short, query, k, id_col=id_col, vec_col=vec_col)


def run_fit_forked(fn, *args):
    """Run a pure-NumPy fit function in a FORKED child process and return
    its result (offload_fit, guide §5: concurrent index builds from
    driver threads serialize their Python-level fit loops on the driver
    GIL; a child process has its own interpreter, and the parent thread
    blocks on the result pipe with the GIL released).

    Fork, not a Spark task and not spawn, is load-bearing for BIT
    identity: the child inherits the parent's exact process image —
    same NumPy, same BLAS runtime state, same thread configuration — so
    LAPACK paths whose results are thread-count-sensitive (measured r16:
    ``np.linalg.svd`` returns different last-bit results inside a Spark
    executor worker than on the driver; GEMM and Lloyd do not) reproduce
    the driver's output exactly. Pinned by the offload bit-identity
    tests in tests/test_pq.py. Platforms without fork run inline."""
    import multiprocessing as mp

    if "fork" not in mp.get_all_start_methods():
        return fn(*args)
    ctx = mp.get_context("fork")
    with ctx.Pool(1) as pool:
        return pool.apply(fn, args)


def _train_subspace_books(
    pts: np.ndarray, m: int, ksub: int, seed: int, iters: int
) -> np.ndarray:
    """Per-subspace Lloyd codebooks as one pure function of the sample —
    module-level so it can run on the driver or be shipped to an
    executor task (offload_fit) with a bit-equal result."""
    dsub = pts.shape[1] // m
    return np.stack(
        [
            _lloyd(pts[:, i * dsub : (i + 1) * dsub], ksub, seed + i, iters)
            for i in range(m)
        ]
    )


def _lloyd(pts: np.ndarray, k: int, seed: int, iters: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    k = min(k, pts.shape[0])
    centroids = pts[rng.choice(pts.shape[0], size=k, replace=False)].copy()
    for _ in range(iters):
        d = (
            (pts * pts).sum(axis=1)[:, None]
            - 2.0 * (pts @ centroids.T)
            + (centroids * centroids).sum(axis=1)[None, :]
        )
        assign = d.argmin(axis=1)
        # empty clusters re-seed on DISTINCT farthest points (walk the
        # min-distance ranking) — one shared argmax point made every
        # reseeded centroid identical, silently shrinking the effective
        # codebook (same defect, same fix as ann._kmeans_centroids)
        far_order = iter(np.argsort(-d.min(axis=1)))
        for j in range(k):
            members = pts[assign == j]
            if len(members):
                centroids[j] = members.mean(axis=0)
            else:
                centroids[j] = pts[next(far_order)]
    return centroids


class ProductQuantizer:
    """M-subspace product quantizer; codes stored as M-byte binary."""

    def __init__(
        self,
        codebooks: np.ndarray,
        id_col: str,
        vec_col: str,
        exact_fold: bool = False,
    ):
        self.codebooks = codebooks  # (M, ksub, dsub)
        self.m = codebooks.shape[0]
        self.ksub = codebooks.shape[1]
        self.dsub = codebooks.shape[2]
        if self.ksub > 256:
            raise ValueError("ksub > 256 does not fit uint8 codes")
        self.id_col = id_col
        self.vec_col = vec_col
        # Order-pinned arithmetic for oracle parity (round 14, the
        # pq_adc_knn/opq_adc_knn freeze conversion): every distance is a
        # LEFT-ASSOCIATED float64 fold — encode computes per-centroid
        # ((x0-c0)² + (x1-c1)²) + … (no BLAS expansion form, whose
        # matmul blocking/FMA is not SQL-reproducible), the ADC table
        # folds dsub terms in order, and per-row ADC sums the M lookups
        # in subspace order. Each numpy elementwise op is a correctly-
        # rounded binary64 op, so DuckDB replaying the same expression
        # tree produces bit-identical doubles. Default OFF: the
        # expansion-form GEMM stays the production encode (one matmul
        # per subspace per Arrow batch vs ksub·dsub vector ops).
        self.exact_fold = exact_fold

    @staticmethod
    def fit(
        corpus: DataFrame,
        m: int = 8,
        ksub: int = 256,
        seed: int = 42,
        iters: int = 10,
        sample_per_code: int = 64,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        n_rows: int | None = None,
        offload_fit: bool = False,
    ) -> "ProductQuantizer":
        """Train per-subspace codebooks on a bounded sample (≤ ksub·
        sample_per_code vectors — fit cost independent of corpus size).

        ``offload_fit=True`` runs the Lloyd loop in a forked child
        process (run_fit_forked) instead of the calling driver thread —
        guide §5: concurrent builds from driver threads serialize their
        Python-level fit loops on the driver GIL (see OpqQuantizer.fit).
        Same function, same sample, same process image ⇒ bit-equal
        codebooks (pinned by
        tests/test_pq.py::test_pq_offload_fit_bit_identical)."""
        if not 1 <= ksub <= 256:
            raise ValueError("ksub must be in [1, 256] (uint8 codes)")
        pts = sample_training_points(
            corpus, vec_col, ksub * sample_per_code, seed, n_rows=n_rows
        )
        if pts.ndim != 2 or pts.shape[0] == 0:
            raise ValueError(
                "cannot fit a ProductQuantizer: empty training sample — "
                "corpus is empty, or an overstated n_rows hint shrank the "
                "sample fraction below one row (ADVICE r15)"
            )
        # dim from the sample itself — the separate head() probe was one
        # more driver job per family in the build pool (r15 opt)
        dim = pts.shape[1]
        if dim % m:
            raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
        if offload_fit:
            books = run_fit_forked(
                _train_subspace_books, pts, m, ksub, seed, iters
            )
        else:
            books = _train_subspace_books(pts, m, ksub, seed, iters)
        return ProductQuantizer(books, id_col, vec_col)

    def encode(self, df: DataFrame, code_col: str = "pq_codes") -> DataFrame:
        """Corpus → (…, pq_codes binary): per-subspace argmin against the
        codebooks — one (batch × ksub) matmul per subspace per Arrow batch,
        emitted as M uint8 bytes per row."""
        books = self.codebooks
        m, dsub = self.m, self.dsub
        exact = self.exact_fold

        @F.pandas_udf("binary")
        def _enc(vecs: pd.Series) -> pd.Series:
            v = np.stack([np.asarray(x, dtype=np.float64) for x in vecs])
            codes = np.empty((len(v), m), dtype=np.uint8)
            for i in range(m):
                sub = v[:, i * dsub : (i + 1) * dsub]
                cb = books[i]
                if exact:
                    # order-pinned: ((x0-c0)² + (x1-c1)²) + … — argmin
                    # over bit-identical doubles to the SQL oracle's
                    d = (sub[:, 0, None] - cb[None, :, 0]) ** 2
                    for t in range(1, dsub):
                        d = d + (sub[:, t, None] - cb[None, :, t]) ** 2
                else:
                    d = (
                        (sub * sub).sum(axis=1)[:, None]
                        - 2.0 * (sub @ cb.T)
                        + (cb * cb).sum(axis=1)[None, :]
                    )
                codes[:, i] = d.argmin(axis=1)
            return pd.Series([c.tobytes() for c in codes])

        return df.withColumn(code_col, _enc(F.col(self.vec_col)))

    def adc_table(self, query: Sequence[float]) -> np.ndarray:
        q = np.asarray(list(query), dtype=np.float64)
        if q.shape[0] != self.m * self.dsub:
            raise ValueError(
                f"dimension mismatch: query has {q.shape[0]} components, "
                f"index dim is {self.m * self.dsub}"
            )
        table = np.empty((self.m, self.ksub))
        for i in range(self.m):
            qs = q[i * self.dsub : (i + 1) * self.dsub]
            if self.exact_fold:
                acc = (self.codebooks[i][:, 0] - qs[0]) ** 2
                for t in range(1, self.dsub):
                    acc = acc + (self.codebooks[i][:, t] - qs[t]) ** 2
                table[i] = acc
            else:
                diff = self.codebooks[i] - qs[None, :]
                table[i] = (diff * diff).sum(axis=1)
        return table

    def _adc_scores(
        self, encoded: DataFrame, query: Sequence[float], code_col: str
    ) -> DataFrame:
        table = self.adc_table(query)
        m = self.m
        exact = self.exact_fold

        @F.pandas_udf("double")
        def _adc(codes: pd.Series) -> pd.Series:
            c = np.frombuffer(b"".join(codes), dtype=np.uint8).reshape(-1, m)
            t = table[np.arange(m)[None, :], c]
            if exact:
                # subspace-order left fold, mirroring the oracle's
                # list_reduce over list(d ORDER BY s)
                acc = t[:, 0].copy()
                for s in range(1, m):
                    acc = acc + t[:, s]
                return pd.Series(acc)
            return pd.Series(t.sum(axis=1))

        return encoded.select(self.id_col, _adc(F.col(code_col)).alias("distance"))

    def search(
        self,
        encoded: DataFrame,
        query: Sequence[float],
        k: int,
        code_col: str = "pq_codes",
        rerank: DataFrame | None = None,
        shortlist: int = 0,
        predicate: Column | None = None,
    ) -> DataFrame:
        """ADC top-k over the codes column (the only column scanned).

        With ``rerank`` (the raw-vector corpus) the ADC pass selects a
        ``shortlist``-size candidate set (default 4·k) and exact squared-L2
        on the raw vectors of those L rows produces the final ordering —
        the faiss IVFPQ+refine pattern.

        ``predicate`` pre-filters the encoded corpus before ADC scoring
        (result = top-k of matching rows, min(k, matches) — the same
        contract as exact filtered kNN and the IVF/LSH/graph paths;
        ≅ usearch filtered_search, reference:
        src/core/index/usearch_index.rs:68-85). Metadata predicates push
        to the parquet scan of the codes table, so a filtered ADC pass
        reads even fewer bytes than an unfiltered one.
        """
        if k < 1:
            raise ValueError("k must be >= 1")
        if predicate is not None:
            encoded = encoded.filter(predicate)
        scored = self._adc_scores(encoded, query, code_col)
        if rerank is None:
            return scored.orderBy(
                F.col("distance").asc(), F.col(self.id_col).asc()
            ).limit(k)
        return shortlist_rerank(
            scored, rerank, query, k, shortlist or 4 * k,
            self.id_col, self.vec_col,
        )

    def reconstruct(self, codes: bytes | Sequence[int]) -> np.ndarray:
        idx = (
            np.frombuffer(codes, dtype=np.uint8)
            if isinstance(codes, (bytes, bytearray))
            else np.asarray(list(codes), dtype=np.int64)
        )
        return np.concatenate(
            [self.codebooks[i][int(idx[i])] for i in range(self.m)]
        )


FROZEN_DOC_PQ_PATH = "artifacts/pq_codebooks_docs.json"


def load_frozen_doc_pq(
    id_col: str = "vec_id", vec_col: str = "embedding"
) -> "ProductQuantizer":
    """The FROZEN (m=16, ksub=64) codebooks — one pinned fit over the
    sf0.01 embeddings fixture (seed=42, iters=8), persisted as repr()
    strings so the JSON round-trip is bit-exact and the serving gate and
    its DuckDB oracle parse the SAME doubles (the pca_docs.json pattern,
    VERDICT r13 #2). Returned in exact_fold mode: every distance is an
    order-pinned left fold the oracle replays term-for-term. Quantizers,
    like rotations and tokenizers, train once and ship — the fit
    machinery stays hash-gated by pq_rerank_full_shortlist."""
    import json
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        FROZEN_DOC_PQ_PATH,
    )
    with open(path) as f:
        art = json.load(f)
    books = np.asarray(
        [
            [[float(x) for x in c] for c in sub]
            for sub in art["codebooks"]
        ],
        dtype=np.float64,
    )
    return ProductQuantizer(books, id_col, vec_col, exact_fold=True)
