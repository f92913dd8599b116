"""OPQ — Optimized Product Quantization (Ge et al., CVPR 2013; faiss's
``OPQ`` pre-transform): learn an orthonormal rotation R that minimizes
PQ quantization error, encode R·x, search with rotated queries.

Plain PQ quantizes each subspace independently, so its error is hostage
to how variance happens to fall across the arbitrary dim-order subspace
split. OPQ alternates two closed-form steps on the SAME bounded training
sample the PQ fit uses (driver-side, corpus-size-independent — the
IvfIndex/ProductQuantizer fit policy):

1. fix R → train per-subspace codebooks on the rotated sample
   (exactly `ProductQuantizer.fit`'s Lloyd iterations);
2. fix the codebooks → the error-minimizing orthonormal R is the
   orthogonal Procrustes solution: SVD of Ŷᵀ X (reconstructions ×
   inputs), R = U Vᵀ.

R is initialized to I, and the returned model keeps the (R, codebooks)
pair with the LOWEST training reconstruction error seen — iteration 0
is therefore exactly plain PQ, so OPQ's training error is ≤ plain PQ's
BY CONSTRUCTION at equal code budget (pinned in tests/test_pq.py along
with the search-recall comparison).

Rotation is applied inside the SAME Arrow encode kernel that computes
the codes (a dim×dim literal-expression rotation would blow the
Catalyst planning ceiling, ann.py's measured limit); queries rotate
driver-side (one dim×dim matvec). Because R is orthonormal, L2 is
preserved — ADC in the rotated space approximates the TRUE distance,
and the rerank stage uses the raw corpus vectors with the unrotated
query unchanged. Scan cost, code bytes, and the search plan are
IDENTICAL to plain PQ; only the codebook geometry improves.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_db_spark.operators.pq import (
    ProductQuantizer,
    _lloyd,
    sample_training_points,
    shortlist_rerank,
)


def _train_books(pts: np.ndarray, m: int, ksub: int, seed: int, iters: int) -> np.ndarray:
    dsub = pts.shape[1] // m
    return np.stack(
        [
            _lloyd(pts[:, i * dsub : (i + 1) * dsub], ksub, seed + i, iters)
            for i in range(m)
        ]
    )


def _encode_np(pts: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, dim) -> (n, m) uint8 codes against (m, ksub, dsub) books."""
    m, _, dsub = books.shape
    codes = np.empty((pts.shape[0], m), dtype=np.uint8)
    for i in range(m):
        sub = pts[:, i * dsub : (i + 1) * dsub]
        cb = books[i]
        d = (
            (sub * sub).sum(axis=1)[:, None]
            - 2.0 * (sub @ cb.T)
            + (cb * cb).sum(axis=1)[None, :]
        )
        codes[:, i] = d.argmin(axis=1)
    return codes


def _encode_np_exact(pts: np.ndarray, books: np.ndarray) -> np.ndarray:
    """Order-pinned twin of _encode_np: per-centroid distances as
    left-associated squared-diff folds (no expansion form/BLAS), so an
    SQL oracle replaying the same expression tree argmins over
    bit-identical doubles (round-14 freeze conversion)."""
    m, _, dsub = books.shape
    codes = np.empty((pts.shape[0], m), dtype=np.uint8)
    for i in range(m):
        sub = pts[:, i * dsub : (i + 1) * dsub]
        cb = books[i]
        d = (sub[:, 0, None] - cb[None, :, 0]) ** 2
        for t in range(1, dsub):
            d = d + (sub[:, t, None] - cb[None, :, t]) ** 2
        codes[:, i] = d.argmin(axis=1)
    return codes


def _rotate_exact(v: np.ndarray, rot: np.ndarray) -> np.ndarray:
    """Order-pinned rotation v @ rotᵀ: each output dim j is the left
    fold ((v0·r_j0 + v1·r_j1) + …) — one vectorized multiply-add per
    input dim, never a blocked GEMM."""
    out = np.empty((v.shape[0], rot.shape[0]), dtype=np.float64)
    for j in range(rot.shape[0]):
        acc = v[:, 0] * rot[j, 0]
        for d in range(1, rot.shape[1]):
            acc = acc + v[:, d] * rot[j, d]
        out[:, j] = acc
    return out


def _reconstruct_np(codes: np.ndarray, books: np.ndarray) -> np.ndarray:
    return np.concatenate(
        [books[i][codes[:, i]] for i in range(books.shape[0])], axis=1
    )


def _opq_alternating_fit(
    pts: np.ndarray, m: int, ksub: int, seed: int, iters: int, opq_iters: int
) -> tuple[np.ndarray, np.ndarray]:
    """The pure-NumPy alternating Lloyd/Procrustes loop of OPQ fit:
    (sample matrix) → (rotation, codebooks) keeping the best pair by
    training MSE. Module-level and side-effect-free so it can run either
    on the driver thread or shipped to an executor task (fit offload,
    guide §5 — the driver should do almost no data work); both paths run
    the IDENTICAL operation sequence on the identical input, so the
    artifact is bit-equal by construction."""
    dim = pts.shape[1]
    rot = np.eye(dim)
    best = None  # (mse, rot, books)
    for _ in range(max(1, opq_iters)):
        rotated = pts @ rot.T
        books = _train_books(rotated, m, ksub, seed, iters)
        recon = _reconstruct_np(_encode_np(rotated, books), books)
        mse = float(((rotated - recon) ** 2).sum(axis=1).mean())
        if best is None or mse < best[0]:
            best = (mse, rot.copy(), books)
        # Procrustes: R minimizing ||X Rᵀ − Ŷ||_F over orthonormal R
        u, _, vt = np.linalg.svd(recon.T @ pts)
        rot = u @ vt
    _, rot, books = best
    return rot, books


class OpqQuantizer:
    """Rotation + product quantizer; codes are M-byte binary, the same
    storage/scan footprint as plain PQ at equal (m, ksub)."""

    def __init__(self, rotation: np.ndarray, pq: ProductQuantizer):
        self.rotation = rotation  # (dim, dim), orthonormal rows
        self.pq = pq
        self.id_col = pq.id_col
        self.vec_col = pq.vec_col

    @property
    def exact_fold(self) -> bool:
        """Order-pinned arithmetic mode — carried by the wrapped PQ (see
        ProductQuantizer.exact_fold); when set, the rotation too is
        applied as per-output-dim left-associated folds instead of a
        GEMM, so the DuckDB oracle can replay it bit-exactly."""
        return self.pq.exact_fold

    @staticmethod
    def fit(
        corpus: DataFrame,
        m: int = 8,
        ksub: int = 256,
        seed: int = 42,
        iters: int = 10,
        opq_iters: int = 8,
        sample_per_code: int = 64,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        n_rows: int | None = None,
        offload_fit: bool = False,
    ) -> "OpqQuantizer":
        """Alternating Lloyd/Procrustes on a bounded sample. Keeps the
        best (R, codebooks) by training reconstruction MSE, so the
        result is never worse than plain PQ on the training sample.

        ``offload_fit=True`` runs the NumPy alternating loop in a FORKED
        child process (pq.run_fit_forked) instead of the calling driver
        thread — guide §5: concurrent index builds from driver threads
        (bench.py's pool) serialize their Python-level fit loops on the
        driver GIL. The child has its own interpreter, so the fit
        overlaps truly with sibling builds; fork (same process image,
        same BLAS state) is what keeps the SVD bit-equal — a Spark
        executor worker measurably is NOT (see run_fit_forked). Pinned
        by tests/test_pq.py::test_opq_offload_fit_bit_identical and the
        frozen opq_adc_knn probe gate."""
        if not 1 <= ksub <= 256:
            raise ValueError("ksub must be in [1, 256] (uint8 codes)")
        pts = sample_training_points(
            corpus, vec_col, ksub * sample_per_code, seed, n_rows=n_rows
        )
        if pts.ndim != 2 or pts.shape[0] == 0:
            raise ValueError(
                "cannot fit an OpqQuantizer: empty training sample — "
                "corpus is empty, or an overstated n_rows hint shrank the "
                "sample fraction below one row (ADVICE r15)"
            )
        # dim from the sample — drops the head() probe job (r15 opt)
        dim = pts.shape[1]
        if dim % m:
            raise ValueError(f"dim {dim} not divisible by m={m} subspaces")

        if offload_fit:
            from vector_db_spark.operators.pq import run_fit_forked

            rot, books = run_fit_forked(
                _opq_alternating_fit, pts, m, ksub, seed, iters, opq_iters
            )
        else:
            rot, books = _opq_alternating_fit(
                pts, m, ksub, seed, iters, opq_iters
            )
        pq = ProductQuantizer(books, id_col, vec_col)
        return OpqQuantizer(rot, pq)

    def train_mse(self, pts: np.ndarray) -> float:
        """Mean squared reconstruction error of ``pts`` under this model
        (rotation-space — comparable to plain PQ's error on the same
        points because R is orthonormal)."""
        rotated = np.asarray(pts, dtype=np.float64) @ self.rotation.T
        recon = _reconstruct_np(
            _encode_np(rotated, self.pq.codebooks), self.pq.codebooks
        )
        return float(((rotated - recon) ** 2).sum(axis=1).mean())

    def encode(self, df: DataFrame, code_col: str = "opq_codes") -> DataFrame:
        """Corpus → (…, opq_codes binary): rotation + per-subspace argmin
        fused in one Arrow kernel (same batch matmul count as PQ encode
        plus one GEMM for the rotation)."""
        rot = self.rotation
        books = self.pq.codebooks
        exact = self.exact_fold

        @F.pandas_udf("binary")
        def _enc(vecs: pd.Series) -> pd.Series:
            v = np.stack([np.asarray(x, dtype=np.float64) for x in vecs])
            if exact:
                codes = _encode_np_exact(_rotate_exact(v, rot), books)
            else:
                codes = _encode_np(v @ rot.T, books)
            return pd.Series([c.tobytes() for c in codes])

        return df.withColumn(code_col, _enc(F.col(self.vec_col)))

    def _rotate_query(self, query: Sequence[float]) -> np.ndarray:
        q = np.asarray(list(query), dtype=np.float64)
        if q.shape[0] != self.rotation.shape[1]:
            raise ValueError(
                f"dimension mismatch: query has {q.shape[0]} components, "
                f"index dim is {self.rotation.shape[1]}"
            )
        if self.exact_fold:
            return _rotate_exact(q[None, :], self.rotation)[0]
        return self.rotation @ q

    def search(
        self,
        encoded: DataFrame,
        query: Sequence[float],
        k: int,
        code_col: str = "opq_codes",
        rerank: DataFrame | None = None,
        shortlist: int = 0,
        predicate: Column | None = None,
    ) -> DataFrame:
        """ADC top-k in the rotated space; with ``rerank`` the shortlist
        is re-scored EXACTLY on raw vectors with the unrotated query
        (valid because R preserves L2). ``shortlist >= |corpus|`` makes
        the result identical to exact kNN — the lossless-configuration
        gate (opq_rerank_full)."""
        if k < 1:
            raise ValueError("k must be >= 1")
        q_rot = self._rotate_query(query)
        if predicate is not None:
            encoded = encoded.filter(predicate)
        scored = self.pq._adc_scores(encoded, q_rot, code_col)
        if rerank is None:
            return scored.orderBy(
                F.col("distance").asc(), F.col(self.id_col).asc()
            ).limit(k)
        # shared refinement tail — exact distances against the UNROTATED
        # query on the raw corpus (L2 invariance of R)
        return shortlist_rerank(
            scored, rerank, query, k, shortlist or 4 * k,
            self.id_col, self.vec_col,
        )

    def save(self, path: str) -> None:
        import os

        os.makedirs(path, exist_ok=True)
        np.save(os.path.join(path, "rotation.npy"), self.rotation)
        np.save(os.path.join(path, "codebooks.npy"), self.pq.codebooks)
        import json

        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump({"id_col": self.id_col, "vec_col": self.vec_col}, f)

    @staticmethod
    def load(path: str) -> "OpqQuantizer":
        import json
        import os

        rot = np.load(os.path.join(path, "rotation.npy"))
        books = np.load(os.path.join(path, "codebooks.npy"))
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        return OpqQuantizer(
            rot, ProductQuantizer(books, meta["id_col"], meta["vec_col"])
        )


def rotate_corpus(
    df: DataFrame, rotation: np.ndarray, vec_col: str = "embedding"
) -> DataFrame:
    """Replace ``vec_col`` with R·x (one Arrow GEMM per batch — a dim²
    literal expression would stall Catalyst, ann.py's measured ceiling).
    All other columns pass through for predicates/ids."""
    rot = rotation

    @F.pandas_udf("array<double>")
    def _rot(vecs: pd.Series) -> pd.Series:
        v = np.stack([np.asarray(x, dtype=np.float64) for x in vecs])
        out = v @ rot.T
        return pd.Series(list(out))

    return df.withColumn(vec_col, _rot(F.col(vec_col)))


class IvfOpqIndex:
    """faiss's flagship composition ``OPQ{M},IVF{nlist},PQ{M}``: the
    learned rotation feeds the IVF-PQ layout — cells, residuals, and
    codebooks all live in the rotated space, where the PQ subspace split
    wastes less of its code budget.

    The stored artifact is a plain IvfPqIndex over the ROTATED vectors
    plus ``rotation.npy`` — every IVF-PQ property (cell-partitioned
    parquet, partition-pruned ADC probes, tombstones, append with frozen
    quantizers) is inherited by construction, not reimplemented.

    Exactness contract: the shortlist rerank takes the RAW corpus frame
    and the UNROTATED query (L2 is rotation-invariant, but float folds
    are not — reranking rotated copies would be equal only to ~1e-14,
    not bit-exact, so the wrapper reranks against the original floats).
    Full probe + corpus-sized shortlist therefore reproduces exact kNN
    bit-for-bit (gate: ivfopq_exhaustive)."""

    def __init__(self, rotation: np.ndarray, ivfpq) -> None:
        self.rotation = rotation
        self.ivfpq = ivfpq
        self.id_col = ivfpq.id_col
        self.vec_col = ivfpq.vec_col

    @property
    def ivf(self):
        """Uniform coarse-quantizer handle (the late_interaction ``.ivf``
        convention): tuners and catalog maintenance reach the IVF layer
        the same way on every shortlist-rerank family, wrapped or not."""
        return self.ivfpq.ivf

    @staticmethod
    def build(
        corpus: DataFrame,
        nlist: int = 16,
        m: int = 8,
        ksub: int = 256,
        seed: int = 42,
        max_iter: int = 20,
        pq_iters: int = 10,
        opq_iters: int = 8,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> "IvfOpqIndex":
        from vector_db_spark.operators.ivfpq import IvfPqIndex

        # OPQ training (rotation wrt the plain-PQ objective on a bounded
        # sample — the standard faiss pre-transform recipe; the interim
        # codebooks are discarded, residual codebooks retrain below)
        oq = OpqQuantizer.fit(
            corpus,
            m=m,
            ksub=ksub,
            seed=seed,
            iters=pq_iters,
            opq_iters=opq_iters,
            id_col=id_col,
            vec_col=vec_col,
        )
        rotated = rotate_corpus(corpus, oq.rotation, vec_col)
        ivfpq = IvfPqIndex.build(
            rotated,
            nlist=nlist,
            m=m,
            ksub=ksub,
            seed=seed,
            max_iter=max_iter,
            pq_iters=pq_iters,
            id_col=id_col,
            vec_col=vec_col,
        )
        return IvfOpqIndex(oq.rotation, ivfpq)

    def save(self, path: str) -> None:
        import os

        self.ivfpq.save(path)
        np.save(os.path.join(path, "rotation.npy"), self.rotation)

    @staticmethod
    def load(spark, path: str) -> "IvfOpqIndex":
        import os

        from vector_db_spark.operators.ivfpq import IvfPqIndex

        rot = np.load(os.path.join(path, "rotation.npy"))
        return IvfOpqIndex(rot, IvfPqIndex.load(spark, path))

    def append(self, new_rows: DataFrame, path: str | None = None):
        """Frozen rotation + frozen quantizers: new rows rotate, assign,
        and residual-encode against the build-time geometry (the IVF-PQ
        append contract)."""
        self.ivfpq.append(
            rotate_corpus(new_rows, self.rotation, self.vec_col), path=path
        )
        return self

    def delete(self, ids, path: str | None = None):
        self.ivfpq.delete(ids, path=path)
        return self

    @property
    def tombstones(self):
        """Delegated delete manifest (refresh_index's resurrect check
        reads it on every family)."""
        return self.ivfpq.tombstones

    def search(
        self,
        query: Sequence[float],
        k: int,
        nprobe: int = 4,
        shortlist: int = 0,
        rerank: DataFrame | None = None,
        predicate: Column | None = None,
    ) -> DataFrame:
        """ADC over probed cells in rotated space; with ``rerank`` (the
        RAW corpus frame — REQUIRED for the exactness contract, since the
        stored vectors are rotated copies) the L-best ADC candidates are
        exact-reranked against the original floats with the unrotated
        query. ``shortlist`` without ``rerank`` raises."""
        if k < 1:
            raise ValueError("k must be >= 1")
        q = np.asarray(list(query), dtype=np.float64)
        if q.shape[0] != self.rotation.shape[1]:
            raise ValueError(
                f"dimension mismatch: query has {q.shape[0]} components, "
                f"index dim is {self.rotation.shape[1]}"
            )
        q_rot = [float(x) for x in self.rotation @ q]
        if shortlist == 0 and rerank is None:
            return self.ivfpq.search(q_rot, k, nprobe, predicate=predicate)
        if rerank is None:
            raise ValueError(
                "shortlist rerank needs the raw corpus frame (rerank=); "
                "the stored vectors are rotated copies"
            )
        ell = shortlist or 4 * k
        if ell < k:
            raise ValueError("shortlist must be >= k")
        from vector_db_spark.operators.knn import knn

        cand = self.ivfpq.search(
            q_rot, ell, nprobe, predicate=predicate
        ).select(self.id_col)
        short = rerank.join(F.broadcast(cand), on=self.id_col, how="inner")
        return knn(short, query, k, id_col=self.id_col, vec_col=self.vec_col)

    def search_batch(
        self,
        queries: DataFrame,
        k: int,
        nprobe: int = 4,
        shortlist: int = 0,
        rerank: DataFrame | None = None,
        predicate: Column | None = None,
        query_id_col: str = "query_id",
        query_vec_col: str = "query_vec",
    ) -> DataFrame:
        """Batch top-k through the rotated IVF-PQ layout. The query side
        rotates with the same Arrow kernel as the corpus; the inherited
        cogrouped ADC + global-shortlist pipeline runs untouched in
        rotated space; with ``rerank`` (the RAW corpus — required, same
        contract as `search`) the per-query shortlists re-score exactly
        against the original floats with the unrotated queries.
        nprobe >= nlist + corpus-sized shortlist == exact batch kNN
        (gate: ivfopq_batch_exhaustive). Returns
        (query_id, id, distance, rank)."""
        if k < 1:
            raise ValueError("k must be >= 1")
        rotated_q = rotate_corpus(queries, self.rotation, query_vec_col)
        if shortlist == 0 and rerank is None:
            return self.ivfpq.search_batch(
                rotated_q,
                k,
                nprobe,
                predicate=predicate,
                query_id_col=query_id_col,
                query_vec_col=query_vec_col,
            )
        if rerank is None:
            raise ValueError(
                "shortlist rerank needs the raw corpus frame (rerank=); "
                "the stored vectors are rotated copies"
            )
        ell = shortlist or 4 * k
        if ell < k:
            raise ValueError("shortlist must be >= k")
        from pyspark.sql import Window

        from vector_db_spark.operators.knn import _metric

        cand = self.ivfpq.search_batch(
            rotated_q,
            ell,
            nprobe,
            shortlist=ell,
            predicate=predicate,
            query_id_col=query_id_col,
            query_vec_col=query_vec_col,
        ).select(query_id_col, self.id_col)
        expr_fn, _ = _metric("l2")
        qside = queries.select(
            F.col(query_id_col), F.col(query_vec_col)
        )
        scored = (
            rerank.join(F.broadcast(cand), on=self.id_col)
            .join(F.broadcast(qside), on=query_id_col)
            .select(
                query_id_col,
                self.id_col,
                expr_fn(F.col(self.vec_col), F.col(query_vec_col)).alias(
                    "distance"
                ),
            )
        )
        w = Window.partitionBy(query_id_col).orderBy(
            F.col("distance").asc(), F.col(self.id_col).asc()
        )
        return scored.withColumn("rank", F.row_number().over(w)).filter(
            F.col("rank") <= k
        )


FROZEN_DOC_OPQ_PATH = "artifacts/opq_docs.json"


def load_frozen_doc_opq(
    id_col: str = "vec_id", vec_col: str = "embedding"
) -> "OpqQuantizer":
    """The FROZEN OPQ model (64×64 learned rotation + (m=16, ksub=64)
    codebooks) — one pinned fit over the sf0.01 embeddings fixture
    (seed=42, iters=8, opq_iters=6), repr()-string persisted for
    bit-exact round-trips (the pca_docs.json pattern). exact_fold mode:
    rotation, encode, and ADC are order-pinned left folds a DuckDB
    oracle replays bit-exactly; the fit machinery stays hash-gated by
    opq_rerank_full/ivfopq_exhaustive."""
    import json
    import os

    from vector_db_spark.operators.pq import ProductQuantizer

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        FROZEN_DOC_OPQ_PATH,
    )
    with open(path) as f:
        art = json.load(f)
    rot = np.asarray(
        [[float(x) for x in row] for row in art["rotation"]], dtype=np.float64
    )
    books = np.asarray(
        [[[float(x) for x in c] for c in sub] for sub in art["codebooks"]],
        dtype=np.float64,
    )
    return OpqQuantizer(
        rot, ProductQuantizer(books, id_col, vec_col, exact_fold=True)
    )
