"""PCA-compressed vector search — the rotation rung of the compression
ladder (float32 → PCA-k floats → int8 → PQ → sign bits).

The standard pre-processing in front of PQ at scale (OPQ's ancestor):
project vectors onto the top-k principal directions, search in the
compact space, re-rank the shortlist with full-precision vectors. For a
64-dim corpus at k=8, the projected column is 32 bytes vs 256 — an 8×
scan-byte cut whose error concentrates in the discarded low-variance
directions.

Spark decomposition (same shape as the IVF quantizer,
operators/ann.py):

- **Fit on a bounded sample, driver-side** — mean + covariance
  eigenvectors of ≤ `sample_rows` vectors (O(sample·dim²) NumPy work,
  corpus-size-independent). Component signs are canonicalized (largest
  |component| positive) so the learned basis is reproducible from the
  same sample.
- **Projection is a codegen expression** — y_j = x·w_j − c_j with the
  basis inlined as literals (k·dim terms: k=8 × dim=64 = 512, inside
  the planner ceiling documented at ann._EXPR_ASSIGN_MAX); no Python in
  the scan path. Persist the projected column next to the ids and the
  shortlist stage reads ONLY it.
- **Rotation invariance gives the exactness gate**: with k = dim the
  projection is a full orthonormal basis, L2 distances are preserved
  bit-for-imperceptibly, and shortlist→rerank must reproduce exact kNN —
  pinned in tests; reduced-k recall is pinned separately.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_db_spark.operators.knn import knn


class PcaModel:
    def __init__(self, mean: np.ndarray, components: np.ndarray):
        self.mean = mean  # (dim,)
        self.components = components  # (k, dim), rows orthonormal

    @property
    def k(self) -> int:
        return int(self.components.shape[0])


def fit_pca(
    corpus: DataFrame,
    k: int,
    vec_col: str = "embedding",
    sample_rows: int = 8192,
    seed: int = 42,
) -> PcaModel:
    """Top-k principal directions from a bounded sample (the same
    sampled-fit trade as the IVF quantizer — fitting a rotation over
    100 TB is pure waste)."""
    dim_row = corpus.select(F.size(vec_col)).head()
    if dim_row is None:
        raise ValueError("corpus is empty")
    dim = dim_row[0]
    if not 1 <= k <= dim:
        raise ValueError(f"k must be in [1, {dim}]")
    n = corpus.count()
    sampled = corpus.select(F.col(vec_col).alias("v"))
    if n > sample_rows:
        sampled = sampled.sample(fraction=min(1.0, 1.2 * sample_rows / n), seed=seed)
    pts = np.asarray(
        [r.v for r in sampled.limit(sample_rows).collect()], dtype=np.float64
    )
    mean = pts.mean(axis=0)
    centered = pts - mean
    # eigh on the dim×dim covariance: deterministic LAPACK, ascending order
    cov = centered.T @ centered / max(1, len(pts) - 1)
    vals, vecs = np.linalg.eigh(cov)
    comps = vecs[:, ::-1][:, :k].T  # top-k, rows = components
    # canonical sign: the largest-|value| entry of each component positive
    for j in range(comps.shape[0]):
        i = int(np.abs(comps[j]).argmax())
        if comps[j, i] < 0:
            comps[j] = -comps[j]
    return PcaModel(mean, comps)


def _dot_literal(vec: Column, w: Sequence[float]) -> Column:
    lit = F.array(*[F.lit(float(x)) for x in w])
    return F.aggregate(
        F.zip_with(vec, lit, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda a, v: a + v,
    )


def _fold_dot(a, b) -> float:
    """Order-pinned left-associated float64 dot — the driver-side twin
    of _dot_literal's Spark fold and of oracle.dot_sql's `+` chain, so a
    frozen-rotation oracle reproduces projections bit-exactly (numpy's
    BLAS dot is pairwise-summed and bit-incomparable)."""
    s = 0.0
    for x, y in zip(a, b):
        s += float(x) * float(y)
    return s


def project(model: PcaModel, vec: Column) -> Column:
    """array<float> → array<double> of k principal coordinates, pure
    codegen: y_j = x·w_j − mean·w_j (the mean folds into a constant,
    computed with the order-pinned fold for oracle parity)."""
    return F.array(
        *[
            _dot_literal(vec, model.components[j])
            - F.lit(_fold_dot(model.components[j], model.mean))
            for j in range(model.k)
        ]
    )


FROZEN_DOC_PCA_PATH = "artifacts/pca_docs.json"


def load_frozen_doc_pca() -> PcaModel:
    """The FROZEN k=24 rotation (one pinned fit_pca over the sf0.01
    embeddings fixture, VERDICT r12 #4's freeze pattern): mean and
    components persist as repr() strings so the JSON round-trip is
    bit-exact, and both the serving gate and its DuckDB oracle parse
    the SAME doubles. Rotations, like classifiers and tokenizers, train
    once and ship — the fit stays exercised by pca_rerank_full_rank and
    the reduced-rank recall pins."""
    import json
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), FROZEN_DOC_PCA_PATH)
    with open(path) as f:
        art = json.load(f)
    mean = np.asarray([float(x) for x in art["mean"]], dtype=np.float64)
    comps = np.asarray(
        [[float(x) for x in row] for row in art["components"]], dtype=np.float64
    )
    return PcaModel(mean, comps)


def pca_shortlist_rerank(
    corpus: DataFrame,
    model: PcaModel,
    query: Sequence[float],
    k: int,
    shortlist: int = 100,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Two-stage search: L2 shortlist in PCA space (scan reads k doubles
    per row once the projected column is persisted), exact L2 re-rank of
    the shortlist against raw vectors. Deterministic cuts at both stages
    (ties by id)."""
    if shortlist < k:
        raise ValueError("shortlist must be >= k")
    q = [float(x) for x in query]
    centered = [qi - mi for qi, mi in zip(q, model.mean)]
    # order-pinned fold (not numpy matvec) — see _fold_dot
    qp = [_fold_dot(model.components[j], centered) for j in range(model.k)]
    projected = corpus.withColumn("__pca", project(model, F.col(vec_col)))
    cand = knn(
        projected,
        qp,
        shortlist,
        metric="l2",
        vec_col="__pca",
        id_col=id_col,
    ).select(id_col)
    joined = corpus.join(F.broadcast(cand), id_col)
    return knn(joined, query, k, metric="l2", vec_col=vec_col, id_col=id_col)


def save_pca(model: PcaModel, path: str) -> None:
    """Persist the rotation (mean + components) — tiny driver-side
    arrays, same artifact pattern as IvfIndex.save."""
    import os

    os.makedirs(path, exist_ok=True)
    np.save(os.path.join(path, "mean.npy"), model.mean)
    np.save(os.path.join(path, "components.npy"), model.components)


def load_pca(path: str) -> PcaModel:
    import os

    return PcaModel(
        np.load(os.path.join(path, "mean.npy")),
        np.load(os.path.join(path, "components.npy")),
    )
