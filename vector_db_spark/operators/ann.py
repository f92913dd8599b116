"""Approximate nearest-neighbor indexes, Spark-first.

The reference's approximate backends are in-process graphs (HNSW via
hnsw_rs, src/core/index/hnsw_index.rs; usearch HNSW,
src/core/index/usearch_index.rs) — a pointer-chasing structure that cannot
be a DataFrame. The Spark-native equivalents of "build an index" are
*derived tables*:

- **IvfIndex** — inverted-file index: a KMeans coarse quantizer (MLlib,
  fixed seed) assigns every vector to a cell; the index artifact is the
  corpus partitioned by ``cluster_id``. Search ranks centroids against the
  query (driver-side, nlist is tiny), then scans only ``nprobe`` cells —
  after ``save()``, that is parquet *partition pruning*: at 100 TB with
  nlist=1024 / nprobe=32, a query touches ~3% of the files. Recall is
  tunable via nprobe, and ``nprobe = nlist`` degenerates to exact search
  (which is how the whole pipeline is oracle-verified).
- **CosineLshIndex** — sign-random-projection LSH: ``n_tables`` independent
  sets of ``n_bits`` hyperplanes (deterministic seed); bucket = sign
  bitmask. The artifact is a long-format (table, bucket, id, vec) frame —
  partitionable by (table, bucket) for pruning at scale; candidates are
  exact-reranked. The standard cosine analogue of MLlib's
  BucketedRandomProjectionLSH (which is L2-only).

Both follow the reference's index lifecycle (build ≅ create_index,
search ≅ POST /search) with the build step as a batch job, matching the
north star's "batch-build ANN indexes via Spark" scope.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_db_spark.operators.knn import knn

_CLUSTER_COL = "cluster_id"


def _kmeans_centroids(
    corpus: DataFrame, vec_col: str, nlist: int, seed: int, max_iter: int
) -> list[list[float]]:
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = corpus.select(array_to_vector(F.col(vec_col)).alias("features"))
    model = KMeans(k=nlist, seed=seed, maxIter=max_iter).fit(feats)
    return [c.tolist() for c in model.clusterCenters()]


def _nearest_centroid_expr(vec_col: str, centroids: list[list[float]]) -> Column:
    """argmin-distance cluster assignment as one native expression: the
    centroid list is tiny, so it inlines as literals and evaluates inside
    codegen — no MLlib model or Python needed at assignment time.

    Built as array-of-distances + array_position(array_min) so the
    expression stays LINEAR in nlist (a chained when(d < best_d) rewrite
    doubles the tree per centroid — exponential — and OOMs the driver at
    nlist ≈ 16)."""
    dists = F.array(*[_l2_to_literal(vec_col, c) for c in centroids])
    # array_position is 1-based and takes the FIRST minimum: deterministic
    # tie-break toward the lower cluster id.
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def _l2_to_literal(vec_col: str, center: Sequence[float]) -> Column:
    lit = F.array(*[F.lit(float(x)) for x in center])
    return F.aggregate(
        F.zip_with(F.col(vec_col), lit, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
        F.lit(0.0),
        lambda a, v: a + v,
    )


class IvfIndex:
    def __init__(
        self,
        centroids: list[list[float]],
        assignments: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ):
        self.centroids = centroids
        self.assignments = assignments  # corpus columns + cluster_id
        self.id_col = id_col
        self.vec_col = vec_col

    @staticmethod
    def build(
        corpus: DataFrame,
        nlist: int = 16,
        seed: int = 42,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        max_iter: int = 20,
    ) -> "IvfIndex":
        if nlist < 1:
            raise ValueError("nlist must be >= 1")
        centroids = _kmeans_centroids(corpus, vec_col, nlist, seed, max_iter)
        assignments = corpus.withColumn(
            _CLUSTER_COL, _nearest_centroid_expr(vec_col, centroids)
        )
        return IvfIndex(centroids, assignments, id_col, vec_col)

    def save(self, path: str) -> None:
        """Persist as a cluster-partitioned table — search() after load()
        prunes to the probed partitions (the 100 TB story)."""
        self.assignments.write.mode("overwrite").partitionBy(_CLUSTER_COL).parquet(
            os.path.join(path, "assignments")
        )
        np.save(os.path.join(path, "centroids.npy"), np.asarray(self.centroids))

    @staticmethod
    def load(
        spark: SparkSession,
        path: str,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> "IvfIndex":
        centroids = np.load(os.path.join(path, "centroids.npy")).tolist()
        assignments = spark.read.parquet(os.path.join(path, "assignments"))
        return IvfIndex(centroids, assignments, id_col, vec_col)

    def probe_order(self, query: Sequence[float]) -> list[int]:
        """Centroid ids by ascending distance to the query (driver-side —
        nlist floats, not data)."""
        c = np.asarray(self.centroids, dtype=np.float64)
        q = np.asarray(list(query), dtype=np.float64)
        if q.shape[0] != c.shape[1]:
            raise ValueError(
                f"dimension mismatch: query has {q.shape[0]} components, "
                f"index dim is {c.shape[1]}"
            )
        d = ((c - q) ** 2).sum(axis=1)
        return [int(i) for i in np.argsort(d, kind="stable")]

    def search(
        self,
        query: Sequence[float],
        k: int,
        nprobe: int = 4,
        metric: str = "l2",
        predicate: Column | None = None,
    ) -> DataFrame:
        """Probe the ``nprobe`` nearest cells, exact-rerank inside them.
        ``nprobe >= nlist`` is exhaustive (== exact search)."""
        if nprobe < 1:
            raise ValueError("nprobe must be >= 1")
        probes = self.probe_order(query)[:nprobe]
        cands = self.assignments.filter(F.col(_CLUSTER_COL).isin(probes))
        return knn(
            cands,
            query,
            k,
            metric=metric,
            vec_col=self.vec_col,
            id_col=self.id_col,
            predicate=predicate,
        )


class CosineLshIndex:
    def __init__(
        self,
        planes: np.ndarray,  # (n_tables, n_bits, dim)
        buckets: DataFrame,  # (table, bucket, id, vec)
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ):
        self.planes = planes
        self.buckets = buckets
        self.id_col = id_col
        self.vec_col = vec_col

    @staticmethod
    def build(
        corpus: DataFrame,
        dim: int,
        n_bits: int = 8,
        n_tables: int = 4,
        seed: int = 42,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> "CosineLshIndex":
        rng = np.random.RandomState(seed)
        planes = rng.normal(size=(n_tables, n_bits, dim))
        entries = []
        for t in range(n_tables):
            bucket = F.lit(0).cast("long")
            for j in range(n_bits):
                dot = F.aggregate(
                    F.zip_with(
                        F.col(vec_col),
                        F.array(*[F.lit(float(x)) for x in planes[t, j]]),
                        lambda x, y: x.cast("double") * y,
                    ),
                    F.lit(0.0),
                    lambda a, v: a + v,
                )
                bucket = bucket.bitwiseXOR(
                    F.shiftleft(F.when(dot >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long")), j)
                )
            entries.append(F.struct(F.lit(t).alias("table"), bucket.alias("bucket")))
        long_form = corpus.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("vec"),
            F.explode(F.array(*entries)).alias("tb"),
        ).select("id", "vec", F.col("tb.table").alias("table"), F.col("tb.bucket").alias("bucket"))
        return CosineLshIndex(planes, long_form, id_col, vec_col)

    def query_buckets(
        self, query: Sequence[float], probe_radius: int = 0
    ) -> list[tuple[int, int]]:
        """Buckets to probe per table; ``probe_radius=1`` is classic
        multiprobe — also visit every bucket one sign-flip away (the
        near-boundary hyperplanes are where true neighbors get separated),
        multiplying candidates by (1 + n_bits) without touching the index."""
        q = np.asarray(list(query), dtype=np.float64)
        if q.shape[0] != self.planes.shape[2]:
            raise ValueError(
                f"dimension mismatch: query has {q.shape[0]} components, "
                f"index dim is {self.planes.shape[2]}"
            )
        n_bits = self.planes.shape[1]
        out = []
        for t in range(self.planes.shape[0]):
            bits = (self.planes[t] @ q >= 0).astype(np.int64)
            b = int((bits << np.arange(n_bits)).sum())
            out.append((t, b))
            if probe_radius >= 1:
                out.extend((t, b ^ (1 << j)) for j in range(n_bits))
        return out

    def search(
        self,
        query: Sequence[float],
        k: int,
        metric: str = "cosine",
        probe_radius: int = 1,
    ) -> DataFrame:
        """Union of probed-bucket candidates over all tables, exact-reranked.
        At scale the buckets frame is stored partitioned by (table, bucket)
        so this filter is pure partition pruning."""
        pairs = self.query_buckets(query, probe_radius)
        cond = None
        for t, b in pairs:
            c = (F.col("table") == t) & (F.col("bucket") == b)
            cond = c if cond is None else (cond | c)
        cands = self.buckets.filter(cond).select(
            F.col("id").alias(self.id_col), F.col("vec").alias(self.vec_col)
        ).dropDuplicates([self.id_col])
        return knn(cands, query, k, metric=metric, vec_col=self.vec_col, id_col=self.id_col)
