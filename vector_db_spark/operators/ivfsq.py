"""IVF-SQ: coarse cells + int8 scalar quantization — faiss's
``IndexIVFScalarQuantizer`` analogue, the middle rung of the compression
ladder between raw-vector IVF (operators/ann.py) and IVF-PQ
(operators/ivfpq.py).

The reference's factory exposes flat/HNSW backends only
(/root/reference/src/core/index_factory.rs:85-156); at 100 TB the scan
bytes of the float32 vector column dominate probe cost, and the affine
int8 codec (operators/quantize.py) cuts them 4x while staying PURE
CODEGEN end to end:

- **build**: one IVF assignment (reusable pre-built quantizer, the faiss
  composition) + one global min/max fit + a zip_with encode — the stored
  layout is cell-partitioned ``(id, metadata..., cluster_id, codes
  array<int>)`` — every column except the raw vector (so metadata
  predicates push down), the float32 vector itself is NOT retained (same storage contract as faiss IVF-SQ; exact
  rerank joins an external raw frame).
- **search**: probe = parquet partition pruning on cluster_id; approx
  distance = squared L2 over the DECODED vectors, a native zip_with fold
  inside whole-stage codegen — no Python, no Arrow, no ADC tables. The
  codec's floor(+0.5) law is engine-portable (see quantize.py), so unlike
  ADC the approx path itself is value-exact against a SQL oracle.
- **rerank** (optional): shortlist ids join an external raw-vector frame
  for exact final distances — full probe + corpus-sized shortlist
  degenerates to exact kNN (the `ivfsq_rerank_exhaustive` gate).

Deletes follow the family-wide tombstone contract (operators/
tombstones.py): append-only manifest, broadcast anti-join on probe,
vacuum() compacts.
"""

from __future__ import annotations

import json
import os
from collections.abc import Sequence

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_db_spark.operators.ann import _CLUSTER_COL, IvfIndex, write_partitioned
from vector_db_spark.operators.quantize import ScalarQuantizer
from vector_db_spark.operators.tombstones import (
    apply_tombstones,
    clear_tombstones,
    load_tombstones,
    merge_tombstones,
    tombstone_df,
    write_tombstones,
)

CODE_COL = "sq_codes"


class IvfSqIndex:
    def __init__(
        self,
        ivf: IvfIndex,
        sq: ScalarQuantizer,
        encoded: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ):
        self.ivf = ivf
        self.sq = sq
        self.encoded = encoded  # corpus columns minus vec + cluster_id + sq_codes
        self.id_col = id_col
        self.vec_col = vec_col
        self.tombstones: DataFrame | None = None

    @staticmethod
    def build(
        corpus: DataFrame,
        nlist: int = 16,
        seed: int = 42,
        max_iter: int = 20,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        ivf: IvfIndex | None = None,
    ) -> "IvfSqIndex":
        """``ivf`` accepts a pre-built L2 coarse quantizer over the same
        corpus (faiss composition — a deployment reuses its serving IVF's
        KMeans fit instead of refitting)."""
        if ivf is None:
            ivf = IvfIndex.build(
                corpus,
                nlist=nlist,
                seed=seed,
                id_col=id_col,
                vec_col=vec_col,
                max_iter=max_iter,
                metric="l2",
            )
        elif ivf.metric != "l2":
            raise ValueError("IVF-SQ requires an L2 coarse quantizer")
        sq = ScalarQuantizer.fit(corpus, vec_col=vec_col)
        # Every column EXCEPT the raw vector rides into the codes layout
        # (same contract as IVF-PQ): metadata predicates push down into
        # the pruned scan, while the dominant payload — the float32
        # vector — is replaced by its int8 codes (1/4 the bytes).
        encoded = ivf.assignments.select(
            *[c for c in ivf.assignments.columns if c != vec_col],
            sq.encode(F.col(vec_col)).alias(CODE_COL),
        )
        return IvfSqIndex(ivf, sq, encoded, id_col, vec_col)

    def save(self, path: str) -> None:
        write_partitioned(
            self.encoded,
            [_CLUSTER_COL],
            os.path.join(path, "encoded"),
            n_dirs=len(self.ivf.centroids),
        )
        np.save(os.path.join(path, "centroids.npy"), np.asarray(self.ivf.centroids))
        np.save(
            os.path.join(path, "sq_bounds.npy"),
            np.asarray([self.sq.lo, self.sq.hi]),
        )
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump({"id_col": self.id_col, "vec_col": self.vec_col}, f)
        tomb_ids = (
            [r[0] for r in self.tombstones.collect()]
            if self.tombstones is not None
            else []
        )
        clear_tombstones(path)
        if tomb_ids:
            write_tombstones(
                tombstone_df(self.encoded.sparkSession, tomb_ids), path
            )

    @staticmethod
    def load(spark: SparkSession, path: str) -> "IvfSqIndex":
        centroids = np.load(os.path.join(path, "centroids.npy")).tolist()
        lo, hi = np.load(os.path.join(path, "sq_bounds.npy"))
        encoded = spark.read.parquet(os.path.join(path, "encoded"))
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        ivf = IvfIndex(centroids, encoded, meta["id_col"], meta["vec_col"], "l2")
        idx = IvfSqIndex(
            ivf,
            ScalarQuantizer(lo.tolist(), hi.tolist()),
            encoded,
            meta["id_col"],
            meta["vec_col"],
        )
        idx.tombstones = load_tombstones(spark, path)
        return idx

    def append(self, new_rows: DataFrame, path: str | None = None) -> "IvfSqIndex":
        """Incremental maintenance with BOTH quantizers frozen: new rows
        assign to the existing centroids (Arrow GEMM) and encode through
        the existing affine codec; with ``path`` only the new files land
        in the cell layout. A new vector outside the fitted [lo, hi]
        range CLAMPS to the codec boundary (faiss SQ has the identical
        property) — its decoded distance degrades gracefully and the
        rerank path restores exactness; refit on the retrain cadence.
        Same tombstone caveat as IvfIndex.append: appending a tombstoned
        id does not resurrect it until compaction."""
        from vector_db_spark.operators.ann import _nearest_centroid_arrow

        assigned = _nearest_centroid_arrow(
            new_rows, self.vec_col, self.ivf.centroids, "l2", None
        )
        encoded_new = assigned.select(
            *[c for c in self.encoded.columns if c != CODE_COL],
            self.sq.encode(F.col(self.vec_col)).alias(CODE_COL),
        )
        if path is not None:
            encoded_new.write.mode("append").partitionBy(_CLUSTER_COL).parquet(
                os.path.join(path, "encoded")
            )
        self.encoded = self.encoded.unionByName(encoded_new)
        return self

    def delete(self, ids, path: str | None = None) -> "IvfSqIndex":
        """Tombstone delete (≅ faiss remove_vectors, reference:
        src/core/index/faiss_index.rs:131-138) — see IvfIndex.delete."""
        spark = self.encoded.sparkSession
        col = (
            self.id_col
            if isinstance(ids, DataFrame) and self.id_col in ids.columns
            else None
        )
        tomb = tombstone_df(spark, ids, col)
        self.tombstones = merge_tombstones(self.tombstones, tomb)
        if path is not None:
            write_tombstones(tomb, path)
        return self

    def _live(self) -> DataFrame:
        return apply_tombstones(self.encoded, self.id_col, self.tombstones)

    def vacuum(self, path: str) -> "IvfSqIndex":
        out = IvfSqIndex(self.ivf, self.sq, self._live(), self.id_col, self.vec_col)
        out.save(path)
        return IvfSqIndex.load(self.encoded.sparkSession, path)

    def _decoded_dist(self, query: Sequence[float]) -> Column:
        """Squared L2 between the decoded codes and the query — one
        zip_with fold over the decode expression, all codegen. Left-to-
        right float64 fold, same association the oracle SQL emits."""
        from vector_db_spark.functions.vector import l2_sq
        from vector_db_spark.operators.knn import query_literal

        return l2_sq(self.sq.decode(F.col(CODE_COL)), query_literal(query))

    def search(
        self,
        query: Sequence[float],
        k: int,
        nprobe: int = 4,
        shortlist: int = 0,
        rerank: DataFrame | None = None,
        predicate: Column | None = None,
    ) -> DataFrame:
        """Decoded-distance top-k over probed cells; with ``rerank`` (a
        raw-vector frame) the ``shortlist`` best candidates get exact
        final distances. ``predicate`` pre-filters probed rows (applies
        over the encoded frame's columns)."""
        if k < 1:
            raise ValueError("k must be >= 1")
        if nprobe < 1:
            raise ValueError("nprobe must be >= 1")
        probes = self.ivf.probe_order(query)[:nprobe]
        cands = self._live().filter(F.col(_CLUSTER_COL).isin(probes))
        if predicate is not None:
            cands = cands.filter(predicate)
        scored = cands.select(
            self.id_col, self._decoded_dist(query).alias("distance")
        )
        if rerank is None:
            return scored.orderBy(
                F.col("distance").asc(), F.col(self.id_col).asc()
            ).limit(k)
        from vector_db_spark.operators.knn import knn

        ell = shortlist or 4 * k
        if ell < k:
            raise ValueError("shortlist must be >= k")
        cand_ids = (
            scored.orderBy(F.col("distance").asc(), F.col(self.id_col).asc())
            .limit(ell)
            .select(self.id_col)
        )
        short = rerank.join(F.broadcast(cand_ids), on=self.id_col, how="inner")
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
        """Batch formulation, no driver loop: rank cells per query (Arrow
        GEMM), broadcast the probed (query, cell) set against the
        cell-partitioned codes, score decoded distances in codegen, one
        window per stage. Same contract as IvfIndex.search_batch;
        ``rerank`` joins exact distances over the shortlist. Returns
        (query_id, id, distance, rank)."""
        if k < 1:
            raise ValueError("k must be >= 1")
        if nprobe < 1:
            raise ValueError("nprobe must be >= 1")
        from vector_db_spark.functions.vector import l2_sq
        from vector_db_spark.operators.ann import _probe_cells_arrow

        probed = _probe_cells_arrow(
            queries, query_id_col, query_vec_col, self.ivf.centroids, "l2", nprobe
        )
        corpus = self._live()
        if predicate is not None:
            corpus = corpus.filter(predicate)
        cands = corpus.join(F.broadcast(probed), on=_CLUSTER_COL)
        scored = cands.select(
            query_id_col,
            self.id_col,
            l2_sq(self.sq.decode(F.col(CODE_COL)), F.col(query_vec_col)).alias(
                "distance"
            ),
        )
        w = Window.partitionBy(query_id_col).orderBy(
            F.col("distance").asc(), F.col(self.id_col).asc()
        )
        ranked = scored.withColumn("rank", F.row_number().over(w))
        if rerank is None:
            return ranked.filter(F.col("rank") <= k)
        ell = shortlist or 4 * k
        if ell < k:
            raise ValueError("shortlist must be >= k")
        short_ids = ranked.filter(F.col("rank") <= ell).select(
            query_id_col, self.id_col
        )
        qside = queries.select(query_id_col, query_vec_col)
        exact = (
            rerank.join(F.broadcast(short_ids), on=self.id_col)
            .join(F.broadcast(qside), on=query_id_col)
            .select(
                query_id_col,
                self.id_col,
                l2_sq(F.col(self.vec_col), F.col(query_vec_col)).alias(
                    "distance"
                ),
            )
        )
        w2 = Window.partitionBy(query_id_col).orderBy(
            F.col("distance").asc(), F.col(self.id_col).asc()
        )
        return exact.withColumn("rank", F.row_number().over(w2)).filter(
            F.col("rank") <= k
        )
