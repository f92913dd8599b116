"""IVF-PQ: coarse cells + residual product quantization — the composed
billion-scale ANN layout (faiss's IndexIVFPQ; Jégou et al. 2011 §IV).

The reference exposes flat/HNSW in-memory backends only
(src/core/index_factory.rs:85-156); this is the layout that actually
survives 100 TB, built from the two oracle-verified pieces:

- **IvfIndex** (operators/ann.py) assigns every vector to one of nlist
  cells; the artifact is cell-partitioned parquet, so probing is partition
  pruning (read nprobe/nlist of the files).
- **ProductQuantizer** (operators/pq.py) encodes each vector's RESIDUAL
  (x − centroid_cell) as M uint8 bytes. Residuals are what faiss encodes:
  they are centered near zero, so the same codebook budget buys ~one cell's
  worth less variance than raw-vector PQ.

Search: rank centroids driver-side (nlist floats), build one ADC table per
probed cell from the query residual (q − centroid_cell), scan ONLY the
(id, cell, codes) columns of the probed partitions — a per-row table
lookup in one Arrow-batched UDF — then rerank an L-size shortlist on raw
vectors for exact final distances.

Data movement at scale: the probe reads nprobe/nlist of the files at
M bytes per row (M=8 over 64-dim float32 ⇒ ~3% of a raw scan of 3% of the
corpus); the rerank join touches L rows; the driver sees k rows. Nothing
else moves.

Correctness gate: nprobe == nlist + shortlist ≥ corpus degenerates to
exact kNN (same DuckDB oracle as knn_l2); recall at tuned
(nprobe, shortlist) is pinned in tests/test_pq.py.
"""

from __future__ import annotations

import json
import os
from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_db_spark.operators.ann import _CLUSTER_COL, IvfIndex
from vector_db_spark.operators.pq import ProductQuantizer
from vector_db_spark.operators.tombstones import (
    apply_tombstones,
    load_tombstones,
    merge_tombstones,
    snapshot_tombstones,
    tombstone_df,
    write_tombstones,
)


def _adc_table(codebooks: np.ndarray, resid: np.ndarray, m: int, ksub: int) -> np.ndarray:
    """Free-function twin of ProductQuantizer.adc_table for executor-side
    closures: captures only the codebook ndarray, never the quantizer
    object (whose owner also holds DataFrames)."""
    dsub = codebooks.shape[2]
    table = np.empty((m, ksub))
    for i in range(m):
        qs = resid[i * dsub : (i + 1) * dsub]
        diff = codebooks[i] - qs[None, :]
        table[i] = (diff * diff).sum(axis=1)
    return table


def _centroid_lookup(centroids: list[list[float]], cluster: F.Column) -> F.Column:
    """centroids[cluster] as a literal-array lookup (codegen, no join).
    Only safe below the Catalyst literal-term ceiling — residual callers
    go through :func:`with_residuals`, which dispatches."""
    lit = F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in centroids])
    return F.element_at(lit, cluster + 1)


def with_residuals(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str,
    out_col: str = "_resid",
    cluster_col: str = _CLUSTER_COL,
) -> DataFrame:
    """Append ``out_col`` = vec − centroids[cluster] — the residual every
    IVF-PQ/OPQ/PLAID-PQ encode step needs. Below the measured ~1024-term
    Catalyst planning cliff (ann._EXPR_ASSIGN_MAX) it stays the literal
    zip_with expression (codegen; bit-parity with the existing gates);
    past it, one NumPy take-and-subtract per Arrow batch — the literal
    form at production nlist·dim (4096×768 ≈ 3.1M F.lit terms) stalled
    the driver in analysis for minutes, the same cliff every assignment
    path already routes around."""
    from vector_db_spark.operators.ann import _EXPR_ASSIGN_MAX

    if len(centroids) * len(centroids[0]) <= _EXPR_ASSIGN_MAX:
        resid = F.zip_with(
            F.col(vec_col),
            _centroid_lookup(centroids, F.col(cluster_col)),
            lambda x, c: x.cast("double") - c,
        )
        return df.withColumn(out_col, resid)

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

    cents = np.asarray(centroids, dtype=np.float64)

    def kernel(it):
        for pdf in it:
            out = pdf.copy()
            if len(pdf):
                v = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
                c = cents[pdf[cluster_col].to_numpy()]
                out[out_col] = list(v - c)
            else:
                out[out_col] = pd.Series([], dtype=object)
            yield out

    schema = StructType(
        list(df.schema.fields) + [StructField(out_col, ArrayType(DoubleType()))]
    )
    return df.mapInPandas(kernel, schema=schema)


class IvfPqIndex:
    def __init__(
        self,
        ivf: IvfIndex,
        pq: ProductQuantizer,
        encoded: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ):
        self.ivf = ivf
        self.pq = pq
        self.encoded = encoded  # corpus columns + cluster_id + pq_codes
        self.id_col = id_col
        self.vec_col = vec_col
        # Delete manifest — same tombstone contract as IvfIndex.delete
        # (broadcast anti-join on probe; vacuum() compacts).
        self.tombstones: DataFrame | None = None

    @staticmethod
    def build(
        corpus: DataFrame,
        nlist: int = 16,
        m: int = 8,
        ksub: int = 256,
        seed: int = 42,
        max_iter: int = 20,
        pq_iters: int = 10,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        ivf: IvfIndex | None = None,
        n_rows: int | None = None,
    ) -> "IvfPqIndex":
        """``ivf`` accepts a pre-built L2 coarse quantizer over the same
        corpus — the faiss composition (IndexIVFPQ wraps a trained
        quantizer); a deployment that maintains a plain IVF index reuses
        its KMeans fit and assignments instead of refitting."""
        if ivf is None:
            ivf = IvfIndex.build(
                corpus,
                nlist=nlist,
                seed=seed,
                id_col=id_col,
                vec_col=vec_col,
                max_iter=max_iter,
                metric="l2",
                n_rows=n_rows,
            )
        elif ivf.metric != "l2":
            raise ValueError("IVF-PQ residual encoding requires an L2 IVF")
        # Residual = x − centroid[cell]; with_residuals keeps it a codegen
        # literal lookup below the Catalyst term ceiling and an Arrow
        # take-and-subtract past it.
        with_resid = with_residuals(ivf.assignments, ivf.centroids, vec_col)
        pq = ProductQuantizer.fit(
            with_resid,
            m=m,
            ksub=ksub,
            seed=seed,
            iters=pq_iters,
            id_col=id_col,
            vec_col="_resid",
            n_rows=n_rows,  # with_residuals is row-preserving
        )
        encoded = pq.encode(with_resid, code_col="pq_codes").drop("_resid")
        return IvfPqIndex(ivf, pq, encoded, id_col, vec_col)

    def save(self, path: str) -> None:
        """Cell-partitioned codes table + tiny driver artifacts — after
        load(), probing is parquet partition pruning over M-byte rows.
        Adaptive pre-shuffle for large cell counts (ann.write_partitioned)."""
        from vector_db_spark.operators.ann import write_partitioned

        write_partitioned(
            self.encoded,
            [_CLUSTER_COL],
            os.path.join(path, "encoded"),
            n_dirs=len(self.ivf.centroids),
        )
        np.save(os.path.join(path, "centroids.npy"), np.asarray(self.ivf.centroids))
        np.save(os.path.join(path, "codebooks.npy"), self.pq.codebooks)
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump({"id_col": self.id_col, "vec_col": self.vec_col}, f)
        snapshot_tombstones(self.tombstones, self.encoded.sparkSession, path)

    @staticmethod
    def load(spark: SparkSession, path: str) -> "IvfPqIndex":
        centroids = np.load(os.path.join(path, "centroids.npy")).tolist()
        codebooks = np.load(os.path.join(path, "codebooks.npy"))
        encoded = spark.read.parquet(os.path.join(path, "encoded"))
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        ivf = IvfIndex(centroids, encoded, meta["id_col"], meta["vec_col"], "l2")
        pq = ProductQuantizer(codebooks, meta["id_col"], "_resid")
        idx = IvfPqIndex(ivf, pq, encoded, meta["id_col"], meta["vec_col"])
        idx.tombstones = load_tombstones(spark, path)
        return idx

    def append(self, new_rows: DataFrame, path: str | None = None) -> "IvfPqIndex":
        """Incremental maintenance with the coarse quantizer AND the PQ
        codebooks frozen (the faiss ``IndexIVFPQ.add`` shape): new rows
        assign to existing cells (Arrow GEMM), their residuals encode
        through the existing codebooks, and (with ``path``) only new
        files land in the cell layout. Residuals of rows far outside the
        training distribution quantize worse — shortlist rerank restores
        exactness; re-train on the usual cadence. Same tombstone caveat
        as IvfIndex.append."""
        from vector_db_spark.operators.ann import _nearest_centroid_arrow

        assigned = _nearest_centroid_arrow(
            new_rows, self.vec_col, self.ivf.centroids, "l2", None
        )
        encoded_new = self.pq.encode(
            with_residuals(assigned, self.ivf.centroids, self.vec_col),
            code_col="pq_codes",
        ).drop("_resid")
        encoded_new = encoded_new.select(*self.encoded.columns)
        # stale covering radii must never prune a cell whose NEW member
        # lies outside them (same invalidation IvfIndex.append does)
        self.ivf.cell_radii = None
        if path is not None:
            encoded_new.write.mode("append").partitionBy(_CLUSTER_COL).parquet(
                os.path.join(path, "encoded")
            )
        self.encoded = self.encoded.unionByName(encoded_new)
        self.ivf.assignments = self.encoded
        return self

    def delete(
        self, ids, path: str | None = None
    ) -> "IvfPqIndex":
        """Tombstone delete (≅ faiss remove_vectors on an IndexIVFPQ,
        reference: src/core/index/faiss_index.rs:131-138): the codes
        layout is never rewritten; probes anti-join the manifest. See
        IvfIndex.delete for the full contract."""
        spark = self.encoded.sparkSession
        col = self.id_col if isinstance(ids, DataFrame) and self.id_col in ids.columns else None
        tomb = tombstone_df(spark, ids, col)
        self.tombstones = merge_tombstones(self.tombstones, tomb)
        if path is not None:
            write_tombstones(tomb, path)
        return self

    def _live(self) -> DataFrame:
        return apply_tombstones(self.encoded, self.id_col, self.tombstones)

    def vacuum(self, path: str) -> "IvfPqIndex":
        """Compaction into a FRESH directory (same quantizer + codebooks,
        live rows, empty manifest) — never overwrites a layout being
        read."""
        out = IvfPqIndex(
            self.ivf, self.pq, self._live(), self.id_col, self.vec_col
        )
        out.save(path)
        return IvfPqIndex.load(self.encoded.sparkSession, path)

    def search(
        self,
        query: Sequence[float],
        k: int,
        nprobe: int = 4,
        shortlist: int = 0,
        rerank: DataFrame | None = None,
        predicate: Column | None = None,
    ) -> DataFrame:
        """ADC over probed cells (+ optional raw-vector shortlist rerank).

        With ``shortlist`` (or an explicit ``rerank`` frame) the ADC pass
        picks the L best candidates and their raw vectors — from ``rerank``
        if given, else the index's own frame, which retains the vector
        column — are exact-reranked. ``shortlist=0`` and ``rerank=None``
        returns raw ADC distances.

        ``predicate`` pre-filters the probed cells' rows before ADC
        scoring (min(k, matches) contract, same as every other family;
        ≅ usearch filtered_search, reference:
        src/core/index/usearch_index.rs:68-85). It composes with cell
        pruning: the scan reads only probed partitions AND pushes the
        metadata predicate down within them.
        """
        if k < 1:
            raise ValueError("k must be >= 1")
        if nprobe < 1:
            raise ValueError("nprobe must be >= 1")
        q = np.asarray(list(query), dtype=np.float64)
        probes = self.ivf.probe_order(query)[:nprobe]
        cents = np.asarray(self.ivf.centroids, dtype=np.float64)
        m, ksub = self.pq.m, self.pq.ksub
        # One ADC table per PROBED cell (query's cell residual), plus a
        # tiny cell→slot remap — the closure ships nprobe·m·ksub floats,
        # not a dense (max_cell+1, m, ksub) tensor whose size scales with
        # nlist (67 MB at nlist=4096, past task-serialization limits at
        # 65536, ~99% of it zeros at nprobe=4).
        tables = np.stack([self.pq.adc_table(q - cents[c]) for c in probes])
        slot_of = np.zeros(max(probes) + 1, dtype=np.int64)
        for i, c in enumerate(probes):
            slot_of[c] = i
        exact = self.pq.exact_fold

        @F.pandas_udf("double")
        def _adc(codes: pd.Series, cells: pd.Series) -> pd.Series:
            cmat = np.frombuffer(b"".join(codes), dtype=np.uint8).reshape(-1, m)
            slot = slot_of[cells.to_numpy()]
            t = tables[slot[:, None], np.arange(m)[None, :], cmat]
            if exact:
                # subspace-order left fold, mirroring the frozen gate's
                # oracle (ordered list_reduce) — see pq.ProductQuantizer
                acc = t[:, 0].copy()
                for s in range(1, m):
                    acc = acc + t[:, s]
                return pd.Series(acc)
            return pd.Series(t.sum(axis=1))

        cands = self._live().filter(F.col(_CLUSTER_COL).isin(probes))
        if predicate is not None:
            cands = cands.filter(predicate)
        scored = cands.select(
            self.id_col,
            _adc(F.col("pq_codes"), F.col(_CLUSTER_COL)).alias("distance"),
        )
        if rerank is None and not shortlist:
            return scored.orderBy(
                F.col("distance").asc(), F.col(self.id_col).asc()
            ).limit(k)
        from vector_db_spark.operators.pq import shortlist_rerank

        raw = rerank if rerank is not None else self.encoded
        return shortlist_rerank(
            scored, raw, query, k, shortlist or 4 * k, self.id_col, self.vec_col
        )

    def search_batch(
        self,
        queries: DataFrame,
        k: int,
        nprobe: int = 4,
        shortlist: int = 0,
        predicate: Column | None = None,
        query_id_col: str = "query_id",
        query_vec_col: str = "query_vec",
    ) -> DataFrame:
        """Top-k per query through the IVF-PQ layout — batch formulation,
        no driver-side loop: (1) rank cells per query (literal-centroid
        distances over the small query side, window keeps ``nprobe``);
        (2) COGROUP the M-byte codes with the (query, cell) probe set on
        cluster_id — each task builds the ADC tables for exactly the
        queries probing its cell (query residual q − centroid_cell) and
        scores the whole cell against all of them as one table-lookup
        sum, emitting only each query's cell-local top-L; (3) one window
        takes the global shortlist per query; (4) raw-vector rerank joins
        the shortlist back for exact final distances.

        Data movement: the codes side reads only probed partitions after
        save(); candidate traffic is bounded by L rows per (query, cell);
        the rerank join touches |Q|·L rows. Returns (query_id, id,
        distance, rank). nprobe >= nlist with shortlist >= corpus
        degenerates to exact batch kNN (ivfpq_batch_exhaustive gate)."""
        if k < 1:
            raise ValueError("k must be >= 1")
        if nprobe < 1:
            raise ValueError("nprobe must be >= 1")
        ell = shortlist or 4 * k
        if ell < k:
            raise ValueError("shortlist must be >= k")
        from vector_db_spark.operators.ann import _probe_cells_arrow
        from vector_db_spark.operators.knn import _metric
        from pyspark.sql import Window

        cents = np.asarray(self.ivf.centroids, dtype=np.float64)
        m, ksub = self.pq.m, self.pq.ksub
        codebooks = self.pq.codebooks
        id_col, vec_col = self.id_col, self.vec_col
        dim = cents.shape[1]

        probed = _probe_cells_arrow(
            queries, query_id_col, query_vec_col, self.ivf.centroids, "l2", nprobe
        ).select(
            F.col(query_id_col).alias("__qid"),
            F.col(query_vec_col).alias("__qv"),
            _CLUSTER_COL,
        )

        # Static partition pruning for the codes side: the cogroup has no
        # dynamic pruning, so restrict the scan to the union of probed
        # cells first (<= nlist ints collected from the query side).
        probe_cells = [
            r[_CLUSTER_COL] for r in probed.select(_CLUSTER_COL).distinct().collect()
        ]
        cands = self._live().filter(F.col(_CLUSTER_COL).isin(probe_cells))
        if predicate is not None:
            cands = cands.filter(predicate)

        def _adc_cell_batch(
            cell_pdf: pd.DataFrame, q_pdf: pd.DataFrame
        ) -> pd.DataFrame:
            if cell_pdf.empty or q_pdf.empty:
                return pd.DataFrame(
                    {"query_id": [], id_col: [], "distance": []}
                ).astype({"query_id": "int64", id_col: "int64", "distance": "float64"})
            cell = int(cell_pdf[_CLUSTER_COL].iloc[0])
            ids = cell_pdf[id_col].to_numpy()
            cmat = np.frombuffer(
                b"".join(cell_pdf["pq_codes"]), dtype=np.uint8
            ).reshape(-1, m)
            out_q, out_i, out_d = [], [], []
            for qid, qv in zip(q_pdf["__qid"], q_pdf["__qv"]):
                q = np.asarray(qv, dtype=np.float64)
                if q.shape[0] != dim:
                    raise ValueError(
                        f"dimension mismatch: query has {q.shape[0]} "
                        f"components, index dim is {dim}"
                    )
                table = _adc_table(codebooks, q - cents[cell], m, ksub)
                d = table[np.arange(m)[None, :], cmat].sum(axis=1)
                # cell-local top-L bounds candidate traffic; ties by id
                order = np.lexsort((ids, d))[:ell]
                out_q.extend([qid] * len(order))
                out_i.extend(ids[order])
                out_d.extend(d[order])
            return pd.DataFrame({"query_id": out_q, id_col: out_i, "distance": out_d})

        per_cell = (
            cands.select(id_col, "pq_codes", _CLUSTER_COL)
            .groupby(_CLUSTER_COL)
            .cogroup(probed.groupby(_CLUSTER_COL))
            .applyInPandas(
                _adc_cell_batch, f"query_id long, {id_col} long, distance double"
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("distance").asc(), F.col(id_col).asc()
        )
        short_ids = (
            per_cell.withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") <= ell)
            .select("query_id", id_col)
        )
        raw = self.encoded.select(id_col, vec_col)
        expr_fn, _ = _metric("l2")
        qside = queries.select(
            F.col(query_id_col).alias("query_id"), query_vec_col
        )
        rerank = (
            raw.join(F.broadcast(short_ids), on=id_col)
            .join(F.broadcast(qside), on="query_id")
            .select(
                "query_id",
                id_col,
                expr_fn(F.col(vec_col), F.col(query_vec_col)).alias("distance"),
            )
        )
        w2 = Window.partitionBy("query_id").orderBy(
            F.col("distance").asc(), F.col(id_col).asc()
        )
        return (
            rerank.withColumn("rank", F.row_number().over(w2))
            .filter(F.col("rank") <= k)
            .select(
                F.col("query_id").alias(query_id_col), id_col, "distance", "rank"
            )
        )


FROZEN_DOC_IVFPQ_PATH = "artifacts/ivfpq_codebooks_docs.json"


def load_frozen_doc_ivfpq(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> IvfPqIndex:
    """Frozen IVF-PQ in exact-fold mode (round 14): the frozen coarse
    quantizer (ann.load_frozen_doc_ivf — expression argmin assignment,
    order-pinned probe ranking) composed with FROZEN residual codebooks
    (one pinned sf0.01 fit over residuals vs those centroids). Residuals
    come from with_residuals' codegen zip_with literal lookup (bit-
    portable below the planning ceiling), encode/ADC run through the
    exact_fold quantizer, so a DuckDB oracle replays assignment →
    residual → codes → per-cell ADC tables → shortlist → exact rerank
    bit-for-bit. Production kernels stay hash-gated by ivfpq_exhaustive
    and recall-pinned (RECALL_r*)."""
    from vector_db_spark.operators.ann import load_frozen_doc_ivf

    ivf = load_frozen_doc_ivf(corpus, id_col=id_col, vec_col=vec_col)
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        FROZEN_DOC_IVFPQ_PATH,
    )
    with open(path) as f:
        art = json.load(f)
    books = np.asarray(
        [[[float(x) for x in c] for c in sub] for sub in art["codebooks"]],
        dtype=np.float64,
    )
    pq = ProductQuantizer(books, id_col, "_resid", exact_fold=True)
    with_resid = with_residuals(ivf.assignments, ivf.centroids, vec_col)
    encoded = pq.encode(with_resid, code_col="pq_codes").drop("_resid")
    return IvfPqIndex(ivf, pq, encoded, id_col, vec_col)
