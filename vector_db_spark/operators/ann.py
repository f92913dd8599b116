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

import math
import os
from collections.abc import Sequence
from itertools import combinations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_db_spark.functions.vector import dot, normalize
from vector_db_spark.operators.knn import knn
from vector_db_spark.operators.tombstones import (
    apply_tombstones,
    clear_tombstones,
    load_tombstones,
    merge_tombstones,
    snapshot_tombstones,
    tombstone_df,
    write_tombstones,
)

_CLUSTER_COL = "cluster_id"


def write_partitioned(df: DataFrame, cols: list[str], path: str, n_dirs: int) -> None:
    """Partitioned parquet write with an adaptive pre-shuffle: when the
    partition-key cardinality is large, an unshuffled write makes every
    task commit (up to) every dir — serialized dir commits and a
    small-file spray (measured: one task committing 256 LSH bucket dirs
    took 5.5 s; the repartitioned write is sub-second and yields exactly
    one file per dir). When the cardinality is small (an 8-cell IVF), the
    commit cost is trivial and the extra shuffle is pure overhead — so
    only shuffle past a dir-count threshold.

    SELF-READ GUARD: every index family's save() funnels here, and a
    load-then-mutate-then-save-to-the-same-path cycle hands this function
    a frame that lazily READS the destination — the overwrite deletes the
    files mid-job, the scan then fails, and the index directory is left
    clobbered (verified live: FAILED_READ_FILE after the partition dirs
    were already gone). When any input file lives under the destination,
    materialize the frame first (localCheckpoint spills MEMORY_AND_DISK);
    saving to a fresh path skips the cost entirely."""

    def _local(f: str) -> str:
        return "/" + f.removeprefix("file:").lstrip("/")

    dest = os.path.abspath(path)
    if any(_local(f).startswith(dest + os.sep) for f in df.inputFiles()):
        df = df.localCheckpoint()
    if n_dirs > 32:
        df = df.repartition(*cols)
    df.write.mode("overwrite").partitionBy(*cols).parquet(path)


def _kmeans_centroids(
    corpus: DataFrame,
    vec: Column,
    nlist: int,
    seed: int,
    max_iter: int,
    sample_per_cell: int = 256,
    n_rows: int | None = None,
) -> list[list[float]]:
    """Train the coarse quantizer on a bounded SAMPLE, driver-side.

    This is how IVF quantizers are actually trained at scale (faiss trains
    on 39×nlist–256×nlist points, not the corpus): one distributed
    ``sample().limit()`` pulls ≤ nlist*sample_per_cell vectors to the
    driver, then seeded Lloyd's iterations run in NumPy. Training cost is
    O(sample) and independent of corpus size — fitting a distributed
    KMeans over 100 TB to place 1k centroids would be pure waste. Cell
    ASSIGNMENT stays fully distributed (one Arrow-batched GEMM per
    partition over the whole corpus)."""
    target = nlist * sample_per_cell
    # caller-known row count skips the count job (the bench build pool
    # was paying one identical count per family — r15 opt); the count
    # only sizes the sample fraction, so a correct hint changes nothing
    n = corpus.count() if n_rows is None else int(n_rows)
    sampled = corpus.select(vec.alias("v"))
    if n > target:
        # over-sample slightly so limit() almost always hits target rows
        sampled = sampled.sample(fraction=min(1.0, 1.2 * target / n), seed=seed)
    pts = np.asarray(
        [r.v for r in sampled.limit(target).collect()], dtype=np.float64
    )
    if pts.shape[0] < nlist:
        raise ValueError(
            f"nlist={nlist} exceeds available training vectors ({pts.shape[0]})"
        )
    rng = np.random.RandomState(seed)
    centroids = pts[rng.choice(pts.shape[0], size=nlist, replace=False)]
    for _ in range(max_iter):
        # assign: (sample, nlist) distance matrix via |a|² − 2a·c + |c|²
        d = (
            (pts * pts).sum(axis=1)[:, None]
            - 2.0 * (pts @ centroids.T)
            + (centroids * centroids).sum(axis=1)[None, :]
        )
        assign = d.argmin(axis=1)
        moved = False
        # Empty cells re-seed on the farthest points — DISTINCT ones: the
        # first build gave every empty cell the SAME argmax point, which
        # made the reseeded centroids identical, routed all rows to the
        # lower duplicate (argmin first-minimum), left the higher cells
        # empty forever, and burned max_iter without converging (verified
        # with nlist=4 over 2 distinct points: 3 identical centroids).
        # Walking the min-distance ranking from the farthest down hands
        # each empty cell its own seed.
        far_order = iter(np.argsort(-d.min(axis=1)))
        for j in range(nlist):
            members = pts[assign == j]
            if len(members):
                new = members.mean(axis=0)
                if not np.array_equal(new, centroids[j]):
                    centroids[j] = new
                    moved = True
            else:
                centroids[j] = pts[next(far_order)]
                moved = True
        if not moved:
            break
    return [c.tolist() for c in centroids]


def _nearest_centroid_expr(vec: Column, centroids: list[list[float]]) -> Column:
    """argmin-distance cluster assignment as one native expression — kept
    as the pure-SQL reference implementation and for plan-level composition
    (the tie-break parity with `_nearest_centroid_arrow` is pinned in
    tests), but NOT the production assignment path: `aggregate`/`zip_with`
    higher-order functions evaluate INTERPRETED per element (measured 35×
    slower than one Arrow GEMM per batch at nlist=8 × dim=64), and past
    `_EXPR_ASSIGN_MAX` literal terms Catalyst takes minutes just to plan.

    Built as array-of-distances + array_position(array_min) so the
    expression stays LINEAR in nlist (a chained when(d < best_d) rewrite
    doubles the tree per centroid — exponential — and OOMs the driver at
    nlist ≈ 16)."""
    dists = F.array(*[_l2_to_literal(vec, c) for c in centroids])
    # array_position is 1-based and takes the FIRST minimum: deterministic
    # tie-break toward the lower cluster id.
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


# nlist·dim ceiling past which the literal-expression form is unplannable
# (Catalyst stalls for minutes). The Arrow kernel is the assignment path at
# EVERY size — this constant documents the cliff and guards any remaining
# literal-expression composition (e.g. query-side cell ranking).
_EXPR_ASSIGN_MAX = 1024


def _nearest_centroid_arrow(
    df: DataFrame,
    vec_col: str,
    centroids: list[list[float]],
    metric: str,
    max_sq_norm: float | None,
) -> DataFrame:
    """Cluster assignment as one Arrow-batched BLAS kernel — THE
    assignment path at every nlist: a |B|×nlist GEMM per Arrow batch is
    microseconds, where the literal-expression form evaluates interpreted
    HOFs per element (35× slower at nlist=8×dim=64) and stalls the
    optimizer for minutes in the thousands. The metric mapping (unit
    sphere / MIPS augmentation) replicates the reference expression;
    argmin takes the FIRST minimum — the same lower-cell tie-break as
    array_position(array_min)."""
    import pandas as pd

    c = np.asarray(centroids, dtype=np.float64)

    def assign(it):
        for pdf in it:
            v = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            if metric == "cosine":
                norms = np.linalg.norm(v, axis=1)
                norms[norms == 0.0] = 1.0
                v = v / norms[:, None]
            elif metric == "ip":
                sq = (v * v).sum(axis=1)
                aug = np.sqrt(np.maximum(float(max_sq_norm) - sq, 0.0))
                v = np.concatenate([v, aug[:, None]], axis=1)
            d = (
                (v * v).sum(axis=1)[:, None]
                - 2.0 * (v @ c.T)
                + (c * c).sum(axis=1)[None, :]
            )
            out = pdf.copy()
            out[_CLUSTER_COL] = d.argmin(axis=1).astype("int32")
            yield out

    from pyspark.sql.types import IntegerType, StructField, StructType

    # NOT df.schema.add(...): StructType.add mutates in place, and
    # DataFrame.schema is cached — mutating it desyncs .columns from the
    # JVM plan and breaks the very mapInPandas call being built
    schema = StructType(list(df.schema.fields) + [StructField(_CLUSTER_COL, IntegerType())])
    return df.mapInPandas(assign, schema=schema)


def _probe_cells_arrow(
    queries: DataFrame,
    query_id_col: str,
    query_vec_col: str,
    centroids: list[list[float]],
    metric: str,
    nprobe: int,
    emit_mapped: bool = False,
) -> DataFrame:
    """(query_id, query_vec, cluster_id) — each query's ``nprobe`` nearest
    cells, ranked by one |B|×nlist Arrow GEMM per batch. The query-side
    twin of `_nearest_centroid_arrow`: the literal-distance + window
    formulation this replaces both evaluated interpreted HOFs per element
    AND inlined an nlist·dim literal array into the plan — unplannable
    past ~1024 terms (the same cliff ADVICE r2 flagged for radii).
    Tie-break: stable ascending argsort ⇒ lower cell id first, matching
    the old (cell_dist ASC, cluster_id ASC) window order.

    ``emit_mapped=True`` returns the METRIC-MAPPED query vector (unit
    sphere for cosine — what a graph beam over normalized cell vectors
    needs); the default returns the original vector for true-metric
    reranks. Queries sit on the MIPS augmentation hyperplane, so for
    metric='ip' ranking appends a zero component either way."""
    c = np.asarray(centroids, dtype=np.float64)
    dim = c.shape[1] - 1 if metric == "ip" else c.shape[1]
    np_ = min(nprobe, len(centroids))

    def rank(it):
        for pdf in it:
            if pdf.empty:
                continue
            v = np.asarray(pdf[query_vec_col].tolist(), dtype=np.float64)
            if v.shape[1] != dim:
                raise ValueError(
                    f"dimension mismatch: query has {v.shape[1]} components, "
                    f"index dim is {dim}"
                )
            m = v
            if metric == "cosine":
                norms = np.linalg.norm(v, axis=1)
                norms[norms == 0.0] = 1.0
                m = v / norms[:, None]
            elif metric == "ip":
                m = np.concatenate([v, np.zeros((len(v), 1))], axis=1)
            d = (
                (m * m).sum(axis=1)[:, None]
                - 2.0 * (m @ c.T)
                + (c * c).sum(axis=1)[None, :]
            )
            order = np.argsort(d, axis=1, kind="stable")[:, :np_]
            out_vec = m if emit_mapped else v
            ids = pdf[query_id_col].to_numpy()
            yield pd.DataFrame(
                {
                    query_id_col: np.repeat(ids, np_),
                    query_vec_col: [
                        list(row) for row in np.repeat(out_vec, np_, axis=0)
                    ],
                    _CLUSTER_COL: order.reshape(-1).astype("int32"),
                }
            )

    schema = (
        f"{query_id_col} long, {query_vec_col} array<double>, {_CLUSTER_COL} int"
    )
    return queries.select(query_id_col, query_vec_col).mapInPandas(rank, schema)


def _dist_to_own_centroid_arrow(
    assignments: DataFrame,
    vec_col: str,
    centroids: list[list[float]],
    metric: str,
    max_sq_norm: float | None,
) -> DataFrame:
    """(cluster_id, __d) — per-row L2 distance to the row's OWN centroid,
    as one Arrow gather + row-wise norm per batch. The large-nlist twin of
    the literal expression in ensure_cell_radii: no (batch × nlist) GEMM
    is needed here because each row's cell is already known — just index
    the centroid matrix by cluster_id."""
    c = np.asarray(centroids, dtype=np.float64)

    def dist(it):
        for pdf in it:
            v = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            if metric == "cosine":
                norms = np.linalg.norm(v, axis=1)
                norms[norms == 0.0] = 1.0
                v = v / norms[:, None]
            elif metric == "ip":
                sq = (v * v).sum(axis=1)
                aug = np.sqrt(np.maximum(float(max_sq_norm) - sq, 0.0))
                v = np.concatenate([v, aug[:, None]], axis=1)
            cells = pdf[_CLUSTER_COL].to_numpy()
            d = np.linalg.norm(v - c[cells], axis=1)
            yield pd.DataFrame({_CLUSTER_COL: cells, "__d": d})

    return assignments.mapInPandas(dist, schema=f"{_CLUSTER_COL} int, __d double")


def _l2_to_literal(vec: Column, center: Sequence[float]) -> Column:
    lit = F.array(*[F.lit(float(x)) for x in center])
    return F.aggregate(
        F.zip_with(vec, lit, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
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
        metric: str = "l2",
    ):
        self.centroids = centroids
        self.assignments = assignments  # corpus columns + cluster_id
        self.id_col = id_col
        self.vec_col = vec_col
        self.metric = metric
        self.max_sq_norm: float | None = None  # set for metric='ip' builds
        self.cell_radii: list[float] | None = None  # lazy, see ensure_cell_radii
        # Largest squared norm ever appended (metric='ip' only): appended
        # vectors with ‖x‖² > build-time M² clamp their MIPS augmentation
        # to 0, so the range_search pruning radius must widen to
        # max(M², this) or cells holding true matches could be pruned.
        self.max_appended_sq_norm: float | None = None
        # Delete manifest (operators/tombstones.py): probes anti-join it
        # (broadcast), the immutable cell layout is never rewritten — the
        # reference removes from its live index (faiss remove_vectors,
        # src/core/index/faiss_index.rs:131-138); vacuum()/retrain() is
        # our amortized equivalent of its reclamation.
        self.tombstones: DataFrame | None = None

    @staticmethod
    def build(
        corpus: DataFrame,
        nlist: int = 16,
        seed: int = 42,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        max_iter: int = 20,
        metric: str = "l2",
        n_rows: int | None = None,
    ) -> "IvfIndex":
        """``metric='l2'`` clusters raw vectors; ``metric='cosine'``
        clusters L2-NORMALIZED vectors (unit sphere ⇒ L2 cell order is
        rank-equivalent to cosine); ``metric='ip'`` (MIPS) clusters the
        AUGMENTED vectors [x, sqrt(M²−‖x‖²)] with M = max corpus norm —
        the standard reduction that turns max-inner-product into L2
        nearest-neighbor in dim+1. In every case RAW vectors are stored
        and reranked with the true metric, so full-probe results are
        bit-identical to the exact operator."""
        if nlist < 1:
            raise ValueError("nlist must be >= 1")
        if metric not in ("l2", "cosine", "ip"):
            raise ValueError(
                f"IVF supports metrics ('l2', 'cosine', 'ip'), got {metric!r}"
            )
        if metric == "l2":
            vec = F.col(vec_col)
            aug = None
        elif metric == "cosine":
            vec = normalize(F.col(vec_col))
            aug = None
        else:  # ip → MIPS augmentation
            sq_norm = dot(F.col(vec_col), F.col(vec_col))
            _max = corpus.agg(F.max(sq_norm)).head()[0]
            if _max is None:  # clear error, not float(None) at MIPS setup
                raise ValueError("cannot build an index over an empty corpus")
            max_sq = float(_max)
            aug = max_sq
            vec = F.concat(
                F.transform(F.col(vec_col), lambda x: x.cast("double")),
                F.array(F.sqrt(F.greatest(F.lit(max_sq) - sq_norm, F.lit(0.0)))),
            )
        centroids = _kmeans_centroids(
            corpus, vec, nlist, seed, max_iter, n_rows=n_rows
        )
        assignments = _nearest_centroid_arrow(corpus, vec_col, centroids, metric, aug)
        idx = IvfIndex(centroids, assignments, id_col, vec_col, metric)
        idx.max_sq_norm = aug
        return idx

    def save(self, path: str) -> None:
        """Persist as a cluster-partitioned table — search() after load()
        prunes to the probed partitions (the 100 TB story). At production
        nlist (thousands of cell dirs) the write pre-shuffles on the cell
        key so each dir is one file from one task; see write_partitioned."""
        write_partitioned(
            self.assignments,
            [_CLUSTER_COL],
            os.path.join(path, "assignments"),
            n_dirs=len(self.centroids),
        )
        np.save(os.path.join(path, "centroids.npy"), np.asarray(self.centroids))
        self._write_meta(path)
        # save() snapshots the whole index state incl. the delete
        # manifest (materialize-before-clear invariant lives in the
        # shared helper).
        snapshot_tombstones(self.tombstones, self.assignments.sparkSession, path)

    def _write_meta(self, path: str) -> None:
        import json

        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(
                {
                    "metric": self.metric,
                    "id_col": self.id_col,
                    "vec_col": self.vec_col,
                    "max_sq_norm": self.max_sq_norm,
                    "max_appended_sq_norm": self.max_appended_sq_norm,
                    "cell_radii": self.cell_radii,
                },
                f,
            )

    @staticmethod
    def load(
        spark: SparkSession,
        path: str,
        id_col: str | None = None,
        vec_col: str | None = None,
    ) -> "IvfIndex":
        import json

        centroids = np.load(os.path.join(path, "centroids.npy")).tolist()
        assignments = spark.read.parquet(os.path.join(path, "assignments"))
        meta_path = os.path.join(path, "meta.json")
        meta = {"metric": "l2", "id_col": "vec_id", "vec_col": "embedding"}
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta.update(json.load(f))
        idx = IvfIndex(
            centroids,
            assignments,
            id_col or meta["id_col"],
            vec_col or meta["vec_col"],
            meta["metric"],
        )
        idx.max_sq_norm = meta.get("max_sq_norm")
        idx.max_appended_sq_norm = meta.get("max_appended_sq_norm")
        idx.cell_radii = meta.get("cell_radii")
        idx.tombstones = load_tombstones(spark, path)
        return idx

    def _mapped_vec(self, col: Column) -> Column:
        """A corpus vector mapped into centroid (assignment) space —
        identity for l2, unit sphere for cosine, [x, sqrt(M²−‖x‖²)] for
        the MIPS reduction (M from the original build)."""
        if self.metric == "l2":
            return col
        if self.metric == "cosine":
            return normalize(col)
        sq_norm = dot(col, col)
        return F.concat(
            F.transform(col, lambda x: x.cast("double")),
            F.array(F.sqrt(F.greatest(F.lit(float(self.max_sq_norm)) - sq_norm, F.lit(0.0)))),
        )

    def ensure_cell_radii(self) -> list[float]:
        """Per-cell covering radius max_{x∈cell} ‖map(x) − c_cell‖ (one
        grouped aggregate, nlist floats to the driver). Computed lazily so
        plain top-k builds never pay for it; persisted by save().

        The per-row distance-to-own-centroid comes from an Arrow kernel
        (one centroid gather + row-wise norm per batch) — like cluster
        assignment, the literal-distance expression form both evaluates
        interpreted per element and stalls Catalyst past ~1024 terms."""
        if self.cell_radii is None:
            own_d = _dist_to_own_centroid_arrow(
                self.assignments,
                self.vec_col,
                self.centroids,
                self.metric,
                self.max_sq_norm,
            )
            per_cell = (
                own_d.groupBy(_CLUSTER_COL)
                .agg(F.max("__d").alias("__r"))
                .collect()
            )
            radii = [0.0] * len(self.centroids)
            for r in per_cell:
                radii[r[_CLUSTER_COL]] = float(r["__r"])
            self.cell_radii = radii
        return self.cell_radii

    def append(self, new_rows: DataFrame, path: str | None = None) -> "IvfIndex":
        """Incremental index maintenance: assign ``new_rows`` to the
        EXISTING centroids and (when ``path`` is given) append only the
        new files into the cell-partitioned layout — no rebuild, no
        rewrite of existing data. This is the faiss ``IndexIVF.add``
        analogue (and what the reference's insert does to its in-memory
        graphs, src/router/handle/insert_handle.rs): at 100 TB a daily
        ingest touches only the files it adds, while the quantizer stays
        frozen until a scheduled re-train.

        For metric='ip' the augmentation reuses the build-time M; new
        vectors with ‖x‖ > M clamp to the cell boundary (probe recall may
        dip for them until re-train — raw vectors are stored, so
        full-probe/exhaustive results stay exact regardless). Their max
        squared norm is tracked so range_search can WIDEN its pruning
        radius to stay lossless (a clamped vector's augmented distance
        exceeds the build-time bound ‖q‖²+M²−2t).

        Cell radii are invalidated in memory AND in any persisted
        meta.json (recomputed lazily over the unioned corpus on the next
        range_search) — a load() after an append must never prune with
        radii that predate the appended vectors.
        """
        if self.metric == "ip":
            v = F.col(self.vec_col)
            # None = empty batch: an empty append must be the same no-op
            # it is for l2/cosine, not a TypeError (daily-ingest contract)
            appended_max = new_rows.agg(F.max(dot(v, v))).head()[0]
            if appended_max is not None:
                self.max_appended_sq_norm = max(
                    self.max_appended_sq_norm or 0.0, float(appended_max)
                )
        assigned = _nearest_centroid_arrow(
            new_rows, self.vec_col, self.centroids, self.metric, self.max_sq_norm
        )
        self.cell_radii = None
        if path is not None:
            # Meta BEFORE data: a crash between the two writes must leave
            # a safe pair. Meta-first means radii invalidated + watermark
            # possibly covering rows that never landed — both conservative
            # (radii recompute lazily; a too-high watermark only widens
            # range_search pruning). Data-first left persisted radii that
            # PREDATE live appended rows: range_search would prune a cell
            # whose new member lies outside the stale covering radius and
            # silently miss matches.
            self._write_meta(path)
            assigned.write.mode("append").partitionBy(_CLUSTER_COL).parquet(
                os.path.join(path, "assignments")
            )
        self.assignments = self.assignments.unionByName(assigned)
        # NOTE: appending an id that sits in the tombstone manifest does
        # NOT resurrect it — the old physical row is still in the layout,
        # so un-tombstoning would serve BOTH copies. Deletes win until a
        # vacuum()/retrain() compacts the layout; id-level replace is the
        # collection store's job (merge_upsert owns id uniqueness).
        return self

    def delete(
        self, ids: Sequence[int] | DataFrame, path: str | None = None
    ) -> "IvfIndex":
        """Remove vectors from the index WITHOUT touching the immutable
        cell-partitioned layout (≅ faiss remove_vectors, reference:
        src/core/index/faiss_index.rs:131-138; usearch remove,
        src/core/index/usearch_index.rs:87-93): the ids land in a
        tombstone manifest that every probe anti-joins (broadcast — the
        set is bounded by the vacuum cadence). With ``path`` the manifest
        is appended on disk too, so a later load() serves the delete —
        O(deleted ids) I/O, concurrent-reader safe (append-only).

        Cell radii stay VALID: deletes only shrink cells, so the persisted
        covering radii remain a (lossless) over-estimate for range_search
        pruning until the next vacuum/retrain tightens them."""
        spark = self.assignments.sparkSession
        col = self.id_col if isinstance(ids, DataFrame) and self.id_col in ids.columns else None
        tomb = tombstone_df(spark, ids, col)
        self.tombstones = merge_tombstones(self.tombstones, tomb)
        if path is not None:
            write_tombstones(tomb, path)
        return self

    def _live(self) -> DataFrame:
        """The serving view: assignments minus tombstoned rows (broadcast
        anti-join; identity when nothing is deleted)."""
        return apply_tombstones(self.assignments, self.id_col, self.tombstones)

    def vacuum(self, path: str) -> "IvfIndex":
        """Compaction: materialize the live rows into a FRESH index
        directory (same centroids/metric/meta, empty manifest) and return
        the compacted index. Writes to a new path rather than overwriting
        a layout concurrently being read — the manifest-rotation pattern
        the collections store uses; flip readers over, then drop the old
        directory on the deployment's retention schedule."""
        out = IvfIndex(
            self.centroids, self._live(), self.id_col, self.vec_col, self.metric
        )
        out.max_sq_norm = self.max_sq_norm
        out.max_appended_sq_norm = self.max_appended_sq_norm
        out.save(path)
        return IvfIndex.load(self.assignments.sparkSession, path)

    def cell_stats(self) -> DataFrame:
        """Per-cell occupancy of LIVE rows — one narrow grouped count (on
        a load()ed index with no tombstones this reads parquet partition
        FOOTER row counts, not data)."""
        return self._live().groupBy(_CLUSTER_COL).agg(
            F.count(F.lit(1)).alias("n_rows")
        )

    def describe(self) -> dict:
        """Driver-side index health, the 'should I retrain?' dashboard:

        - ``n_rows`` / ``nlist`` / ``min|mean|max_cell`` — occupancy;
          empty cells count (a cell the quantizer placed where no data
          lives wastes a probe slot).
        - ``imbalance_factor`` — Σ n_c² · nlist / n², faiss's metric
          (IndexIVF imbalance_factor): 1.0 means perfectly even cells;
          probe cost at fixed nprobe scales with it. Appends against a
          frozen quantizer drift it upward — schedule ``retrain`` when
          it leaves the build-time regime (rule of thumb: > ~2).
        - ``max_appended_sq_norm`` — the metric='ip' clamp watermark
          (non-None means appended vectors exceed build-time M and probe
          recall may dip for them until retrain).

        One aggregate job; driver state O(nlist)."""
        counts = [r.n_rows for r in self.cell_stats().collect()]
        nlist = len(self.centroids)
        n = sum(counts)
        imb = (sum(c * c for c in counts) * nlist / (n * n)) if n else float("nan")
        return {
            "nlist": nlist,
            "n_rows": n,
            "empty_cells": nlist - len(counts),
            "min_cell": min(counts) if counts else 0,
            "mean_cell": n / nlist if nlist else 0.0,
            "max_cell": max(counts) if counts else 0,
            "imbalance_factor": imb,
            "metric": self.metric,
            "max_appended_sq_norm": self.max_appended_sq_norm,
        }

    def retrain(
        self,
        nlist: int | None = None,
        seed: int = 42,
        max_iter: int = 20,
    ) -> "IvfIndex":
        """Scheduled quantizer refresh — the close of the append lifecycle.

        ``append`` keeps the centroids frozen, so a long run of appends
        drifts the data away from the quantizer: cells unbalance, probe
        recall decays, and for metric='ip' the norm watermark only widens
        (range_search stays lossless but prunes less). ``retrain`` refits
        the coarse quantizer over the CURRENT corpus (build-time +
        appended rows — still a bounded sample, cost independent of
        corpus size), reassigns every vector in one Arrow GEMM pass, and
        resets the append-era state: fresh cell radii, and for 'ip' a
        fresh M over the whole corpus (the appended-norm watermark
        disappears because no vector clamps under the new M).

        faiss has no in-place retrain either — you train a new IndexIVF
        over the data; the reference simply rebuilds its in-memory index
        on mutation (src/router/handle/upsert_handle.rs). Returns a NEW
        index: persist with save() into a fresh version directory and
        flip readers over (the collections store's manifest-rotation
        pattern) — never overwrite a layout still being read.

        Retraining runs over the LIVE rows, so it doubles as the vacuum:
        tombstoned vectors are dropped from the new layout and the fresh
        index starts with an empty manifest.
        """
        corpus = self._live().drop(_CLUSTER_COL)
        return IvfIndex.build(
            corpus,
            nlist=nlist if nlist is not None else len(self.centroids),
            seed=seed,
            id_col=self.id_col,
            vec_col=self.vec_col,
            max_iter=max_iter,
            metric=self.metric,
        )

    def range_search(
        self,
        query: Sequence[float],
        threshold: float,
        predicate: Column | None = None,
    ) -> DataFrame:
        """All rows within a metric threshold, scanning only the cells the
        triangle inequality cannot rule out — LOSSLESS pruning, unlike
        top-k probes: a row at distance d from the query sits in a cell
        whose centroid is within d + r_cell of the query, so any cell with
        ‖q − c‖ − r_cell > radius provably holds no match. The threshold
        maps into centroid space per metric (l2: squared-L2 ≤ t ⇒ radius
        √t; cosine: sim ≥ t ⇔ ‖q̂ − x̂‖² ≤ 2−2t; ip: sim ≥ t ⇔ augmented
        L2² ≤ ‖q‖² + M² − 2t), then matches are re-filtered with the true
        metric — value-exact against the unindexed operator at any nlist.
        After save(), the cell filter is parquet partition pruning."""
        from vector_db_spark.operators.knn import range_search as exact_range

        q = self._query_point(query)
        if self.metric == "l2":
            radius_sq = float(threshold)
        elif self.metric == "cosine":
            radius_sq = max(0.0, 2.0 - 2.0 * float(threshold))
        else:  # ip
            # Covering bound for BOTH build-time and appended vectors: a
            # match x with ⟨q,x⟩ ≥ t has augmented distance²
            # ‖q‖²+M²−2⟨q,x⟩ when ‖x‖² ≤ M² (exact augmentation), and
            # ‖q−x‖² = ‖q‖²+‖x‖²−2⟨q,x⟩ when the augmentation clamped to 0
            # — so max(M², max appended ‖x‖²) bounds either case.
            eff_sq = max(float(self.max_sq_norm), self.max_appended_sq_norm or 0.0)
            radius_sq = float(np.dot(q, q)) + eff_sq - 2.0 * float(threshold)
        if radius_sq < 0.0:
            return exact_range(
                self.assignments.limit(0),
                query,
                threshold,
                metric=self.metric,
                vec_col=self.vec_col,
                id_col=self.id_col,
            )
        radius = float(np.sqrt(radius_sq))
        c = np.asarray(self.centroids, dtype=np.float64)
        center_d = np.sqrt(((c - q) ** 2).sum(axis=1))
        radii = self.ensure_cell_radii()
        cells = [
            int(i)
            for i in range(len(self.centroids))
            if center_d[i] - radii[i] <= radius
        ]
        cands = self._live().filter(F.col(_CLUSTER_COL).isin(cells))
        return exact_range(
            cands,
            query,
            threshold,
            metric=self.metric,
            vec_col=self.vec_col,
            id_col=self.id_col,
            predicate=predicate,
        )

    def range_search_batch(
        self,
        queries: DataFrame,
        threshold: float,
        predicate: Column | None = None,
        query_id_col: str = "query_id",
        query_vec_col: str = "query_vec",
    ) -> DataFrame:
        """Batched lossless range search: per-query triangle-inequality
        cell pruning exactly as range_search(), then ONE batched exact
        verify over the UNION of every query's surviving cells
        (knn.batch_range_search — broadcast queries / Arrow GEMM, no
        LIMIT). Lossless because query q's true matches live inside q's
        own surviving cells ⊆ the union; the exact threshold re-check
        then discards any union row outside q's range, so the result
        equals running range_search per query (and the full-corpus
        batched scan — the ann_ivf_batch_range gate shares
        knn_batch_range's oracle row). The per-query cell math is
        driver-side (nq × nlist floats); the union keeps the data-side
        plan ONE partition-pruned scan instead of nq separate jobs —
        at the usual smallness contract for the query side, the extra
        union candidates cost a few more GEMM rows, never a shuffle.

        The query side runs ONE driver job (VERDICT r11 #7): the rows
        collected here for the cell math are re-wrapped as a local
        relation for the verify stage, so batch_range_search's own
        query-side access (broadcast or Arrow re-collect) reads driver
        memory instead of re-running the caller's query plan."""
        from vector_db_spark.operators.knn import batch_range_search

        qproj = queries.select(query_id_col, query_vec_col)
        qrows = qproj.collect()
        if not qrows:
            raise ValueError("queries must be non-empty")
        queries = queries.sparkSession.createDataFrame(qrows, qproj.schema)
        c = np.asarray(self.centroids, dtype=np.float64)
        radii = np.asarray(self.ensure_cell_radii(), dtype=np.float64)
        cells: set[int] = set()
        for r in qrows:
            q = self._query_point(r[1])
            if self.metric == "l2":
                radius_sq = float(threshold)
            elif self.metric == "cosine":
                radius_sq = max(0.0, 2.0 - 2.0 * float(threshold))
            else:  # ip (norm-watermark covering bound, as range_search)
                eff_sq = max(
                    float(self.max_sq_norm), self.max_appended_sq_norm or 0.0
                )
                radius_sq = float(np.dot(q, q)) + eff_sq - 2.0 * float(threshold)
            if radius_sq < 0.0:
                continue
            radius = float(np.sqrt(radius_sq))
            center_d = np.sqrt(((c - q) ** 2).sum(axis=1))
            cells.update(np.nonzero(center_d - radii <= radius)[0].tolist())
        cands = self._live().filter(F.col(_CLUSTER_COL).isin(sorted(cells)))
        return batch_range_search(
            cands,
            queries,
            threshold,
            metric=self.metric,
            vec_col=self.vec_col,
            id_col=self.id_col,
            query_id_col=query_id_col,
            query_vec_col=query_vec_col,
            predicate=predicate,
            # dim hint from the collected rows: embedding-model dims hit
            # the GEMM kernel; fixture dims keep the expression fold
            dim=len(qrows[0][1]),
        )

    def _query_point(self, query: Sequence[float]) -> np.ndarray:
        """Query mapped into centroid space: unit sphere for cosine,
        zero-augmented [q, 0] for ip (queries sit on the augmentation
        hyperplane in the MIPS reduction)."""
        q = np.asarray(list(query), dtype=np.float64)
        c = np.asarray(self.centroids, dtype=np.float64)
        expect = c.shape[1] - 1 if self.metric == "ip" else c.shape[1]
        if q.shape[0] != expect:
            raise ValueError(
                f"dimension mismatch: query has {q.shape[0]} components, "
                f"index dim is {expect}"
            )
        if self.metric == "cosine":
            n = float(np.linalg.norm(q))
            if n > 0:
                q = q / n
        elif self.metric == "ip":
            q = np.concatenate([q, [0.0]])
        return q

    def probe_order(self, query: Sequence[float]) -> list[int]:
        """Centroid ids by ascending distance to the query (driver-side —
        nlist floats, not data). In ``exact_fold`` mode (the frozen
        oracle-gated rungs, round 14) each distance is an order-pinned
        Python left fold so a SQL oracle ranking the same frozen
        centroid literals picks the identical probe set."""
        q = self._query_point(query)
        if getattr(self, "exact_fold", False):
            dists = []
            for j, cent in enumerate(self.centroids):
                acc = 0.0
                for x, y in zip(cent, q):
                    diff = float(x) - float(y)
                    acc = acc + diff * diff
                dists.append((acc, j))
            return [j for _, j in sorted(dists)]
        c = np.asarray(self.centroids, dtype=np.float64)
        d = ((c - np.asarray(q, dtype=np.float64)) ** 2).sum(axis=1)
        return [int(i) for i in np.argsort(d, kind="stable")]

    def search(
        self,
        query: Sequence[float],
        k: int,
        nprobe: int = 4,
        metric: str | None = None,
        predicate: Column | None = None,
    ) -> DataFrame:
        """Probe the ``nprobe`` nearest cells, exact-rerank inside them.
        ``nprobe >= nlist`` is exhaustive (== exact search)."""
        if nprobe < 1:
            raise ValueError("nprobe must be >= 1")
        metric = metric or self.metric
        probes = self.probe_order(query)[:nprobe]
        cands = self._live().filter(F.col(_CLUSTER_COL).isin(probes))
        return knn(
            cands,
            query,
            k,
            metric=metric,
            vec_col=self.vec_col,
            id_col=self.id_col,
            predicate=predicate,
        )

    def search_batch(
        self,
        queries: DataFrame,
        k: int,
        nprobe: int = 4,
        metric: str | None = None,
        query_id_col: str = "query_id",
        query_vec_col: str = "query_vec",
        broadcast_queries: bool = True,
        predicate: Column | None = None,
    ) -> DataFrame:
        """Top-k per query for a whole DataFrame of queries — the 100 TB
        formulation: no driver-side loop over queries.

        ``predicate`` (over corpus columns) pre-filters candidates before
        the rerank — every query sees only matching rows, min(k, matches)
        results each, the same contract as single-query filtered search
        (≅ usearch filtered_search, reference:
        src/core/index/usearch_index.rs:68-85). Applied to the corpus side
        BEFORE the probe join, so it pushes down to the cell-pruned scan.

        Plan: (1)+(2) rank each query's ``nprobe`` nearest cells with one
        Arrow GEMM per query batch (`_probe_cells_arrow`);
        (3) equi-join that (query, cell) set against the cell-partitioned
        corpus — candidates only materialize inside probed cells; (4) exact
        rerank per query with one window. The corpus-side join key is the
        partition column, so at scale step 3 is shuffle-on-cell with
        pruning, never a cross join. ``nprobe >= nlist`` degenerates to
        exact batch kNN (oracle-checked).

        Returns (query_id, id, distance|score, rank).
        """
        if k < 1:
            raise ValueError("k must be >= 1")
        if nprobe < 1:
            raise ValueError("nprobe must be >= 1")
        metric = metric or self.metric
        from vector_db_spark.operators.knn import SCORE_COL, _metric

        expr_fn, ascending = _metric(metric)
        out = SCORE_COL[metric]

        # (1)+(2): nprobe nearest cells per query — one Arrow GEMM per
        # query batch (metric-mapped for ranking, original vectors carried
        # through for the true-metric rerank). See _probe_cells_arrow for
        # why this is not a literal-distance expression.
        probed = _probe_cells_arrow(
            queries, query_id_col, query_vec_col, self.centroids, self.metric, nprobe
        )

        # (3): candidates = corpus rows in probed cells, per query.
        # broadcast_queries=True (the common case: query set ≪ corpus)
        # ships the probed (query, cell) set to every executor — the
        # corpus never moves. For query sets too large to broadcast,
        # broadcast_queries=False shuffles BOTH sides on cluster_id — an
        # equi-join on the corpus's existing partition column, so the
        # corpus side is a co-located (often zero-move) shuffle.
        probe_side = F.broadcast(probed) if broadcast_queries else probed
        corpus = self._live()
        if predicate is not None:
            corpus = corpus.filter(predicate)
        cands = corpus.join(probe_side, on=_CLUSTER_COL)

        # (4): exact rerank per query.
        scored = cands.select(
            query_id_col,
            self.id_col,
            expr_fn(F.col(self.vec_col), F.col(query_vec_col)).alias(out),
        )
        order = F.col(out).asc() if ascending else F.col(out).desc()
        w = Window.partitionBy(query_id_col).orderBy(order, F.col(self.id_col).asc())
        return scored.withColumn("rank", F.row_number().over(w)).filter(
            F.col("rank") <= k
        )


# One authoritative probe-size bound: past it the plan-side explode/isin
# stops being a literal expression Catalyst folds cheaply, and probing a
# quarter of the code space means the index wants fewer bits, not a
# wider probe. tune_lsh filters its ladder with the same pair.
_PROBE_MASK_CAP = 2048


def _probe_mask_count(n_bits: int, probe_radius: int) -> int:
    """Masks a radius-``probe_radius`` Hamming ball needs (excluding the
    query's own code): ``sum_{1<=i<=r} C(n_bits, i)``."""
    r = min(probe_radius, n_bits)
    return sum(math.comb(n_bits, i) for i in range(1, r + 1))


def _probe_masks(n_bits: int, probe_radius: int) -> list[int]:
    """Nonzero XOR masks with popcount ≤ ``probe_radius`` (popcount-major
    order: all 1-flip buckets before any 2-flip bucket) — the multiprobe
    neighborhood of a query's own code. Raises past ``_PROBE_MASK_CAP``."""
    r = min(probe_radius, n_bits)
    if r < 1:
        return []
    total = _probe_mask_count(n_bits, r)
    if total > _PROBE_MASK_CAP:
        raise ValueError(
            f"probe_radius={probe_radius} over n_bits={n_bits} probes "
            f"{total + 1} buckets per table; cap is {_PROBE_MASK_CAP} — "
            "rebuild with fewer bits instead"
        )
    return [
        sum(1 << p for p in pos)
        for i in range(1, r + 1)
        for pos in combinations(range(n_bits), i)
    ]


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
        # Delete manifest — same tombstone contract as IvfIndex.delete;
        # the anti-join key is the bucket table's "id" column (one row
        # per (table, id), all dropped together).
        self.tombstones: DataFrame | None = None

    @staticmethod
    def _bucketize(
        corpus: DataFrame, planes: np.ndarray, id_col: str, vec_col: str
    ) -> DataFrame:
        """Corpus → long-format (id, vec, extras…, table, bucket). All
        n_tables·n_bits hyperplane projections evaluate as ONE
        Arrow-batched matmul per partition — (batch × dim) @ (dim ×
        n_tables·n_bits), signs packed to per-table bucket ids — instead
        of n_tables·n_bits interpreted fold expressions over the corpus.
        Shared by build() and append() (frozen planes both times)."""
        n_tables, n_bits = planes.shape[0], planes.shape[1]
        flat = planes.reshape(n_tables * n_bits, planes.shape[2]).T.copy()
        weights = (1 << np.arange(n_bits, dtype=np.int64))[None, None, :]

        @F.pandas_udf("array<long>")
        def _buckets(vecs: pd.Series) -> pd.Series:
            v = np.stack([np.asarray(x, dtype=np.float64) for x in vecs])
            bits = (v @ flat >= 0).astype(np.int64)  # (n, T*B)
            b = (bits.reshape(len(v), n_tables, n_bits) * weights).sum(axis=2)
            return pd.Series(list(b))

        # Non-vector corpus columns ride along into the bucket table so a
        # filtered search can evaluate its predicate on the candidates —
        # the Spark analogue of the reference's predicate-during-traversal
        # filtered_search (reference: src/core/index/usearch_index.rs:68-85).
        extras = [c for c in corpus.columns if c not in (id_col, vec_col)]
        # posexplode_OUTER, deliberately: plain posexplode lets Catalyst's
        # InferFiltersFromGenerate add `size(_bk)>0 AND _bk IS NOT NULL`,
        # which predicate-pushdown then rewrites through the alias into a
        # SECOND ArrowEvalPython of the bucket matmul below the first
        # (measured 2× the build cost). _buckets always returns exactly
        # n_tables entries, so outer-vs-inner semantics are identical here
        # and the inference (which skips outer generates) never fires.
        return (
            corpus.select(
                F.col(id_col).alias("id"),
                F.col(vec_col).alias("vec"),
                *extras,
                _buckets(F.col(vec_col)).alias("_bk"),
            )
            .select(
                "id", "vec", *extras,
                F.posexplode_outer("_bk").alias("table", "bucket"),
            )
        )

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
        long_form = CosineLshIndex._bucketize(corpus, planes, id_col, vec_col)
        return CosineLshIndex(planes, long_form, id_col, vec_col)

    def append(self, new_rows: DataFrame, path: str | None = None) -> "CosineLshIndex":
        """Incremental maintenance with FROZEN hyperplanes: new rows
        bucketize through the same matmul kernel and (with ``path``)
        append as new files into the (table, bucket) partitions — bucket
        membership has no cross-row structure, so unlike the graph
        family nothing rebuilds. Same tombstone caveat as IvfIndex.
        append: an appended tombstoned id stays dead until compaction."""
        bucketed = CosineLshIndex._bucketize(
            new_rows, self.planes, self.id_col, self.vec_col
        )
        if path is not None:
            bucketed.write.mode("append").partitionBy("table", "bucket").parquet(
                os.path.join(path, "buckets")
            )
        self.buckets = self.buckets.unionByName(bucketed)
        return self

    def save(self, path: str) -> None:
        """Persist buckets partitioned by (table, bucket) — search() after
        load() prunes to the probed bucket partitions. n_tables · 2^n_bits
        dirs is always past the shuffle threshold, so this write gets the
        pre-shuffle (one file per bucket dir; see write_partitioned)."""
        n_tables, n_bits = self.planes.shape[0], self.planes.shape[1]
        write_partitioned(
            self.buckets,
            ["table", "bucket"],
            os.path.join(path, "buckets"),
            n_dirs=n_tables * (1 << n_bits),
        )
        np.save(os.path.join(path, "planes.npy"), self.planes)
        import json

        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump({"id_col": self.id_col, "vec_col": self.vec_col}, f)
        snapshot_tombstones(self.tombstones, self.buckets.sparkSession, path)

    @staticmethod
    def load(spark: SparkSession, path: str) -> "CosineLshIndex":
        import json

        planes = np.load(os.path.join(path, "planes.npy"))
        buckets = spark.read.parquet(os.path.join(path, "buckets"))
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        idx = CosineLshIndex(planes, buckets, meta["id_col"], meta["vec_col"])
        idx.tombstones = load_tombstones(spark, path)
        return idx

    def delete(
        self, ids: Sequence[int] | DataFrame, path: str | None = None
    ) -> "CosineLshIndex":
        """Tombstone delete (≅ usearch remove, reference:
        src/core/index/usearch_index.rs:87-93): the (table, bucket)
        layout is never rewritten; probes anti-join the manifest. See
        IvfIndex.delete for the full contract."""
        spark = self.buckets.sparkSession
        col = self.id_col if isinstance(ids, DataFrame) and self.id_col in ids.columns else None
        tomb = tombstone_df(spark, ids, col)
        self.tombstones = merge_tombstones(self.tombstones, tomb)
        if path is not None:
            write_tombstones(tomb, path)
        return self

    def _live(self) -> DataFrame:
        return apply_tombstones(self.buckets, "id", self.tombstones)

    def vacuum(self, path: str) -> "CosineLshIndex":
        """Compaction into a FRESH directory (same planes, live rows,
        empty manifest) — never overwrites a layout being read."""
        out = CosineLshIndex(self.planes, self._live(), self.id_col, self.vec_col)
        out.save(path)
        return CosineLshIndex.load(self.buckets.sparkSession, path)

    def query_buckets(
        self, query: Sequence[float], probe_radius: int = 0
    ) -> list[tuple[int, int]]:
        """Buckets to probe per table: the query's own code plus every
        bucket within Hamming distance ``probe_radius`` of it — classic
        multiprobe (near-boundary hyperplanes are where true neighbors
        get separated), generalized past one flip: recall is monotone in
        the radius, and ``probe_radius=n_bits`` probes every bucket
        (exact). Candidates multiply by ``sum_{i<=r} C(n_bits, i)``."""
        q = np.asarray(list(query), dtype=np.float64)
        if q.shape[0] != self.planes.shape[2]:
            raise ValueError(
                f"dimension mismatch: query has {q.shape[0]} components, "
                f"index dim is {self.planes.shape[2]}"
            )
        n_bits = self.planes.shape[1]
        masks = _probe_masks(n_bits, probe_radius)
        out = []
        for t in range(self.planes.shape[0]):
            bits = (self.planes[t] @ q >= 0).astype(np.int64)
            b = int((bits << np.arange(n_bits)).sum())
            out.append((t, b))
            out.extend((t, b ^ m) for m in masks)
        return out

    def search_batch(
        self,
        queries: DataFrame,
        k: int,
        probe_radius: int = 1,
        predicate: Column | None = None,
        query_id_col: str = "query_id",
        query_vec_col: str = "query_vec",
        broadcast_queries: bool = True,
    ) -> DataFrame:
        """Top-k cosine per query for a DataFrame of queries through the
        LSH tables — no driver-side loop: (1) one Arrow matmul buckets
        every query against all tables (the same kernel as the build
        side); (2) multiprobe expansion is a literal XOR explode (each
        bucket plus every bucket within Hamming distance
        ``probe_radius`` of it — recall is monotone in the radius, and
        radius = n_bits probes everything); (3) an equi-join on
        (table, bucket) lands candidates — after save() that key is the
        partition layout, so the corpus side prunes; (4) dedup per
        (query, id) across tables, optional predicate, one window ranks
        per query. ``probe_radius=0`` disables multiprobe. Returns
        (query_id, id, score, rank).

        ``broadcast_queries=False`` (query sets too large to broadcast)
        shuffles BOTH sides on (table, bucket) — the buckets frame's own
        partition key, so the corpus side is a co-located shuffle (the
        same contract as IvfIndex.search_batch).

        With n_bits=1 and probe_radius>=1 every bucket of every table is
        probed, so the result must equal exact filtered batch cosine kNN
        — the oracle gate (ann_lsh_batch_filtered_exhaustive)."""
        from vector_db_spark.operators.knn import SCORE_COL, _metric

        if k < 1:
            raise ValueError("k must be >= 1")
        n_tables, n_bits, dim = self.planes.shape
        flat = self.planes.reshape(n_tables * n_bits, dim).T.copy()
        weights = (1 << np.arange(n_bits, dtype=np.int64))[None, None, :]

        @F.pandas_udf("array<long>")
        def _qbuckets(vecs: pd.Series) -> pd.Series:
            v = np.stack([np.asarray(x, dtype=np.float64) for x in vecs])
            if v.shape[1] != dim:
                raise ValueError(
                    f"dimension mismatch: query has {v.shape[1]} components, "
                    f"index dim is {dim}"
                )
            bits = (v @ flat >= 0).astype(np.int64)
            b = (bits.reshape(len(v), n_tables, n_bits) * weights).sum(axis=2)
            return pd.Series(list(b))

        probed = queries.select(
            query_id_col,
            query_vec_col,
            F.posexplode(_qbuckets(F.col(query_vec_col))).alias("table", "_b0"),
        )
        flips = [F.col("_b0")] + [
            F.col("_b0").bitwiseXOR(F.lit(m))
            for m in _probe_masks(n_bits, probe_radius)
        ]
        probed = probed.select(
            query_id_col,
            query_vec_col,
            "table",
            F.explode(F.array(*flips)).alias("bucket"),
        )

        extras = [
            c for c in self.buckets.columns if c not in ("id", "vec", "table", "bucket")
        ]
        probe_side = F.broadcast(probed) if broadcast_queries else probed
        cands = (
            self._live().join(probe_side, on=["table", "bucket"])
            .dropDuplicates([query_id_col, "id"])
            .select(
                query_id_col,
                query_vec_col,
                F.col("id").alias(self.id_col),
                F.col("vec").alias(self.vec_col),
                *extras,
            )
        )
        if predicate is not None:
            cands = cands.filter(predicate)
        expr_fn, ascending = _metric("cosine")
        out = SCORE_COL["cosine"]
        scored = cands.select(
            query_id_col,
            self.id_col,
            expr_fn(F.col(self.vec_col), F.col(query_vec_col)).alias(out),
        )
        order = F.col(out).asc() if ascending else F.col(out).desc()
        w = Window.partitionBy(query_id_col).orderBy(order, F.col(self.id_col).asc())
        return scored.withColumn("rank", F.row_number().over(w)).filter(
            F.col("rank") <= k
        )

    def range_search_batch(
        self,
        queries: DataFrame,
        threshold: float,
        metric: str = "cosine",
        probe_radius: int = 1,
        predicate: Column | None = None,
        query_id_col: str = "query_id",
        query_vec_col: str = "query_vec",
        broadcast_queries: bool = True,
    ) -> DataFrame:
        """Batched range search through the LSH tables — the n-query
        formulation of range_search() (VERDICT r11 #3: faiss
        ``range_search`` is natively batched). Candidate generation is
        search_batch()'s fully distributed shape — one Arrow matmul
        buckets every query, multiprobe XOR explode, equi-join on
        (table, bucket) (partition pruning after save()) — so EACH query
        sees exactly its OWN probed buckets (single-query semantics per
        query, not a union slop-over), with no driver-side loop or
        collect. Verification replaces the top-k window with the exact
        threshold filter: every emitted row truly passes the metric test
        at ANY radius; coverage follows the multiprobe s-curve and
        radius = n_bits equals exact batch range search (the
        ann_lsh_batch_range_exhaustive gate shares knn_batch_range's
        oracle). Returns (query_id, id, distance|score) ordered by
        (query_id, metric, id) — knn.batch_range_search's shape."""
        from vector_db_spark.operators.knn import SCORE_COL, _metric

        n_tables, n_bits, dim = self.planes.shape
        flat = self.planes.reshape(n_tables * n_bits, dim).T.copy()
        weights = (1 << np.arange(n_bits, dtype=np.int64))[None, None, :]

        @F.pandas_udf("array<long>")
        def _qbuckets(vecs: pd.Series) -> pd.Series:
            v = np.stack([np.asarray(x, dtype=np.float64) for x in vecs])
            if v.shape[1] != dim:
                raise ValueError(
                    f"dimension mismatch: query has {v.shape[1]} components, "
                    f"index dim is {dim}"
                )
            bits = (v @ flat >= 0).astype(np.int64)
            b = (bits.reshape(len(v), n_tables, n_bits) * weights).sum(axis=2)
            return pd.Series(list(b))

        probed = queries.select(
            query_id_col,
            query_vec_col,
            F.posexplode(_qbuckets(F.col(query_vec_col))).alias("table", "_b0"),
        )
        flips = [F.col("_b0")] + [
            F.col("_b0").bitwiseXOR(F.lit(m))
            for m in _probe_masks(n_bits, probe_radius)
        ]
        probed = probed.select(
            query_id_col,
            query_vec_col,
            "table",
            F.explode(F.array(*flips)).alias("bucket"),
        )
        extras = [
            c for c in self.buckets.columns if c not in ("id", "vec", "table", "bucket")
        ]
        probe_side = F.broadcast(probed) if broadcast_queries else probed
        cands = (
            self._live().join(probe_side, on=["table", "bucket"])
            .dropDuplicates([query_id_col, "id"])
            .select(
                query_id_col,
                query_vec_col,
                F.col("id").alias(self.id_col),
                F.col("vec").alias(self.vec_col),
                *extras,
            )
        )
        if predicate is not None:
            cands = cands.filter(predicate)
        expr_fn, ascending = _metric(metric)
        out = SCORE_COL[metric]
        thr = float(threshold)
        scored = cands.select(
            query_id_col,
            self.id_col,
            expr_fn(F.col(self.vec_col), F.col(query_vec_col)).alias(out),
        )
        matches = scored.filter(
            F.col(out) <= thr if ascending else F.col(out) >= thr
        )
        order = F.col(out).asc() if ascending else F.col(out).desc()
        return matches.orderBy(
            F.col(query_id_col).asc(), order, F.col(self.id_col).asc()
        )

    def search(
        self,
        query: Sequence[float],
        k: int,
        metric: str = "cosine",
        probe_radius: int = 1,
        predicate: Column | None = None,
    ) -> DataFrame:
        """Union of probed-bucket candidates over all tables, exact-reranked.
        At scale the buckets frame is stored partitioned by (table, bucket)
        so this filter is pure partition pruning.

        ``predicate`` filters candidates BEFORE the rerank (pre-filter, so
        the result is min(k, matching candidates) — same contract as exact
        filtered kNN; ≅ usearch filtered_search,
        reference: src/core/index/usearch_index.rs:68-85)."""
        cands = self._probe_candidates(query, probe_radius)
        return knn(
            cands,
            query,
            k,
            metric=metric,
            vec_col=self.vec_col,
            id_col=self.id_col,
            predicate=predicate,
        )

    def _probe_candidates(
        self, query: Sequence[float], probe_radius: int
    ) -> DataFrame:
        """Deduplicated candidate rows from the multiprobe bucket set —
        the shared generation stage of search() and range_search()."""
        pairs = self.query_buckets(query, probe_radius)
        by_table: dict[int, list[int]] = {}
        for t, b in pairs:
            by_table.setdefault(t, []).append(b)
        # one In-list per table (not an OR-chain per pair): stays a flat
        # literal predicate Catalyst folds into partition pruning even at
        # multi-flip radii
        cond = None
        for t, bs in by_table.items():
            c = (F.col("table") == t) & F.col("bucket").isin(bs)
            cond = c if cond is None else (cond | c)
        extras = [
            c for c in self.buckets.columns if c not in ("id", "vec", "table", "bucket")
        ]
        return self._live().filter(cond).select(
            F.col("id").alias(self.id_col),
            F.col("vec").alias(self.vec_col),
            *extras,
        ).dropDuplicates([self.id_col])

    def range_search(
        self,
        query: Sequence[float],
        threshold: float,
        metric: str = "cosine",
        probe_radius: int = 1,
        predicate: Column | None = None,
    ) -> DataFrame:
        """All probed-bucket candidates within a metric threshold (faiss
        ``range_search`` semantics) — the LSH cell of the
        [top-k | range] × family matrix (the graph cell landed the same
        round; IVF has had lossless triangle-inequality range search
        since r5). Candidate generation is search()'s multiprobe bucket
        union (partition-pruned at rest, deduplicated); verification is
        knn.range_search's exact threshold filter + (metric, id) sort,
        so every emitted row truly passes the threshold at ANY radius.
        Coverage follows the multiprobe s-curve: ``probe_radius=n_bits``
        probes every bucket and the result equals the full-corpus range
        scan (the ann_lsh_range_exhaustive gate); tuned radii trade
        recall for candidate volume exactly as in top-k search."""
        from vector_db_spark.operators.knn import range_search as exact_range

        cands = self._probe_candidates(query, probe_radius)
        return exact_range(
            cands,
            query,
            threshold,
            metric=metric,
            vec_col=self.vec_col,
            id_col=self.id_col,
            predicate=predicate,
        )


FROZEN_DOC_IVF_PATH = "artifacts/ivf_centroids_docs.json"


def load_frozen_doc_ivf(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> IvfIndex:
    """Frozen coarse quantizer in exact-fold mode (round 14: the probe
    rung joins the hash-gated set): nlist=8 centroids from one pinned
    sf0.01 KMeans fit, repr-string persisted (the pca/pq artifact
    pattern). Assignments run through `_nearest_centroid_expr` — the
    pure-codegen argmin whose tie parity with the Arrow kernel is
    test-pinned, and whose left-fold arithmetic a DuckDB oracle replays
    bit-exactly (nlist·dim = 512, under the `_EXPR_ASSIGN_MAX` planning
    ceiling) — and `probe_order` ranks cells with order-pinned Python
    folds. The PRODUCTION Arrow assignment/probe kernels stay hash-gated
    at full probe (`ann_ivf_full_probe`, `ann_ivf_batch_full_probe`) and
    recall-tuned in RECALL_r*; this loader gives the REDUCED-probe
    semantics their own bit-exact gate."""
    import json

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        FROZEN_DOC_IVF_PATH,
    )
    with open(path) as f:
        art = json.load(f)
    cents = [[float(x) for x in row] for row in art["centroids"]]
    assignments = corpus.withColumn(
        _CLUSTER_COL, _nearest_centroid_expr(F.col(vec_col), cents)
    )
    idx = IvfIndex(cents, assignments, id_col, vec_col, "l2")
    idx.exact_fold = True
    return idx


FROZEN_DOC_SEMDEDUP_CELLS_PATH = "artifacts/semdedup_cells_docs.json"


def load_frozen_doc_cosine_cells(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> IvfIndex:
    """Frozen COSINE cells for the SemDeDup blocking gate (round 14):
    one pinned sf0.01 cosine KMeans fit (nlist = semdedup_nlist(n) at
    the fixture size), assignment = the codegen argmin expression over
    `normalize(vec)` — normalization is the same fold-portable
    sqrt-of-dot-fold + per-element divide the oracle replays, so the
    cell partition is bit-deterministic. The k ∝ n PRODUCTION recipe
    (uncapped semdedup_nlist + Arrow assignment) stays exercised by the
    bench/scale-probe path (`bench.py` builds the serving cosine IVF at
    semdedup_nlist) and the blocking-recall pins."""
    import json

    from vector_db_spark.functions.vector import normalize

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        FROZEN_DOC_SEMDEDUP_CELLS_PATH,
    )
    with open(path) as f:
        art = json.load(f)
    cents = [[float(x) for x in row] for row in art["centroids"]]
    assignments = corpus.withColumn(
        _CLUSTER_COL, _nearest_centroid_expr(normalize(F.col(vec_col)), cents)
    )
    idx = IvfIndex(cents, assignments, id_col, vec_col, "cosine")
    idx.exact_fold = True
    return idx
