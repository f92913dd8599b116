"""Collection lifecycle + DML: the reference's create/insert/upsert/query
surface (reference: src/router/mod.rs:1-7) rebuilt on immutable parquet
snapshots.

Two layers:

1. **Logical dataflow operators** (`merge_upsert`, `delete_rows`) — pure
   DataFrame→DataFrame transforms with MERGE semantics. These are what the
   oracle verifies. ``merge_upsert`` deliberately fixes the reference's
   stale-HNSW-vector bug (upsert leaves the old vector searchable,
   src/db/vector_database.rs:36-39 "unimplemented"): exactly one live row
   per key, everywhere (SURVEY.md §7.3.3).
2. **`CollectionCatalog` / `Collection`** — a tiny versioned-snapshot store
   over parquet directories. Each mutation writes a new immutable version
   dir and flips a catalog pointer (poor-man's snapshot isolation; at
   production scale this slot is filled by Delta/Iceberg with the same
   MERGE semantics — the API is the stable part). The catalog row
   ``(name, dim, metric, index_type)`` ≅ the reference's ``IndexKey``
   registry (src/core/index_factory.rs:24-29,70-72).

Scale notes: ``merge_upsert`` is one hash-shuffle on the key (same cost
class as Delta MERGE's join); ``delete_rows`` broadcasts the (small) id set
as an anti-join, so the big side never shuffles.
"""

from __future__ import annotations

import json
import os
import shutil
from collections.abc import Sequence
from dataclasses import asdict, dataclass

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

VALID_METRICS = ("l2", "ip", "cosine")
# ≅ IndexType {FLAT, HNSW, USEARCH} (src/core/index_factory.rs:17-22);
# ours name search strategies, not libraries.
VALID_INDEX_TYPES = ("exact", "lsh", "ivf")


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str] = ("id",),
) -> DataFrame:
    """MERGE semantics on plain DataFrames: update rows win over base rows,
    and within ``updates`` later duplicates are arbitrary-but-deterministic
    (highest priority row per key survives).

    ≅ reference upsert: existence probe → remove old → insert new →
    overwrite doc (src/db/vector_database.rs:24-80) collapsed into one
    declarative op. Executes as a single hash-shuffle on the key.
    """
    cols = base.columns
    if set(updates.columns) != set(cols):
        raise ValueError(
            f"updates schema {sorted(updates.columns)} != base schema {sorted(cols)}"
        )
    tagged = updates.select(*cols).withColumn("__prio", F.lit(0)).unionByName(
        base.withColumn("__prio", F.lit(1))
    )
    w = Window.partitionBy(*key_cols).orderBy(F.col("__prio").asc())
    return (
        tagged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__prio", "__rn")
    )


def delete_rows(
    base: DataFrame,
    target: DataFrame | Column,
    key_cols: Sequence[str] = ("id",),
) -> DataFrame:
    """Delete by predicate (Column) or by id-set (DataFrame of keys).

    ≅ faiss remove_vectors / usearch remove (src/core/index/faiss_index.rs:
    131-138, src/core/index/usearch_index.rs:87-93). The id-set form is a
    broadcast left-anti join — the corpus never shuffles.
    """
    if isinstance(target, Column):
        return base.filter(~target)
    keys = list(key_cols)
    return base.join(F.broadcast(target.select(*keys).distinct()), on=keys, how="left_anti")


@dataclass
class CollectionInfo:
    """≅ IndexKey {index_type, dim, metric_type} + name
    (src/core/index_factory.rs:24-29)."""

    name: str
    dim: int
    metric: str = "l2"
    index_type: str = "exact"
    version: int = 0
    id_col: str = "id"
    vec_col: str = "embedding"


class CollectionCatalog:
    """Registry of collections ≅ the reference's global DashMap registry
    (src/core/index_factory.rs:70-72,170-175), durable as a JSON file so a
    restart does NOT lose indexes (the reference's in-memory registry does).
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._path = os.path.join(root, "_catalog.json")

    def _load(self) -> dict[str, dict]:
        if not os.path.exists(self._path):
            return {}
        with open(self._path) as f:
            return json.load(f)

    def _save(self, data: dict[str, dict]) -> None:
        tmp = self._path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(data, f, indent=1)
        os.replace(tmp, self._path)

    def create(
        self,
        name: str,
        dim: int,
        metric: str = "l2",
        index_type: str = "exact",
    ) -> "Collection":
        # Validation semantics preserved from the reference
        # (src/models/request/create.rs:12-14 dim >= 1;
        #  src/core/index_factory.rs:157-161 unknown type -> error).
        if dim < 1:
            raise ValueError("dim must be >= 1")
        if metric not in VALID_METRICS:
            raise ValueError(f"unknown metric {metric!r}; expected {VALID_METRICS}")
        if index_type not in VALID_INDEX_TYPES:
            raise ValueError(
                f"unknown index_type {index_type!r}; expected {VALID_INDEX_TYPES}"
            )
        data = self._load()
        if name in data:
            raise ValueError(f"collection {name!r} already exists")
        info = CollectionInfo(name=name, dim=dim, metric=metric, index_type=index_type)
        data[name] = asdict(info)
        self._save(data)
        return Collection(self, info)

    def get(self, name: str) -> "Collection":
        data = self._load()
        if name not in data:
            raise KeyError(f"collection {name!r} not found")  # ≅ 404, app_error.rs:38-44
        return Collection(self, CollectionInfo(**data[name]))

    def list(self) -> list[str]:
        return sorted(self._load())

    def drop(self, name: str) -> None:
        data = self._load()
        data.pop(name, None)
        self._save(data)
        shutil.rmtree(os.path.join(self.root, name), ignore_errors=True)

    def _bump(self, name: str, version: int) -> None:
        data = self._load()
        data[name]["version"] = version
        self._save(data)


class Collection:
    """One vector collection: versioned parquet snapshots + MERGE DML."""

    def __init__(self, catalog: CollectionCatalog, info: CollectionInfo):
        self.catalog = catalog
        self.info = info

    def _vdir(self, version: int) -> str:
        return os.path.join(self.catalog.root, self.info.name, f"v{version:06d}")

    def _validated(self, df: DataFrame) -> DataFrame:
        """Schema-on-write enforcement (strict divergence from the
        reference's validate-nothing ingest, SURVEY.md §1.3): ids >= 1
        (src/models/request/insert.rs:12-14) and exact declared dim. The
        guards are plan-level raise_error branches — no extra validation
        job, the write itself fails on bad rows."""
        iid, vec = self.info.id_col, self.info.vec_col
        checked_id = F.when(F.col(iid) >= 1, F.col(iid)).otherwise(
            F.raise_error(F.lit(f"{iid} must be >= 1"))
        )
        checked_vec = F.when(
            F.size(F.col(vec)) == self.info.dim, F.col(vec)
        ).otherwise(
            F.raise_error(
                F.lit(f"{vec} must have exactly dim={self.info.dim} components")
            )
        )
        others = [c for c in df.columns if c not in (iid, vec)]
        return df.select(
            checked_id.alias(iid),
            F.transform(checked_vec, lambda x: x.cast("float")).alias(vec),
            *others,
        )

    def scan(self) -> DataFrame:
        """Current snapshot as a DataFrame (empty if never written)."""
        path = self._vdir(self.info.version)
        if not os.path.exists(path):
            return None  # caller-visible "empty collection" sentinel
        return self.catalog.spark.read.parquet(path)

    def _write_version(self, df: DataFrame) -> None:
        new_version = self.info.version + 1
        df.write.mode("overwrite").parquet(self._vdir(new_version))
        self.catalog._bump(self.info.name, new_version)
        self.info.version = new_version

    def insert(self, df: DataFrame) -> None:
        """Append-only ingest (≅ POST /insert,
        src/router/handle/insert_index_handle.rs:14-61). No dedup by design —
        upsert is the keyed path, exactly like the reference."""
        cur = self.scan()
        df = self._validated(df)
        self._write_version(df if cur is None else cur.unionByName(df))

    def upsert(self, df: DataFrame) -> None:
        """≅ POST /upsert (src/router/handle/upsert_handle.rs:11-44) with
        MERGE semantics everywhere — one live row per id."""
        cur = self.scan()
        df = self._validated(df)
        self._write_version(
            df if cur is None else merge_upsert(cur, df, (self.info.id_col,))
        )

    def delete(self, target: DataFrame | Column) -> None:
        cur = self.scan()
        if cur is None:
            return
        self._write_version(delete_rows(cur, target, (self.info.id_col,)))

    def get(self, id_value: int):
        """Point lookup (≅ POST /query, src/router/handle/query_handle.rs:
        12-33): returns the full row or None."""
        cur = self.scan()
        if cur is None:
            return None
        rows = cur.filter(F.col(self.info.id_col) == id_value).limit(1).collect()
        return rows[0] if rows else None

    # -- index lifecycle (≅ create_index + search dispatch,
    #    src/core/index_factory.rs:75-163 +
    #    src/router/handle/search_index_handle.rs:67-94) ------------------

    def _index_dir(self) -> str:
        return os.path.join(self.catalog.root, self.info.name, "index")

    def build_index(self, **params) -> None:
        """Build (or rebuild) the collection's ANN artifact per its
        declared index_type. 'exact' needs no artifact. The artifact
        records the snapshot version it was built from; search() refuses a
        stale index instead of silently serving it — the exact inverse of
        the reference's stale-HNSW-upsert behavior
        (src/db/vector_database.rs:36-39)."""
        cur = self.scan()
        if cur is None:
            raise ValueError("cannot index an empty collection")
        path = self._index_dir()
        if self.info.index_type == "exact":
            return
        if self.info.index_type == "ivf":
            from vector_db_spark.operators.ann import IvfIndex

            idx = IvfIndex.build(
                cur,
                id_col=self.info.id_col,
                vec_col=self.info.vec_col,
                metric=self.info.metric,
                **params,
            )
            idx.save(path)
        else:  # lsh
            from vector_db_spark.operators.ann import CosineLshIndex

            if self.info.metric != "cosine":
                raise ValueError("lsh index supports only the cosine metric")
            idx = CosineLshIndex.build(
                cur,
                dim=self.info.dim,
                id_col=self.info.id_col,
                vec_col=self.info.vec_col,
                **params,
            )
            idx.save(path)
        with open(os.path.join(path, "indexed_version.json"), "w") as f:
            json.dump({"version": self.info.version}, f)

    def _indexed_version(self) -> int | None:
        p = os.path.join(self._index_dir(), "indexed_version.json")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)["version"]

    def search(self, query, k: int, predicate: Column | None = None, **params):
        """Top-k search routed by the collection's index_type (the
        reference's per-backend dispatch). Approximate paths raise if the
        index predates the current snapshot — rebuild_index after
        mutations; stale results are never served silently."""
        from vector_db_spark.operators.knn import knn

        cur = self.scan()
        if cur is None:
            raise ValueError("collection is empty")
        if self.info.index_type == "exact":
            return knn(
                cur,
                query,
                k,
                metric=self.info.metric,
                id_col=self.info.id_col,
                vec_col=self.info.vec_col,
                predicate=predicate,
            )
        iv = self._indexed_version()
        if iv is None:
            raise ValueError("no index built; call build_index() first")
        if iv != self.info.version:
            raise ValueError(
                f"index built at v{iv} but collection is at "
                f"v{self.info.version}; call build_index() to rebuild"
            )
        if self.info.index_type == "ivf":
            from vector_db_spark.operators.ann import IvfIndex

            idx = IvfIndex.load(self.catalog.spark, self._index_dir())
            return idx.search(query, k, predicate=predicate, **params)
        from vector_db_spark.operators.ann import CosineLshIndex

        idx = CosineLshIndex.load(self.catalog.spark, self._index_dir())
        return idx.search(query, k, predicate=predicate, **params)
