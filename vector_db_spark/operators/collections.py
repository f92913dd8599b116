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
2. **`CollectionCatalog` / `Collection`** — a versioned snapshot store over
   HASH-BUCKETED parquet: rows live in ``pmod(xxhash64(id), B)`` buckets,
   and each mutation writes ONLY the buckets containing affected keys to a
   new immutable version dir. A per-version manifest maps every bucket to
   the version dir holding its current data, so unchanged buckets are
   shared between snapshots by reference — the copy-on-write granularity
   is a bucket, not the corpus (round-1's full-snapshot rewrite was the
   one DML scale-killer: one upserted row = full-corpus write). At
   production scale this slot is filled by Delta/Iceberg with the same
   MERGE semantics — the API is the stable part. The catalog row
   ``(name, dim, metric, index_type)`` ≅ the reference's ``IndexKey``
   registry (src/core/index_factory.rs:24-29,70-72).

Scale notes: ``merge_upsert`` is one hash-shuffle on the key (same cost
class as Delta MERGE's join); ``delete_rows`` broadcasts the (small) id set
as an anti-join, so the big side never shuffles. A keyed mutation touching
``u`` distinct keys reads and rewrites at most ``min(u, B)`` buckets —
O(corpus/B) bytes per bucket — and the old-bucket read is path-pruned (the
manifest enumerates exactly the dirs to scan). Size ``n_buckets`` so one
bucket ≈ one comfortable task (at 100 TB with B=65536, a bucket is ~1.5 GB).
The catalog is guarded by an OS file lock: concurrent writers serialize on
read-modify-write instead of losing updates (the reference gets this from
DashMap + per-index mutex, src/core/index_factory.rs:70-72; 10-thread test
mirrored in tests/test_collections.py).
"""

from __future__ import annotations

import fcntl
import json
import os
import shutil
from collections.abc import Sequence
from contextlib import contextmanager
from dataclasses import asdict, dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

VALID_METRICS = ("l2", "ip", "cosine")
# ≅ IndexType {FLAT, HNSW, USEARCH} (src/core/index_factory.rs:17-22);
# ours name search strategies, not libraries: 'graph' is the
# HNSW-equivalent (per-cell NSW, operators/graph.py); 'ivfpq'/'ivfsq'/
# 'ivfopq' are the compressed-cell layouts (operators/ivfpq.py, ivfsq.py,
# opq.py — the last adds the learned OPQ rotation in front) the
# faiss factory would spell IVFx,PQy / IVFx,SQ8.
VALID_INDEX_TYPES = (
    "exact", "lsh", "ivf", "graph", "ivfpq", "ivfsq", "ivfopq",
    "maxsim", "maxsim_pq",
)
# Multi-vector (late-interaction) collections: a row is a DOCUMENT whose
# vector column is array<array<float>> — one token vector per inner
# element. The reference's one-factory contract (every backend through
# index_factory.rs:75-163) extends to the PLAID families: 'maxsim' is the
# raw token store (late_interaction.MaxSimIvfIndex), 'maxsim_pq' the
# ColBERTv2 residual-compressed store (MaxSimPqIndex). MaxSim IS an
# inner-product score, so these types require metric='ip'.
MULTI_VECTOR_INDEX_TYPES = ("maxsim", "maxsim_pq")

# Serving-time knobs each family's search()/search_batch() accepts — the
# single authoritative whitelist shared by the catalog
# (Collection.set_serving_params) and the request facade (api.py's
# per-request "params" object). Engine extension: the reference wire has
# no serving knobs (search.rs:6-17); its backends hardcode ef/nprobe at
# build time. A knob must be a positive integer.
SERVING_KNOBS: dict[str, tuple[str, ...]] = {
    "exact": (),
    "lsh": ("probe_radius",),
    "ivf": ("nprobe",),
    "graph": ("nprobe", "ef_search"),
    "ivfpq": ("nprobe", "shortlist"),
    "ivfsq": ("nprobe", "shortlist"),
    "ivfopq": ("nprobe", "shortlist"),
    "maxsim": ("nprobe", "shortlist"),
    "maxsim_pq": ("nprobe", "shortlist"),
}


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
        # NULL-predicate rows are KEPT (SQL/Delta DELETE WHERE semantics):
        # a bare ~target turns NULL into NULL and filter() drops the row —
        # deleting rows the predicate never matched
        return base.filter(~F.coalesce(target, F.lit(False)))
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
    n_buckets: int = 16
    # Persisted serving defaults (tuner output written back via
    # Collection.set_serving_params); {} on catalogs written before the
    # field existed — CollectionInfo(**old_json) still loads.
    serving_params: dict = field(default_factory=dict)
    # Build knobs that produced the current index artifact (recorded by
    # build_index): refresh_index() rebuilds with them when called with
    # no arguments. Same backward-compat contract as serving_params.
    build_params: dict = field(default_factory=dict)
    # Keys of build knobs that could NOT be recorded (non-JSON values,
    # e.g. a shared quantizer object): a no-arg refresh_index() on such
    # a collection warns that the replay is partial.
    build_params_dropped: list = field(default_factory=list)
    # Creation nonce: distinguishes a drop()+re-create of the same name
    # from the original — (name, version) alone collides across
    # incarnations and poisoned the API's per-snapshot row-count cache.
    # "" on catalogs written before the field existed.
    created: str = ""


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
        self._lock_path = os.path.join(root, "_catalog.lock")

    @contextmanager
    def _locked(self):
        """Exclusive OS file lock (flock) held across every catalog
        read-modify-write: two concurrent writers serialize instead of
        the second silently dropping the first's update. ≅ the reference's
        DashMap + per-index mutex (src/core/index_factory.rs:70-72)."""
        with open(self._lock_path, "w") as lf:
            fcntl.flock(lf, fcntl.LOCK_EX)
            try:
                yield
            finally:
                fcntl.flock(lf, fcntl.LOCK_UN)

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
        n_buckets: int = 16,
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
        if index_type in MULTI_VECTOR_INDEX_TYPES and metric != "ip":
            raise ValueError(
                f"index_type {index_type!r} serves late-interaction "
                "inner-product scores; create with metric='ip'"
            )
        if n_buckets < 1:
            raise ValueError("n_buckets must be >= 1")
        with self._locked():
            data = self._load()
            if name in data:
                raise ValueError(f"collection {name!r} already exists")
            import uuid

            info = CollectionInfo(
                name=name,
                dim=dim,
                metric=metric,
                index_type=index_type,
                n_buckets=n_buckets,
                created=uuid.uuid4().hex,
            )
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
        with self._locked():
            data = self._load()
            data.pop(name, None)
            self._save(data)
        shutil.rmtree(os.path.join(self.root, name), ignore_errors=True)

    def gc_index_artifacts(self) -> dict[str, list[str]]:
        """Catalog-wide index-artifact retention sweep: run every
        collection's Collection.gc_index_artifacts (the explicit
        maintenance call; see its concurrency contract) and report
        {collection: removed_paths} for the ones that reclaimed space —
        the single entry point a janitor job schedules."""
        out: dict[str, list[str]] = {}
        for name in self.list():
            removed = self.get(name).gc_index_artifacts()
            if removed:
                out[name] = removed
        return out

    def _bump(self, name: str, version: int) -> None:
        with self._locked():
            data = self._load()
            data[name]["version"] = version
            self._save(data)


class _BucketedStore:
    """Bucket-granular copy-on-write parquet storage engine, shared by
    ``Collection`` (typed, vector-bearing) and ``DocumentStore``
    (schemaless JSON). Consumers provide five accessors (`_store_spark`,
    `_store_dir`, `_store_id_col`, `_store_n_buckets`, `_store_version`),
    a `_publish_version(v)` hook, and `_validated(df)`.

    Layout per version dir v{N}: parquet under __bucket=<b>/ for ONLY the
    buckets the mutation touched, plus _manifest.json mapping EVERY live
    bucket to the version dir holding its current data. scan() reads the
    manifest's leaf dirs; unchanged buckets are shared across snapshots.
    """

    # accessors overridden by consumers -----------------------------------
    @property
    def _store_spark(self) -> SparkSession:
        raise NotImplementedError

    @property
    def _store_dir(self) -> str:
        raise NotImplementedError

    @property
    def _store_id_col(self) -> str:
        raise NotImplementedError

    @property
    def _store_n_buckets(self) -> int:
        raise NotImplementedError

    @property
    def _store_version(self) -> int:
        raise NotImplementedError

    def _publish_version(self, version: int) -> None:
        raise NotImplementedError

    def _validated(self, df: DataFrame) -> DataFrame:
        return df

    def _store_mutation_lock_path(self) -> str:
        raise NotImplementedError

    def _refresh_store_state(self) -> None:
        """Re-read the authoritative version after taking the mutation
        lock (consumers override)."""

    @contextmanager
    def _mutating(self):
        """Serialize a keyed mutation's WHOLE read-modify-write across
        processes: version allocation, bucket write, and publish happen
        under one exclusive flock, and the store state refreshes after
        acquisition so the writer builds on the LATEST committed version.
        Without this, two writers (N driver replicas over one parquet
        root — the documented scale-out shape, server.py — or a library
        job beside the server) both computed v(N+1) from a stale in-
        memory version; the second overwrite clobbered the first's bucket
        files and manifest with no error. The catalog flock only guarded
        the version-number JSON, not the allocation."""
        with open(self._store_mutation_lock_path(), "w") as lf:
            fcntl.flock(lf, fcntl.LOCK_EX)
            try:
                self._refresh_store_state()
                yield
            finally:
                fcntl.flock(lf, fcntl.LOCK_UN)

    # engine ---------------------------------------------------------------
    def _vdir(self, version: int) -> str:
        return os.path.join(self._store_dir, f"v{version:06d}")

    def _bucket_expr(self) -> Column:
        # cast to long first: Spark's xxhash64 hashes IntegerType and
        # LongType differently, and bucket routing must not depend on the
        # caller's id width
        return F.pmod(
            F.xxhash64(F.col(self._store_id_col).cast("long")),
            F.lit(self._store_n_buckets),
        ).cast("int")

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self._vdir(version), "_manifest.json")

    def _manifest(self, version: int) -> dict[str, int] | None:
        p = self._manifest_path(version)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def _bucket_paths(self, manifest: dict[str, int], buckets=None) -> list[str]:
        sel = manifest if buckets is None else {
            str(b): manifest[str(b)] for b in buckets if str(b) in manifest
        }
        return [
            os.path.join(self._vdir(dv), f"__bucket={b}") for b, dv in sel.items()
        ]

    def _schema_path(self) -> str:
        return os.path.join(self._store_dir, "_schema.json")

    def _read_buckets(self, manifest: dict[str, int], buckets=None) -> DataFrame | None:
        paths = self._bucket_paths(manifest, buckets)
        if not paths:
            return None
        return self._store_spark.read.parquet(*paths)

    def scan(self) -> DataFrame:
        """Current snapshot as a DataFrame (None if never written)."""
        manifest = self._manifest(self._store_version)
        if manifest is None:
            return None  # caller-visible "empty collection" sentinel
        df = self._read_buckets(manifest)
        if df is not None:
            return df
        # all rows deleted: empty frame with the recorded schema
        from pyspark.sql.types import StructType

        with open(self._schema_path()) as f:
            schema = StructType.fromJson(json.load(f))
        return self._store_spark.createDataFrame([], schema)

    def versions(self) -> list[int]:
        """All readable snapshot versions (every version dir keeps its
        manifest forever — dirs are immutable once published)."""
        if not os.path.isdir(self._store_dir):
            return []
        out = []
        for d in os.listdir(self._store_dir):
            if d.startswith("v") and os.path.exists(
                os.path.join(self._store_dir, d, "_manifest.json")
            ):
                out.append(int(d[1:]))
        # numeric, not lexicographic: 'v1000000' sorts before 'v999999'
        # as a string, and a lexicographic tail would make vacuum()
        # retain the wrong snapshots and delete the NEWEST data
        return sorted(out)

    def scan_at(self, version: int) -> DataFrame:
        """Snapshot-as-of read (Delta/Iceberg time travel): version dirs
        and their manifests are immutable, so any historical state
        reconstructs by reading THAT version's manifest — unchanged
        buckets resolve to older dirs exactly as the live scan does. At
        100 TB this costs the same as a current read (the manifest is the
        only per-version metadata); retention GC would prune old dirs."""
        manifest = self._manifest(version)
        if manifest is None:
            raise ValueError(
                f"version {version} does not exist; have {self.versions()}"
            )
        df = self._read_buckets(manifest)
        if df is not None:
            return df
        from pyspark.sql.types import StructType

        with open(self._schema_path()) as f:
            schema = StructType.fromJson(json.load(f))
        return self._store_spark.createDataFrame([], schema)

    def vacuum(self, retain_last: int = 2) -> list[int]:
        """Retention GC (Delta VACUUM analogue): keep every version dir
        REFERENCED by the manifests of the newest ``retain_last``
        snapshots, delete the rest — reclaiming the space old
        copy-on-write versions hold. Bucket sharing makes reachability
        the criterion, not age: an old dir stays alive as long as any
        retained manifest still points a bucket at it. Time travel to a
        vacuumed version raises (its manifest is gone) — the documented
        retention trade. Returns the deleted version numbers."""
        if retain_last < 1:
            raise ValueError("retain_last must be >= 1")
        with self._mutating():
            return self._vacuum_locked(retain_last)

    def _vacuum_locked(self, retain_last: int) -> list[int]:
        versions = self.versions()
        if not versions:
            return []
        retained = versions[-retain_last:]
        live_dirs: set[int] = set(retained)
        for v in retained:
            manifest = self._manifest(v) or {}
            live_dirs.update(int(dv) for dv in manifest.values())
        deleted = []
        for v in versions:
            if v not in live_dirs:
                shutil.rmtree(self._vdir(v), ignore_errors=True)
                deleted.append(v)
        return deleted

    def diff(self, v_old: int, v_new: int | None = None) -> DataFrame:
        """CDC between two snapshots: (id, change) rows where change ∈
        {'added', 'removed', 'changed'} — unchanged rows are omitted.
        ``v_new=None`` diffs against the live snapshot. A full-outer join
        on the id key over two manifest reads; at scale both sides share
        the same bucket layout, so the join keys are co-partitioned by
        construction. Change detection compares the full non-key payload
        (struct equality, arrays included)."""
        old = self.scan_at(v_old)
        new = self.scan() if v_new is None else self.scan_at(v_new)
        iid = self._store_id_col
        cols = [c for c in old.columns if c != iid]
        o = old.select(
            F.col(iid), F.struct(*[F.col(c) for c in cols]).alias("__o")
        )
        nw = new.select(
            F.col(iid), F.struct(*[F.col(c) for c in cols]).alias("__n")
        )
        j = o.join(nw, iid, "full_outer")
        change = (
            F.when(F.col("__o").isNull(), F.lit("added"))
            .when(F.col("__n").isNull(), F.lit("removed"))
            .when(F.col("__o") != F.col("__n"), F.lit("changed"))
        )
        return (
            j.select(F.col(iid), change.alias("change"))
            .filter(F.col("change").isNotNull())
        )

    def _write_buckets(
        self, df: DataFrame, changed: Sequence[int], base: dict[str, int]
    ) -> None:
        """Write ``df``'s rows for the ``changed`` buckets into a new
        version dir and publish a manifest that keeps every other bucket
        pointing at its existing dir — bucket-granular copy-on-write."""
        new_version = self._store_version + 1
        out = self._vdir(new_version)
        bucketed = df.withColumn("__bucket", self._bucket_expr())
        (
            bucketed.filter(F.col("__bucket").isin([int(b) for b in changed]))
            # cluster each bucket's rows into one task → one file per bucket
            .repartition(max(1, min(len(changed), 32)), "__bucket")
            .write.mode("overwrite")
            .partitionBy("__bucket")
            .parquet(out)
        )
        # a changed bucket that ended up empty (all its rows deleted) writes
        # no dir — it must leave the manifest entirely
        present = {
            int(d.split("=")[1])
            for d in os.listdir(out)
            if d.startswith("__bucket=")
        }
        manifest = {b: dv for b, dv in base.items() if int(b) not in set(changed)}
        manifest.update({str(b): new_version for b in sorted(present)})
        if not os.path.exists(self._schema_path()):
            with open(self._schema_path(), "w") as f:
                json.dump(df.schema.jsonValue(), f)
        with open(self._manifest_path(new_version), "w") as f:
            json.dump(manifest, f, indent=1)
        self._publish_version(new_version)

    def _changed_buckets(self, df: DataFrame) -> list[int]:
        """Distinct buckets hit by a keyed mutation (≤ n_buckets values —
        a driver-safe collect)."""
        return [
            r.b
            for r in df.select(self._bucket_expr().alias("b")).distinct().collect()
        ]

    def insert(self, df: DataFrame) -> None:
        """Append-only ingest (≅ POST /insert,
        src/router/handle/insert_index_handle.rs:14-61). No dedup by design —
        upsert is the keyed path, exactly like the reference. Rewrites only
        the buckets the new rows hash into."""
        df = self._validated(df)
        with self._mutating():
            base = self._manifest(self._store_version) or {}
            changed = self._changed_buckets(df)
            old = self._read_buckets(base, changed)
            merged = df if old is None else old.unionByName(df)
            self._write_buckets(merged, changed, base)

    def upsert(self, df: DataFrame) -> None:
        """≅ POST /upsert (src/router/handle/upsert_handle.rs:11-44) with
        MERGE semantics everywhere — one live row per id. Reads and
        rewrites only the buckets containing upserted keys."""
        df = self._validated(df)
        with self._mutating():
            base = self._manifest(self._store_version) or {}
            changed = self._changed_buckets(df)
            old = self._read_buckets(base, changed)
            merged = (
                df if old is None else merge_upsert(old, df, (self._store_id_col,))
            )
            self._write_buckets(merged, changed, base)

    def delete(self, target: DataFrame | Column) -> None:
        """Keyed deletes (id-set DataFrame) touch only the keys' buckets;
        predicate deletes can hit any row, so every bucket rewrites."""
        with self._mutating():
            base = self._manifest(self._store_version)
            if base is None:
                return
            if isinstance(target, Column):
                changed = [int(b) for b in base]
            else:
                keyed = target.select(self._store_id_col)
                changed = [
                    b for b in self._changed_buckets(keyed) if str(b) in base
                ]
            if not changed:
                return
            old = self._read_buckets(base, changed)
            remaining = delete_rows(old, target, (self._store_id_col,))
            self._write_buckets(remaining, changed, base)

    def get(self, id_value: int):
        """Point lookup (≅ POST /query, src/router/handle/query_handle.rs:
        12-33): returns the full row or None. Reads ONLY the key's bucket —
        1/n_buckets of the corpus — by computing the bucket id first (a
        one-row local job, so the hash is bit-identical to write-side
        routing)."""
        manifest = self._manifest(self._store_version)
        if manifest is None:
            return None
        b = (
            self._store_spark.range(1)
            .select(
                F.pmod(
                    F.xxhash64(F.lit(int(id_value)).cast("long")),
                    F.lit(self._store_n_buckets),
                )
                .cast("int")
                .alias("b")
            )
            .head()
            .b
        )
        cur = self._read_buckets(manifest, [b])
        if cur is None:
            return None
        rows = cur.filter(F.col(self._store_id_col) == id_value).limit(1).collect()
        return rows[0] if rows else None


class Collection(_BucketedStore):
    """One vector collection: versioned parquet snapshots + MERGE DML."""

    def __init__(self, catalog: CollectionCatalog, info: CollectionInfo):
        self.catalog = catalog
        self.info = info

    @property
    def _store_spark(self) -> SparkSession:
        return self.catalog.spark

    @property
    def _store_dir(self) -> str:
        return os.path.join(self.catalog.root, self.info.name)

    @property
    def _store_id_col(self) -> str:
        return self.info.id_col

    @property
    def _store_n_buckets(self) -> int:
        return self.info.n_buckets

    @property
    def _store_version(self) -> int:
        return self.info.version

    def _publish_version(self, version: int) -> None:
        self.catalog._bump(self.info.name, version)
        self.info.version = version

    def _store_mutation_lock_path(self) -> str:
        return os.path.join(self.catalog.root, f"{self.info.name}.mutlock")

    def _refresh_store_state(self) -> None:
        # the catalog is the cross-process truth: a concurrent writer may
        # have advanced the version since this handle last read it
        self.info = self.catalog.get(self.info.name).info

    def set_serving_params(self, **knobs: int) -> None:
        """Persist serving-time defaults for this collection — the
        write-back half of the tuning loop: run ``tuning.tune_*`` on a
        query sample, then store the chosen knobs so every subsequent
        ``search``/``search_batch`` (library or HTTP) serves at the tuned
        operating point without each caller re-specifying it, e.g.
        ``coll.set_serving_params(nprobe=t["nprobe"])``.

        Keys are validated against the family's ``SERVING_KNOBS``
        whitelist, values must be positive integers. Explicit kwargs on a
        search call always win over stored values; stored values win over
        the engine's hardcoded fallbacks. Stored in the catalog JSON
        (serving config, not data — the snapshot version chain does NOT
        advance, and a stale-index check never fires off a knob change).
        Engine extension — the reference bakes ef/nprobe into the build
        (index_factory.rs:108-156) with no re-tune path."""
        allowed = SERVING_KNOBS.get(self.info.index_type, ())
        clean: dict[str, int] = {}
        for key, val in knobs.items():
            if key not in allowed:
                raise ValueError(
                    f"unknown serving param {key!r} for index_type "
                    f"{self.info.index_type!r}; expected one of {allowed}"
                )
            if isinstance(val, bool) or not isinstance(val, int):
                raise ValueError(f"serving param {key!r} must be an integer")
            if val < 1:
                raise ValueError(f"serving param {key!r} must be >= 1")
            clean[key] = val
        # A persisted knob must leave the collection serveable: an lsh
        # probe_radius past the mask ceiling would make every knob-less
        # search raise until someone overrides it (round-9 review) —
        # cross-check against the built index's code width up front.
        if (
            "probe_radius" in clean
            and self.info.index_type == "lsh"
            and self._indexed_version() is not None
        ):
            from vector_db_spark.operators.ann import (
                _PROBE_MASK_CAP,
                _probe_mask_count,
            )

            n_bits = int(self._load_index().planes.shape[1])
            if _probe_mask_count(n_bits, clean["probe_radius"]) > _PROBE_MASK_CAP:
                raise ValueError(
                    f"probe_radius={clean['probe_radius']} over "
                    f"n_bits={n_bits} exceeds the {_PROBE_MASK_CAP}-mask "
                    "probe ceiling; the collection could not serve at the "
                    "stored operating point"
                )
        with self.catalog._locked():
            data = self.catalog._load()
            if self.info.name not in data:
                raise KeyError(f"collection {self.info.name!r} not found")
            merged = {**data[self.info.name].get("serving_params", {}), **clean}
            data[self.info.name]["serving_params"] = merged
            self.catalog._save(data)
        self.info.serving_params = merged

    def _apply_serving_defaults(self, params: dict) -> dict:
        """Fill stored serving knobs beneath the caller's explicit
        kwargs (caller > stored > code fallbacks)."""
        for key, val in self.info.serving_params.items():
            params.setdefault(key, val)
        return params

    def _reject_topk_only_knobs(self, params: dict, route: str) -> None:
        """No-silent-drop posture for the multi-vector RANGE routes
        (ADVICE r12): 'shortlist' bounds the exact-rerank stage of top-k
        search, but range scores every probed candidate exactly and has
        no rerank cutoff, so an EXPLICITLY passed shortlist would be
        silently meaningless. Reject it with the contract instead.
        Called BEFORE _apply_serving_defaults on purpose — a PERSISTED
        shortlist (a legitimate top-k operating point set by the tuners)
        is ignored by range, documented here, and must not poison every
        range call against that collection."""
        if self._multi_vector and "shortlist" in params:
            raise ValueError(
                f"'shortlist' is a top-k rerank knob; {route} scores every "
                "probed candidate exactly and has no rerank stage — pass "
                "'nprobe' only (a persisted shortlist operating point is "
                "ignored on range routes)"
            )

    @property
    def _multi_vector(self) -> bool:
        return self.info.index_type in MULTI_VECTOR_INDEX_TYPES

    def _exploded(self, df: DataFrame) -> DataFrame:
        """Doc rows (id, array<array<float>>, …) → the long-format token
        layout the late-interaction operators take: one row per
        (doc, token vector), same column names; any metadata columns ride
        along (doc-level predicates stay filterable on token rows)."""
        iid, vec = self.info.id_col, self.info.vec_col
        others = [c for c in df.columns if c not in (iid, vec)]
        return df.select(
            F.col(iid), F.explode(F.col(vec)).alias(vec), *others
        )

    def _validated(self, df: DataFrame) -> DataFrame:
        """Schema-on-write enforcement (strict divergence from the
        reference's validate-nothing ingest, SURVEY.md §1.3): ids >= 1
        (src/models/request/insert.rs:12-14) and exact declared dim. The
        guards are plan-level raise_error branches — no extra validation
        job, the write itself fails on bad rows. Multi-vector collections
        hold one row per DOCUMENT: >= 1 token vector, every token exactly
        the declared dim."""
        iid, vec = self.info.id_col, self.info.vec_col
        checked_id = F.when(F.col(iid) >= 1, F.col(iid)).otherwise(
            F.raise_error(F.lit(f"{iid} must be >= 1"))
        )
        if self._multi_vector:
            ok = (F.size(F.col(vec)) >= 1) & F.forall(
                F.col(vec), lambda t: F.size(t) == self.info.dim
            )
            checked_vec = F.when(ok, F.col(vec)).otherwise(
                F.raise_error(
                    F.lit(
                        f"{vec} must hold >= 1 token vectors, each with "
                        f"exactly dim={self.info.dim} components"
                    )
                )
            )
            casted = F.transform(
                checked_vec,
                lambda t: F.transform(t, lambda x: x.cast("float")),
            )
        else:
            checked_vec = F.when(
                F.size(F.col(vec)) == self.info.dim, F.col(vec)
            ).otherwise(
                F.raise_error(
                    F.lit(f"{vec} must have exactly dim={self.info.dim} components")
                )
            )
            casted = F.transform(checked_vec, lambda x: x.cast("float"))
        others = [c for c in df.columns if c not in (iid, vec)]
        return df.select(checked_id.alias(iid), casted.alias(vec), *others)

    # -- index lifecycle (≅ create_index + search dispatch,
    #    src/core/index_factory.rs:75-163 +
    #    src/router/handle/search_index_handle.rs:67-94) ------------------

    def _index_root(self) -> str:
        return os.path.join(self.catalog.root, self.info.name)

    def _index_dir(self) -> str:
        """CURRENT index artifact dir, resolved through the publication
        pointer (round 13). Full rebuilds used to OVERWRITE one fixed
        `index/` dir in place, which is safe in-process (per-collection
        dispatch locks) but raced across PROCESSES: the multi-process
        stress gate caught a reader's parquet scan dying mid-read while
        the other process's lazy rebuild deleted the files under it.
        Builds now write a fresh uniquely-named dir and publish it by
        atomically flipping `index_current.json` under the catalog flock
        — a reader resolves either the old complete artifact or the new
        complete artifact, never a half-written one. Incremental refresh
        (append/delete segments, tombstones, radii caches) still mutates
        the CURRENT dir: those writes are file-ADDITIVE. Superseded dirs
        are left for a future GC (same retention posture as data version
        dirs)."""
        ptr = os.path.join(self._index_root(), "index_current.json")
        if os.path.exists(ptr):
            try:
                with open(ptr) as f:
                    return os.path.join(self._index_root(), json.load(f)["dir"])
            except (json.JSONDecodeError, KeyError, OSError):
                pass  # torn/legacy pointer: fall through to the fixed dir
        return os.path.join(self._index_root(), "index")

    # Builders drop this marker in their staging dir at creation and
    # _publish_index removes it under the catalog flock at the pointer
    # flip (or rmtree's it with a discarded dir). GC honors a fresh
    # marker unconditionally — version arithmetic alone cannot protect a
    # build whose snapshot was superseded MID-build (its staging dir is
    # then named with a version strictly below current, which the old
    # strict '< cur' test would have collected while idx.save was still
    # running — ADVICE r13). A marker older than the stale threshold is
    # a crashed builder's leftover and becomes collectable again.
    _BUILDING_MARKER = ".building"
    _BUILDING_STALE_SECONDS = 3600.0

    def gc_index_artifacts(self) -> list[str]:
        """Explicit retention maintenance for superseded index artifacts
        (the immutable-publish flip leaves them on disk — same posture
        as data version dirs). Deletes every index dir no NEW reader can
        resolve: built version strictly older than the published one, OR
        same version but not the pointer target (a param-retune rebuild
        publishes a new uuid-suffixed dir at an UNCHANGED collection
        version; the superseded twin would otherwise fail a strict
        '< cur' test forever — ADVICE r13). In-flight builds are
        protected by the `.building` marker their builder wrote at
        staging-dir creation (removed under the same flock this scan
        holds, so there is no unmarked-but-unpublished window), not by
        version arithmetic — a builder superseded mid-build carries a
        version BELOW current and only the marker saves it. A reader
        that loaded a superseded artifact BEFORE the flip and is still
        mid-query can still lose files, which is why this is an explicit
        maintenance call (the vacuum contract), not an automatic
        post-publish step. Returns the removed paths."""
        import re
        import shutil
        import time

        with self.catalog._locked():
            cur_version = self._indexed_version()
            if cur_version is None:
                return []
            cur_dir = os.path.realpath(self._index_dir())
            now = time.time()
            removed = []
            for name in os.listdir(self._index_root()):
                full = os.path.join(self._index_root(), name)
                if not os.path.isdir(full) or os.path.realpath(full) == cur_dir:
                    continue
                m = re.match(r"index_v(\d+)_", name)
                if m is not None:
                    if int(m.group(1)) > cur_version:
                        continue  # build from a newer snapshot — never touch
                elif name != "index":
                    continue  # data version dirs etc.
                marker = os.path.join(full, self._BUILDING_MARKER)
                try:
                    age = now - os.path.getmtime(marker)
                except OSError:
                    age = None  # no marker: published-then-superseded dir
                if age is not None and age < self._BUILDING_STALE_SECONDS:
                    continue  # build in flight — the documented invariant
                # legacy fixed `index` dir predates pointers: superseded
                # by definition once a pointer exists and targets elsewhere
                shutil.rmtree(full, ignore_errors=True)
                removed.append(full)
            return removed

    def _publish_index(self, built_dir: str, version: int) -> bool:
        """Atomically flip the index pointer to a fully-written artifact
        dir. Under the catalog flock so two concurrent builders serialize;
        a builder that lost the race to a NEWER snapshot's build discards
        its dir instead of moving the pointer backwards. Returns whether
        the artifact was actually published — callers must not persist
        build/serving params for a discarded build (ADVICE r13). The
        `.building` marker is cleared inside the same locked section as
        the flip, so GC (same flock) never observes a published dir that
        still looks in-flight nor an unpublished dir without protection."""
        import contextlib
        import shutil

        ptr = os.path.join(self._index_root(), "index_current.json")
        with self.catalog._locked():
            cur = self._indexed_version()
            if cur is not None and cur > version:
                shutil.rmtree(built_dir, ignore_errors=True)
                return False
            tmp = f"{ptr}.tmp.{os.getpid()}"
            with open(tmp, "w") as f:
                json.dump({"dir": os.path.basename(built_dir)}, f)
            os.replace(tmp, ptr)
            with contextlib.suppress(OSError):
                os.remove(os.path.join(built_dir, self._BUILDING_MARKER))
            return True

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
        if self.info.index_type == "exact":
            return
        # fresh uniquely-named dir; published via _publish_index below —
        # never overwrite an artifact a concurrent process may be reading
        import uuid

        path = os.path.join(
            self._index_root(),
            f"index_v{self.info.version:06d}_{uuid.uuid4().hex[:8]}",
        )
        # In-flight marker BEFORE any build work: GC honors it, so a
        # build whose snapshot gets superseded mid-build (its version
        # then sorts below the published pointer) cannot be rmtree'd
        # under idx.save; _publish_index clears it at the flip.
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, self._BUILDING_MARKER), "w") as f:
            json.dump({"pid": os.getpid()}, f)

        def _touch_building() -> None:
            # Refresh the marker between long build stages so a build
            # outliving _BUILDING_STALE_SECONDS keeps GC protection
            # (ADVICE r14: the mtime was written once at staging-dir
            # creation, so an hour-long fit lost its shield mid-save).
            # Also resurrects dir+marker if a concurrent GC on another
            # host raced an extreme stall — save() then still lands.
            marker = os.path.join(path, self._BUILDING_MARKER)
            os.makedirs(path, exist_ok=True)
            try:
                os.utime(marker, None)
            except OSError:
                with open(marker, "w") as f:
                    json.dump({"pid": os.getpid()}, f)

        if self.info.index_type == "ivf":
            from vector_db_spark.operators.ann import IvfIndex

            idx = IvfIndex.build(
                cur,
                id_col=self.info.id_col,
                vec_col=self.info.vec_col,
                metric=self.info.metric,
                **params,
            )
            _touch_building()
            idx.save(path)
        elif self.info.index_type == "graph":
            from vector_db_spark.operators.graph import GraphAnnIndex

            idx = GraphAnnIndex.build(
                cur,
                id_col=self.info.id_col,
                vec_col=self.info.vec_col,
                metric=self.info.metric,
                **params,
            )
            _touch_building()
            idx.save(path)
        elif self.info.index_type == "ivfpq":
            from vector_db_spark.operators.ivfpq import IvfPqIndex

            if self.info.metric != "l2":
                raise ValueError("ivfpq index supports only the l2 metric")
            idx = IvfPqIndex.build(
                cur,
                id_col=self.info.id_col,
                vec_col=self.info.vec_col,
                **params,
            )
            _touch_building()
            idx.save(path)
        elif self.info.index_type == "ivfsq":
            from vector_db_spark.operators.ivfsq import IvfSqIndex

            if self.info.metric != "l2":
                raise ValueError("ivfsq index supports only the l2 metric")
            idx = IvfSqIndex.build(
                cur,
                id_col=self.info.id_col,
                vec_col=self.info.vec_col,
                **params,
            )
            _touch_building()
            idx.save(path)
        elif self.info.index_type == "ivfopq":
            from vector_db_spark.operators.opq import IvfOpqIndex

            if self.info.metric != "l2":
                raise ValueError("ivfopq index supports only the l2 metric")
            idx = IvfOpqIndex.build(
                cur,
                id_col=self.info.id_col,
                vec_col=self.info.vec_col,
                **params,
            )
            _touch_building()
            idx.save(path)
        elif self.info.index_type in MULTI_VECTOR_INDEX_TYPES:
            # PLAID token-IVF over the exploded (doc, token) rows — the
            # one-factory parity item (index_factory.rs:75-163): the
            # multi-vector families dispatch through the same catalog
            # build as every single-vector backend.
            from vector_db_spark.operators.late_interaction import (
                MaxSimIvfIndex,
                MaxSimPqIndex,
            )

            cls = (
                MaxSimIvfIndex
                if self.info.index_type == "maxsim"
                else MaxSimPqIndex
            )
            built = cls.build(
                self._exploded(cur),
                doc_col=self.info.id_col,
                vec_col=self.info.vec_col,
                **params,
            )
            _touch_building()
            built.save(path)
            # Record the EFFECTIVE nlist, not just the caller's kwargs: the
            # API's exact-MaxSim serving contract derives its full-probe
            # default from the recorded value, and a no-arg build (class
            # default nlist) would otherwise record nothing and silently
            # serve at the wire's static nprobe (round-10 review of the
            # ADVICE fix).
            params = {**params, "nlist": len(built.ivf.centroids)}
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
            _touch_building()
            idx.save(path)
        with open(os.path.join(path, "indexed_version.json"), "w") as f:
            json.dump({"version": self.info.version}, f)
        if not self._publish_index(path, self.info.version):
            # Lost the race to a newer snapshot's build: the artifact was
            # discarded, so persisting ITS params would misdescribe the
            # artifact actually serving (ADVICE r13). Tell the caller.
            import warnings

            warnings.warn(
                f"build_index({self.info.name}): build at version "
                f"{self.info.version} was superseded by a newer published "
                "index before publish; artifact discarded, build params "
                "not persisted",
                stacklevel=2,
            )
            return
        self._remember_build_params(params)
        self._revalidate_serving_params()

    def _revalidate_serving_params(self) -> None:
        """A rebuild can change index geometry under persisted serving
        knobs: an lsh rebuild with more code bits can strand a stored
        probe_radius past the probe-mask ceiling, turning every knob-less
        search into an error until someone overrides it (ADVICE r9).
        Drop the now-unserveable knob with a warning — the collection
        keeps serving at the family default, and the tuning loop can
        re-tune against the new geometry."""
        if self.info.index_type != "lsh":
            return
        radius = self.info.serving_params.get("probe_radius")
        if radius is None:
            return
        from vector_db_spark.operators.ann import (
            _PROBE_MASK_CAP,
            _probe_mask_count,
        )

        n_bits = int(self._load_index().planes.shape[1])
        if _probe_mask_count(n_bits, radius) <= _PROBE_MASK_CAP:
            return
        import warnings

        warnings.warn(
            f"dropping persisted probe_radius={radius}: the rebuilt index's "
            f"n_bits={n_bits} puts it past the {_PROBE_MASK_CAP}-mask probe "
            "ceiling; re-tune serving params for the new geometry",
            stacklevel=2,
        )
        with self.catalog._locked():
            data = self.catalog._load()
            if self.info.name in data:
                sp = dict(data[self.info.name].get("serving_params", {}))
                sp.pop("probe_radius", None)
                data[self.info.name]["serving_params"] = sp
                self.catalog._save(data)
        self.info.serving_params.pop("probe_radius", None)

    def _remember_build_params(self, params: dict) -> None:
        """Persist the build knobs that produced the current artifact (≅
        the reference's IndexKey carrying its config,
        index_factory.rs:24-36) so ``refresh_index()`` can rebuild with
        no arguments. Entries that don't round-trip JSON (e.g. a shared
        quantizer object) are skipped — they can't outlive the process
        anyway — but their KEYS are recorded (``build_params_dropped``)
        and warned about, so a later no-arg ``refresh_index()`` is
        visibly not a faithful replay (it would retrain what the
        original build shared) rather than silently rebuilding with
        different cell assignments (ADVICE r9)."""
        clean, dropped = {}, []
        for key, val in params.items():
            try:
                json.dumps(val)
            except (TypeError, ValueError):
                dropped.append(key)
                continue
            clean[key] = val
        if dropped:
            import warnings

            warnings.warn(
                f"build params {dropped} are not JSON-serializable and were "
                "not recorded; a no-arg refresh_index() will rebuild "
                "WITHOUT them (e.g. a shared quantizer is retrained)",
                stacklevel=3,
            )
        with self.catalog._locked():
            data = self.catalog._load()
            if self.info.name in data:
                data[self.info.name]["build_params"] = clean
                data[self.info.name]["build_params_dropped"] = dropped
                self.catalog._save(data)
        self.info.build_params = clean
        self.info.build_params_dropped = dropped

    def refresh_index(self, **params) -> str:
        """INCREMENTAL index maintenance: apply the collection's snapshot
        delta since the indexed version through the index's own
        append/tombstone lifecycle instead of a full rebuild — new ids
        append (frozen quantizers/planes/codebooks; the graph family
        rebuilds only its affected cells), removed ids tombstone.

        Returns what happened: 'fresh' (nothing to do), 'incremental'
        (delta applied), or 'rebuilt'. A rebuild still occurs when (a) no
        index exists yet, or (b) the delta contains CHANGED rows —
        re-appending a tombstoned id would leave BOTH physical copies
        dead until compaction (tombstones.py contract), so in-place value
        updates cannot go the delete+append route; embedding corpora are
        append/retire-heavy, which is the case this accelerates.

        The snapshot CDC (``diff``) is co-partitioned by construction;
        the appended rows come from one semi-join against the live
        snapshot. After the delta applies, the artifact records the new
        version — search() serves it immediately.

        Called with NO arguments, any rebuild reuses the build knobs
        recorded by the last ``build_index`` (≅ the reference's IndexKey
        carrying its config) — a maintenance cron never needs to know
        how the index was configured. Explicit kwargs that DIFFER from
        the recorded knobs are a reconfiguration request and force a
        full rebuild with them (which records them) — the incremental
        path appends into the EXISTING geometry and cannot apply new
        knobs, so quietly returning 'incremental' would leave the caller
        believing the index was reconfigured when nothing changed
        (round-10 review)."""
        if self.info.index_type == "exact":
            return "fresh"
        partial_replay = False
        reconfigure = bool(params) and params != self.info.build_params
        if not params:
            params = dict(self.info.build_params)
            partial_replay = bool(self.info.build_params_dropped)

        def _warn_partial() -> None:
            # warn ONLY when a rebuild actually happens — a nightly cron
            # whose refreshes come back 'fresh'/'incremental' must not be
            # trained to ignore the one warning that matters (round-10
            # review of the ADVICE fix)
            if partial_replay:
                import warnings

                warnings.warn(
                    "refresh_index() rebuild replays only the recorded "
                    f"build params; {self.info.build_params_dropped} were "
                    "not JSON-serializable at build time and are NOT "
                    "replayed (the rebuild retrains them from scratch)",
                    stacklevel=3,
                )

        iv = self._indexed_version()
        if iv is None or reconfigure:
            _warn_partial()
            self.build_index(**params)
            return "rebuilt"
        # re-read catalog state: another handle may have mutated
        self.info = self.catalog.get(self.info.name).info
        if iv == self.info.version:
            return "fresh"
        changes = self.diff(iv).cache()
        try:
            n_changed = changes.filter(F.col("change") == "changed").count()
            if n_changed > 0:
                _warn_partial()
                self.build_index(**params)
                return "rebuilt"
            added_ids = changes.filter(F.col("change") == "added").select(
                self.info.id_col
            )
            removed_ids = changes.filter(F.col("change") == "removed").select(
                self.info.id_col
            )
            path = self._index_dir()
            idx = self._load_index()
            # A delete at refresh N followed by a re-insert of the SAME id
            # shows up here only as 'added' — but the id is still in the
            # persisted tombstone manifest, so an append would leave the
            # new physical copy dead behind the tombstone until compaction
            # (tombstones.py contract) and search() would silently omit a
            # live id.  Resurrected ids therefore force the same full
            # rebuild as 'changed' rows (ADVICE r4).
            tomb = getattr(idx, "tombstones", None)
            if tomb is not None:
                from vector_db_spark.operators.tombstones import DEL_COL

                resurrected = added_ids.join(
                    F.broadcast(tomb),
                    added_ids[self.info.id_col] == tomb[DEL_COL],
                    "left_semi",
                )
                if resurrected.head(1):
                    _warn_partial()
                    self.build_index(**params)
                    return "rebuilt"
            if removed_ids.head(1):
                idx.delete(removed_ids, path=path)
            new_rows = self.scan().join(added_ids, self.info.id_col, "left_semi")
            if self._multi_vector:
                # the index lifecycle runs on long-format token rows
                new_rows = self._exploded(new_rows)
            if new_rows.head(1):
                idx.append(new_rows, path=path)
            # atomic replace: a plain open('w') truncates first, and a
            # concurrent reader's _indexed_version() could see empty JSON
            vp = os.path.join(path, "indexed_version.json")
            tmp = f"{vp}.tmp.{os.getpid()}"
            with open(tmp, "w") as f:
                json.dump({"version": self.info.version}, f)
            os.replace(tmp, vp)
            return "incremental"
        finally:
            changes.unpersist()

    def _load_index(self):
        """The persisted artifact as its family object (load dispatch)."""
        path = self._index_dir()
        t = self.info.index_type
        if t == "ivf":
            from vector_db_spark.operators.ann import IvfIndex

            return IvfIndex.load(self.catalog.spark, path)
        if t == "graph":
            from vector_db_spark.operators.graph import GraphAnnIndex

            return GraphAnnIndex.load(self.catalog.spark, path)
        if t == "ivfpq":
            from vector_db_spark.operators.ivfpq import IvfPqIndex

            return IvfPqIndex.load(self.catalog.spark, path)
        if t == "ivfsq":
            from vector_db_spark.operators.ivfsq import IvfSqIndex

            return IvfSqIndex.load(self.catalog.spark, path)
        if t == "ivfopq":
            from vector_db_spark.operators.opq import IvfOpqIndex

            return IvfOpqIndex.load(self.catalog.spark, path)
        if t == "maxsim":
            from vector_db_spark.operators.late_interaction import MaxSimIvfIndex

            return MaxSimIvfIndex.load(self.catalog.spark, path)
        if t == "maxsim_pq":
            from vector_db_spark.operators.late_interaction import MaxSimPqIndex

            return MaxSimPqIndex.load(self.catalog.spark, path)
        from vector_db_spark.operators.ann import CosineLshIndex

        return CosineLshIndex.load(self.catalog.spark, path)

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
        params = self._apply_serving_defaults(params)
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
        if self._multi_vector:
            # `query` is the request's own token SET (list of vectors) —
            # the late-interaction query shape. Results share the ip
            # families' (id, score) column convention.
            params.setdefault("score_col", "score")
            return self._load_index().search(
                query, k, predicate=predicate, **params
            )
        if self.info.index_type == "ivf":
            from vector_db_spark.operators.ann import IvfIndex

            idx = IvfIndex.load(self.catalog.spark, self._index_dir())
            return idx.search(query, k, predicate=predicate, **params)
        if self.info.index_type == "graph":
            from vector_db_spark.operators.graph import GraphAnnIndex

            gidx = GraphAnnIndex.load(self.catalog.spark, self._index_dir())
            return gidx.search(query, k, predicate=predicate, **params)
        if self.info.index_type == "ivfpq":
            from vector_db_spark.operators.ivfpq import IvfPqIndex

            pidx = IvfPqIndex.load(self.catalog.spark, self._index_dir())
            return pidx.search(query, k, predicate=predicate, **params)
        if self.info.index_type == "ivfsq":
            from vector_db_spark.operators.ivfsq import IvfSqIndex

            sidx = IvfSqIndex.load(self.catalog.spark, self._index_dir())
            # exact final distances come from the collection's raw
            # vectors (the codes layout deliberately drops them)
            return sidx.search(query, k, predicate=predicate, rerank=cur, **params)
        if self.info.index_type == "ivfopq":
            from vector_db_spark.operators.opq import IvfOpqIndex

            oidx = IvfOpqIndex.load(self.catalog.spark, self._index_dir())
            # shortlist rerank against the collection's RAW vectors with
            # the unrotated query (the stored copies are rotated)
            params.setdefault("shortlist", 4 * k)
            return oidx.search(query, k, predicate=predicate, rerank=cur, **params)
        from vector_db_spark.operators.ann import CosineLshIndex

        idx = CosineLshIndex.load(self.catalog.spark, self._index_dir())
        return idx.search(query, k, predicate=predicate, **params)

    def range_search(
        self, query, threshold, predicate: Column | None = None, **params
    ):
        """All rows within a metric threshold (faiss ``range_search``
        semantics: l2 keeps squared-L2 <= t, ip/cosine keep score >= t),
        routed by index_type — the range twin of search().

        Coverage by family: exact and IVF are value-exact (full scan /
        lossless triangle-inequality cell pruning); graph and lsh apply
        their beam/multiprobe coverage with exact per-candidate verify
        (serving knobs honored as in search()). The compressed-code
        families (ivfpq/ivfsq/ivfopq) are ALSO value-exact: quantized
        distances cannot bound true distances losslessly, so the codes
        never filter — but their layouts ARE cell-partitioned by an L2
        coarse quantizer, and the same triangle-inequality cell pruning
        IvfIndex.range_search uses applies over the coarse centroids +
        persisted cell radii, with every survivor verified from RAW
        vectors (VERDICT r11 #4: O(surviving cells), not O(corpus)).
        A stale or absent compressed index falls back to the unpruned
        raw scan — the family keeps its always-fresh range contract
        instead of search()'s staleness error; index-backed families
        (ivf/graph/lsh) keep the staleness contract."""
        from vector_db_spark.operators.knn import range_search as exact_range

        cur = self.scan()
        if cur is None:
            raise ValueError("collection is empty")
        self._reject_topk_only_knobs(params, "range_search")
        params = self._apply_serving_defaults(params)
        kind = self.info.index_type
        if self._multi_vector:
            # `query` is the request's token SET (the late-interaction
            # query shape); threshold is a score FLOOR (MaxSim is an
            # ip-family sum of dots). A fresh index serves the probed
            # range (exact rows, coverage set by nprobe — the graph/lsh
            # contract); stale or absent index falls back to the exact
            # scan over the collection's own token rows, keeping the
            # compressed families' always-fresh range precedent (range
            # never REQUIRES an index; exact is a superset of any probe).
            from vector_db_spark.operators.late_interaction import (
                maxsim_range_search,
            )

            iv = self._indexed_version()
            if iv is not None and iv == self.info.version:
                msp = {k: v for k, v in params.items() if k == "nprobe"}
                return self._load_index().range_search(
                    query,
                    threshold,
                    predicate=predicate,
                    score_col="score",
                    **msp,
                )
            return maxsim_range_search(
                self._exploded(cur),
                query,
                threshold,
                doc_col=self.info.id_col,
                vec_col=self.info.vec_col,
                predicate=predicate,
                score_col="score",
            )
        allowed = {
            "graph": ("nprobe", "ef_search"),
            "lsh": ("probe_radius",),
        }.get(kind, ())
        params = {k: v for k, v in params.items() if k in allowed}
        if kind in ("exact", "ivfpq", "ivfsq", "ivfopq"):
            cands = cur
            if kind != "exact":
                pruned = self._coarse_range_candidates(
                    kind, cur, [list(query)], threshold
                )
                if pruned is not None:
                    cands = pruned
            return exact_range(
                cands,
                query,
                threshold,
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
        if kind == "ivf":
            from vector_db_spark.operators.ann import IvfIndex

            idx = IvfIndex.load(self.catalog.spark, self._index_dir())
            return idx.range_search(query, threshold, predicate=predicate)
        if kind == "graph":
            from vector_db_spark.operators.graph import GraphAnnIndex

            gidx = GraphAnnIndex.load(self.catalog.spark, self._index_dir())
            return gidx.range_search(
                query, threshold, predicate=predicate, **params
            )
        from vector_db_spark.operators.ann import CosineLshIndex

        lidx = CosineLshIndex.load(self.catalog.spark, self._index_dir())
        return lidx.range_search(
            query,
            threshold,
            metric=self.info.metric,
            predicate=predicate,
            **params,
        )

    def range_search_batch(
        self,
        queries,
        threshold,
        predicate: Column | None = None,
        query_id_col: str = "query_id",
        query_vec_col: str = "query_vec",
        **params,
    ):
        """Batch range search (a DataFrame of (query_id, query_vec) rows)
        routed by index_type — every family's set-oriented range probe
        through one catalog call (VERDICT r11 #3; faiss ``range_search``
        is natively batched). 'exact' runs the broadcast/GEMM batched
        scan; ivf/graph/lsh dispatch to their own range_search_batch
        (staleness contract as search_batch); the compressed families
        prune the union of every query's surviving coarse cells and
        verify from raw vectors (stale/absent index → unpruned scan,
        the always-fresh contract). Returns (query_id, id,
        distance|score) ordered by (query_id, metric, id)."""
        from vector_db_spark.operators.knn import batch_range_search

        cur = self.scan()
        if cur is None:
            raise ValueError("collection is empty")
        self._reject_topk_only_knobs(params, "range_search_batch")
        params = self._apply_serving_defaults(params)
        kind = self.info.index_type
        if self._multi_vector:
            # `queries` is the long-format multi-token frame
            # (query_id, token_id, token_vec) — the search_batch shape;
            # same fresh-index-probed / stale-or-absent-exact routing as
            # the single-query multi-vector range arm.
            from vector_db_spark.operators.late_interaction import (
                maxsim_range_search_batch,
            )

            iv = self._indexed_version()
            if iv is not None and iv == self.info.version:
                msp = {k: v for k, v in params.items() if k == "nprobe"}
                return self._load_index().range_search_batch(
                    queries,
                    threshold,
                    predicate=predicate,
                    query_id_col=query_id_col,
                    score_col="score",
                    **msp,
                )
            return maxsim_range_search_batch(
                self._exploded(cur),
                queries,
                threshold,
                doc_col=self.info.id_col,
                vec_col=self.info.vec_col,
                predicate=predicate,
                query_id_col=query_id_col,
                score_col="score",
            )
        allowed = {
            "graph": ("nprobe", "ef_search"),
            "lsh": ("probe_radius",),
        }.get(kind, ())
        params = {k: v for k, v in params.items() if k in allowed}
        if kind in ("exact", "ivfpq", "ivfsq", "ivfopq"):
            cands = cur
            if kind != "exact":
                # one query-side job: the rows collected for the cell math
                # re-wrap as a local relation for the verify stage (the
                # IvfIndex.range_search_batch contract, VERDICT r11 #7)
                qproj = queries.select(query_id_col, query_vec_col)
                qrows = qproj.collect()
                if not qrows:
                    raise ValueError("queries must be non-empty")
                queries = self.catalog.spark.createDataFrame(qrows, qproj.schema)
                qvecs = [[float(x) for x in r[1]] for r in qrows]
                pruned = self._coarse_range_candidates(
                    kind, cur, qvecs, threshold
                )
                if pruned is not None:
                    cands = pruned
            return batch_range_search(
                cands,
                queries,
                threshold,
                metric=self.info.metric,
                id_col=self.info.id_col,
                vec_col=self.info.vec_col,
                query_id_col=query_id_col,
                query_vec_col=query_vec_col,
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
        path = self._index_dir()
        if kind == "ivf":
            from vector_db_spark.operators.ann import IvfIndex

            return IvfIndex.load(self.catalog.spark, path).range_search_batch(
                queries, threshold, predicate=predicate,
                query_id_col=query_id_col, query_vec_col=query_vec_col,
            )
        if kind == "graph":
            from vector_db_spark.operators.graph import GraphAnnIndex

            return GraphAnnIndex.load(
                self.catalog.spark, path
            ).range_search_batch(
                queries, threshold, predicate=predicate,
                query_id_col=query_id_col, query_vec_col=query_vec_col,
                **params,
            )
        from vector_db_spark.operators.ann import CosineLshIndex

        return CosineLshIndex.load(self.catalog.spark, path).range_search_batch(
            queries, threshold, metric=self.info.metric, predicate=predicate,
            query_id_col=query_id_col, query_vec_col=query_vec_col,
            **params,
        )

    def _coarse_range_candidates(
        self, kind, cur, qvecs, threshold
    ) -> "DataFrame | None":
        """Candidate rows for a compressed-family range search: the rows
        of the coarse cells the triangle inequality cannot rule out for
        ANY of the given raw queries, in RAW vector space — or ``None``
        when the index is stale/absent (caller falls back to the
        unpruned scan; range on these families never REQUIRES an index).

        The compressed layouts are l2-only (build_index enforces it), so
        the pruning algebra is IvfIndex.range_search's: a match within
        squared-L2 ``threshold`` of query q lies in a cell whose centroid
        is within sqrt(threshold) + r_cell of q. For ivfopq the coarse
        quantizer lives in ROTATED space; the rotation is orthonormal, so
        pruning runs on the rotated query with identical radii algebra.

        Verification source per family: ivfpq's codes layout retains the
        raw vector column, so its pruned partitions ARE the candidate
        frame (scan cost O(surviving cells)); ivfsq drops raw vectors and
        ivfopq stores rotated copies (exactness demands the original
        floats' fold), so their pruned partitions contribute only the
        surviving ID SET, joined back to the collection scan — compute
        drops to O(survivors) while the raw side stays one scan."""
        import numpy as np

        iv = self._indexed_version()
        if iv is None or iv != self.info.version:
            return None
        from vector_db_spark.operators.ann import _CLUSTER_COL

        idx = self._load_index()
        if kind == "ivfopq":
            inner = idx.ivfpq
            cents = np.asarray(idx.ivf.centroids, dtype=np.float64)
            rot = np.asarray(idx.rotation, dtype=np.float64)
            qmat = np.asarray(qvecs, dtype=np.float64) @ rot.T
        else:
            inner = idx
            cents = np.asarray(idx.ivf.centroids, dtype=np.float64)
            qmat = np.asarray(qvecs, dtype=np.float64)
        radii = np.asarray(self._ensure_range_radii(kind, idx), dtype=np.float64)
        radius = float(np.sqrt(max(float(threshold), 0.0)))
        cells: set[int] = set()
        for q in qmat:
            center_d = np.sqrt(((cents - q) ** 2).sum(axis=1))
            cells.update(np.nonzero(center_d - radii <= radius)[0].tolist())
        self._last_range_cells = (len(cells), len(cents))  # pruning probe
        if kind != "ivfpq" and len(cells) >= len(cents):
            # every cell survived (very wide radius): the id-join would
            # semi-join the raw scan against ALL ids — pure overhead over
            # the plain scan the caller falls back to. ivfpq keeps its
            # branch either way (its pruned frame IS the layout; an
            # all-cells filter is a no-op partition filter, not a join).
            return None
        base = inner._live().filter(F.col(_CLUSTER_COL).isin(sorted(cells)))
        if kind == "ivfpq":
            return base.drop(_CLUSTER_COL, "pq_codes")
        ids = base.select(self.info.id_col)
        return cur.join(ids, on=self.info.id_col, how="inner")

    def _ensure_range_radii(self, kind, idx) -> list[float]:
        """Per-coarse-cell covering radius max ‖x − c_cell‖ for the
        compressed families, persisted as ``range_radii.json`` keyed by
        the indexed version (staleness auto-invalidates; rebuild_index
        writes a new indexed_version so stale radii can never prune a
        fresh layout). One grouped aggregate at first range_search, nlist
        floats forever after — the same lazy contract as
        IvfIndex.ensure_cell_radii, which computes the ivfpq/ivfopq case
        directly from their layouts (both retain a vector column in
        quantizer space); ivfsq's codes layout drops vectors, so its
        one-time computation joins (id, cell) back to the collection
        scan."""
        path = os.path.join(self._index_dir(), "range_radii.json")
        iv = self._indexed_version()
        if os.path.exists(path):
            with open(path) as f:
                data = json.load(f)
            if data.get("version") == iv:
                return data["radii"]
        if kind == "ivfsq":
            from vector_db_spark.operators.ann import (
                _CLUSTER_COL,
                _dist_to_own_centroid_arrow,
            )

            assigned = self.scan().join(
                idx.encoded.select(self.info.id_col, _CLUSTER_COL),
                on=self.info.id_col,
            )
            own_d = _dist_to_own_centroid_arrow(
                assigned,
                self.info.vec_col,
                idx.ivf.centroids,
                "l2",
                None,
            )
            per_cell = (
                own_d.groupBy(_CLUSTER_COL)
                .agg(F.max("__d").alias("__r"))
                .collect()
            )
            radii = [0.0] * len(idx.ivf.centroids)
            for r in per_cell:
                radii[r[_CLUSTER_COL]] = float(r["__r"])
        else:
            # ivfpq: raw vectors ride in the layout; ivfopq: rotated
            # vectors vs rotated centroids — consistent quantizer space
            inner = idx.ivfpq if kind == "ivfopq" else idx
            radii = inner.ivf.ensure_cell_radii()
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"version": iv, "radii": radii}, f)
        os.replace(tmp, path)
        return radii

    def search_batch(
        self,
        queries,
        k: int,
        predicate: Column | None = None,
        **params,
    ):
        """Batch top-k (a DataFrame of (query_id, query_vec) rows) routed
        by index_type — every family's set-oriented probe through one
        catalog call, same staleness contract as search(). 'exact' runs
        the broadcast batch kNN; compressed families rerank against the
        collection's raw vectors."""
        from vector_db_spark.operators.knn import batch_knn

        cur = self.scan()
        if cur is None:
            raise ValueError("collection is empty")
        params = self._apply_serving_defaults(params)
        if self.info.index_type == "exact":
            return batch_knn(
                cur,
                queries,
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
        path = self._index_dir()
        if self._multi_vector:
            # `queries` is the long-format multi-token frame
            # (query_id, token_id, token_vec) — maxsim_search_batch shape.
            params.setdefault("score_col", "score")
            return self._load_index().search_batch(
                queries, k, predicate=predicate, **params
            )
        if self.info.index_type == "ivf":
            from vector_db_spark.operators.ann import IvfIndex

            return IvfIndex.load(self.catalog.spark, path).search_batch(
                queries, k, predicate=predicate, **params
            )
        if self.info.index_type == "graph":
            from vector_db_spark.operators.graph import GraphAnnIndex

            return GraphAnnIndex.load(self.catalog.spark, path).search_batch(
                queries, k, predicate=predicate, **params
            )
        if self.info.index_type == "ivfpq":
            from vector_db_spark.operators.ivfpq import IvfPqIndex

            return IvfPqIndex.load(self.catalog.spark, path).search_batch(
                queries, k, predicate=predicate, **params
            )
        if self.info.index_type == "ivfsq":
            from vector_db_spark.operators.ivfsq import IvfSqIndex

            return IvfSqIndex.load(self.catalog.spark, path).search_batch(
                queries, k, predicate=predicate, rerank=cur, **params
            )
        if self.info.index_type == "ivfopq":
            from vector_db_spark.operators.opq import IvfOpqIndex

            params.setdefault("shortlist", 4 * k)
            return IvfOpqIndex.load(self.catalog.spark, path).search_batch(
                queries, k, predicate=predicate, rerank=cur, **params
            )
        from vector_db_spark.operators.ann import CosineLshIndex

        return CosineLshIndex.load(self.catalog.spark, path).search_batch(
            queries, k, predicate=predicate, **params
        )


class DocumentStore(_BucketedStore):
    """Schemaless per-id JSON document store ≅ the reference's scalar
    storage (src/db/scalar_storage.rs:10-14: an arbitrary
    ``serde_json::Value`` per id, no declared columns).

    This is the deliberate inverse of ``Collection``'s schema-on-write
    (SURVEY.md §2.2 item 9): the payload is ONE opaque JSON string column
    (``doc``); structure is imposed at READ time — ``extract()`` projects
    JSON paths as typed columns (``get_json_object``, codegen'd JVM-side),
    ``typed()`` applies a full ``from_json`` schema. Malformed JSON is not
    rejected at write (the reference's handler receives pre-parsed JSON, so
    bad payloads 400 at the wire; here they surface as NULLs on read —
    documented schema-on-read semantics).

    Storage/versioning/DML are the same bucketed copy-on-write engine as
    ``Collection`` — a 1-doc put rewrites one bucket, point lookups read
    one bucket — with a flock-guarded meta file in place of the catalog.
    """

    ID_COL = "id"
    DOC_COL = "doc"

    def __init__(self, spark: SparkSession, root: str, n_buckets: int = 16):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._meta_path = os.path.join(root, "_docstore.json")
        self._lock_path = os.path.join(root, "_docstore.lock")
        if not os.path.exists(self._meta_path):
            with self._locked():
                if not os.path.exists(self._meta_path):
                    self._write_meta({"version": 0, "n_buckets": n_buckets})
        self._meta = self._read_meta()

    @contextmanager
    def _locked(self):
        with open(self._lock_path, "w") as lf:
            fcntl.flock(lf, fcntl.LOCK_EX)
            try:
                yield
            finally:
                fcntl.flock(lf, fcntl.LOCK_UN)

    def _read_meta(self) -> dict:
        with open(self._meta_path) as f:
            return json.load(f)

    def _write_meta(self, meta: dict) -> None:
        tmp = self._meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self._meta_path)

    # _BucketedStore accessors ---------------------------------------------
    @property
    def _store_spark(self) -> SparkSession:
        return self.spark

    @property
    def _store_dir(self) -> str:
        return self.root

    @property
    def _store_id_col(self) -> str:
        return self.ID_COL

    @property
    def _store_n_buckets(self) -> int:
        return int(self._meta["n_buckets"])

    @property
    def _store_version(self) -> int:
        return int(self._meta["version"])

    def _publish_version(self, version: int) -> None:
        with self._locked():
            meta = self._read_meta()
            meta["version"] = version
            self._write_meta(meta)
        self._meta = meta

    def _store_mutation_lock_path(self) -> str:
        return os.path.join(self.root, "_docstore.mutlock")

    def _refresh_store_state(self) -> None:
        self._meta = self._read_meta()

    def _validated(self, df: DataFrame) -> DataFrame:
        """ids >= 1 (shared with Collection, src/models/request/insert.rs:
        12-14); the doc itself is intentionally unvalidated (schemaless)."""
        if set(df.columns) != {self.ID_COL, self.DOC_COL}:
            raise ValueError(
                f"document frame must have exactly columns "
                f"({self.ID_COL!r}, {self.DOC_COL!r}), got {sorted(df.columns)}"
            )
        checked_id = F.when(F.col(self.ID_COL) >= 1, F.col(self.ID_COL)).otherwise(
            F.raise_error(F.lit(f"{self.ID_COL} must be >= 1"))
        )
        return df.select(
            checked_id.cast("long").alias(self.ID_COL),
            F.col(self.DOC_COL).cast("string").alias(self.DOC_COL),
        )

    # schemaless surface ---------------------------------------------------
    def put(self, df: DataFrame) -> None:
        """MERGE a (id, doc) frame — the reference's scalar-doc overwrite
        semantics (src/db/vector_database.rs:76-79: upsert replaces the
        whole document)."""
        self.upsert(df)

    def extract(self, **paths: str) -> DataFrame:
        """Project JSON paths as string columns: ``extract(k="$.k")`` →
        (id, k). get_json_object stays in codegen; missing keys are NULL."""
        cur = self.scan()
        if cur is None:
            raise ValueError("document store is empty")
        return cur.select(
            self.ID_COL,
            *[
                F.get_json_object(F.col(self.DOC_COL), p).alias(name)
                for name, p in paths.items()
            ],
        )

    def typed(self, schema: str) -> DataFrame:
        """Impose a full schema at read time: (id, parsed struct fields).
        ``schema`` is a DDL string, e.g. ``"k long, tag string"``."""
        cur = self.scan()
        if cur is None:
            raise ValueError("document store is empty")
        return cur.select(
            self.ID_COL, F.from_json(F.col(self.DOC_COL), schema).alias("_s")
        ).select(self.ID_COL, "_s.*")
