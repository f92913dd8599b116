"""Tombstone deletes for persisted ANN indexes.

The reference removes vectors from its LIVE in-memory indexes (faiss
``remove_vectors``, reference: src/core/index/faiss_index.rs:131-138;
usearch ``remove``, src/core/index/usearch_index.rs:87-93).  Our indexes
are immutable cell/bucket-partitioned parquet layouts — rewriting a 100 TB
layout per delete is out of the question, and so is the reference's
rebuild-on-mutation.  The warehouse-native answer is the tombstone
manifest (the same shape as Delta/Iceberg delete files):

- ``delete`` appends a tiny parquet file of deleted ids under
  ``<index>/tombstones/`` — O(deleted ids) write, zero touch of the data
  layout, safe to apply concurrently with readers (append-only).
- every probe anti-joins the tombstone set.  The set is small relative to
  the corpus (deletes between compactions), so the anti-join is a
  BROADCAST left-anti — no shuffle of the corpus side, and it composes
  with partition pruning (the filter applies after the pruned scan).
- ``vacuum`` (compaction) rewrites the layout without tombstoned rows and
  clears the manifest — the amortized cleanup, run on the retrain cadence.

Graph indexes must NOT drop deleted nodes from the frame: the adjacency
is positional after an id sort, and deleted nodes still ROUTE the beam
(the soft-delete semantics of HNSW-family libraries — a hard drop would
disconnect regions).  They instead fold the tombstone set into the
admission mask; ``vacuum`` (a rebuild) is where edges are actually
re-wired.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEL_COL = "__del_id"
TOMBSTONE_DIR = "tombstones"


def tombstone_df(
    spark: SparkSession, ids: Sequence[int] | DataFrame, id_col: str | None = None
) -> DataFrame:
    """Normalize a delete request (driver-side id list or a distributed
    frame of ids) into a one-column ``__del_id`` frame.  Distinct so the
    manifest never accumulates duplicate rows for re-deleted ids.

    The id TYPE is preserved for non-numeric keys: the old unconditional
    cast-to-long turned string doc ids (which the MaxSim operators accept
    everywhere else) into NULL tombstones the anti-join never matched —
    delete() silently no-opped and 'deleted' docs kept being served."""
    if isinstance(ids, DataFrame):
        col = id_col or ids.columns[0]
        dt = ids.schema[col].dataType.typeName()
        c = F.col(col)
        if dt in ("byte", "short", "integer", "long"):
            c = c.cast("long")  # one integral manifest type, as before
        return ids.select(c.alias(DEL_COL)).distinct()
    vals = list(ids)
    if vals and all(isinstance(i, str) for i in vals):
        return spark.createDataFrame(
            [(i,) for i in vals], f"{DEL_COL} string"
        ).distinct()
    return spark.createDataFrame(
        [(int(i),) for i in vals], f"{DEL_COL} long"
    ).distinct()


def write_tombstones(tomb: DataFrame, path: str) -> None:
    """Append the delete manifest — one small file per delete call, the
    data layout untouched."""
    tomb.write.mode("append").parquet(os.path.join(path, TOMBSTONE_DIR))


def load_tombstones(spark: SparkSession, path: str) -> DataFrame | None:
    p = os.path.join(path, TOMBSTONE_DIR)
    if not os.path.isdir(p):
        return None
    return spark.read.parquet(p).distinct()


def clear_tombstones(path: str) -> None:
    p = os.path.join(path, TOMBSTONE_DIR)
    if os.path.isdir(p):
        shutil.rmtree(p)


def snapshot_tombstones(
    tomb: DataFrame | None, spark: SparkSession, path: str
) -> None:
    """save()-time manifest snapshot shared by every index family.
    ORDERING INVARIANT: the id set is materialized to the driver BEFORE
    the directory is cleared — ``tomb`` may itself be lazily reading
    ``path``/tombstones (load-then-save cycle), and clearing first would
    delete the files out from under the collect. The set is bounded by
    the compaction cadence, so the round-trip is a few KB."""
    tomb_ids = [r[0] for r in tomb.collect()] if tomb is not None else []
    clear_tombstones(path)
    if tomb_ids:
        write_tombstones(tombstone_df(spark, tomb_ids), path)


def merge_tombstones(cur: DataFrame | None, new: DataFrame) -> DataFrame:
    return new if cur is None else cur.unionByName(new).distinct()


def apply_tombstones(
    df: DataFrame, id_col: str, tomb: DataFrame | None
) -> DataFrame:
    """Filter deleted rows out of a candidate frame: broadcast left-anti
    join — the tombstone set (bounded by the compaction cadence) ships to
    executors, the corpus side never moves or shuffles."""
    if tomb is None:
        return df
    return df.join(
        F.broadcast(tomb), on=df[id_col] == tomb[DEL_COL], how="left_anti"
    )


def mark_tombstones(
    df: DataFrame, id_col: str, tomb: DataFrame | None, mark_col: str
) -> DataFrame:
    """Soft-delete marker for graph indexes: a broadcast left join adds a
    boolean ``mark_col`` (True = deleted) instead of dropping rows, so
    positional adjacencies stay valid and deleted nodes keep routing the
    beam while never being admitted."""
    if tomb is None:
        return df.withColumn(mark_col, F.lit(False))
    marked = tomb.withColumn("__dead_hit", F.lit(True))
    return (
        df.join(
            F.broadcast(marked), on=df[id_col] == marked[DEL_COL], how="left"
        )
        .withColumn(mark_col, F.coalesce(F.col("__dead_hit"), F.lit(False)))
        .drop(DEL_COL, "__dead_hit")
    )
