"""Temporal joins Spark lacks as primitives: as-of join and banded range
join — composed from one shuffle each, never a cross join.

**asof_join** — for every left row, the latest right row with
``right.ts <= left.ts`` (optionally within ``tolerance``), per key. The
kdb/pandas `merge_asof` semantics, built with the union trick:

    union(left tagged 0, right tagged 1)
    → window per key ordered by (ts, tag DESC)
    → last non-null right-payload carried forward
    → keep left rows

One hash shuffle on the key; state per row is O(payload). DuckDB has a
native ASOF JOIN, which is the oracle.

**range_join_events** — all (a, b) pairs per key with
``0 < b.ts − a.ts <= window``. Naive formulation is an inequality join
(cartesian per key); the scalable one buckets time into window-sized
epochs and equi-joins each left bucket to its own and the next bucket —
join keys are (key, bucket), perfectly shuffle-partitionable, and the
inequality shrinks to a residual filter. Standard interval-bucketing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: tuple[str, ...],
    ts_col: str = "ts",
    right_cols: tuple[str, ...] = (),
    tolerance_seconds: int | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left rows + the most recent right row at-or-before their timestamp.

    ``right_cols`` are the right-side payload columns to carry (each lands
    as ``<name><suffix>``); rows with no prior right row get NULLs, or —
    with ``tolerance_seconds`` — also when the match is older than the
    tolerance. Ties on ts (a right row exactly at left.ts) DO match.
    """
    if not right_cols:
        raise ValueError("right_cols must name at least one payload column")
    keys = list(key_cols)
    payload = list(right_cols)

    # The carried state is ONE struct per right row — carrying each
    # payload column independently (the first build) mixed fields from
    # DIFFERENT right rows whenever the newest row held a NULL in some
    # field (merge_asof semantics carry the whole row, NULLs included),
    # and judged tolerance staleness against the newest rts while serving
    # an older column's value as fresh. NULL-ts right rows are dropped up
    # front: they can never satisfy right.ts <= left.ts, but they sorted
    # FIRST in the window (asc = nulls first) and leaked payload into
    # left rows with no genuine prior match.
    rhs = right.filter(F.col(ts_col).isNotNull()).select(
        *keys,
        F.col(ts_col),
        F.lit(1).alias("__tag"),
        F.struct(
            F.col(ts_col).alias("__rts"),
            *[F.col(c).alias(f"__p_{c}") for c in payload],
        ).alias("__row"),
    )
    row_type = rhs.schema["__row"].dataType
    lhs = left.withColumn("__tag", F.lit(0)).withColumn(
        "__row", F.lit(None).cast(row_type)
    )
    left_cols = [c for c in left.columns]
    union = lhs.select(*left_cols, "__tag", "__row").unionByName(
        rhs.select(
            *keys,
            F.col(ts_col),
            *[
                F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
                for c in left_cols
                if c not in keys and c != ts_col
            ],
            "__tag",
            "__row",
        ),
        allowMissingColumns=False,
    )

    # right rows sort BEFORE left rows at equal ts (tag DESC) so an
    # exactly-simultaneous right row is visible to the left row; the row
    # struct is a deterministic final tie-break so which of several
    # equal-ts right rows is carried does not depend on partition order.
    w = (
        Window.partitionBy(*keys)
        .orderBy(
            F.col(ts_col).asc(), F.col("__tag").desc(), F.col("__row").asc()
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = union.select(
        *left_cols,
        "__tag",
        F.last("__row", ignorenulls=True).over(w).alias("__c"),
    ).select(
        *left_cols,
        "__tag",
        *[F.col("__c").getField(f"__p_{c}").alias(f"__c_{c}") for c in payload],
        F.col("__c").getField("__rts").alias("__c_rts"),
    )

    out = carried.filter(F.col("__tag") == 0)
    stale: Column | None = None
    if tolerance_seconds is not None:
        age = F.unix_micros(F.col(ts_col)) - F.unix_micros(F.col("__c_rts"))
        stale = F.col("__c_rts").isNull() | (age > tolerance_seconds * 1_000_000)
    for c in payload:
        val = F.col(f"__c_{c}")
        if stale is not None:
            val = F.when(~stale, val)
        out = out.withColumn(f"{c}{suffix}", val)
    return out.select(
        *left_cols, *[f"{c}{suffix}" for c in payload]
    )


def range_join_events(
    df: DataFrame,
    key_cols: tuple[str, ...],
    window_seconds: int,
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """All ordered pairs (a, b) per key with 0 < b.ts − a.ts <= window.

    Bucketed formulation: epoch = floor(unix_micros/window); each a-bucket
    equi-joins b in {epoch, epoch+1} (a pair within the window spans at
    most one bucket boundary), then the exact inequality filters. The join
    is on (keys, bucket) — hash-shuffleable, skew-splittable — and the
    per-task pair space is bounded by bucket occupancy, not key cardinality.
    """
    if window_seconds < 1:
        raise ValueError("window_seconds must be >= 1")
    keys = list(key_cols)
    win_us = window_seconds * 1_000_000
    # Pure-integer floor division: pmod makes the remainder non-negative,
    # so (us - rem) is the exact floor multiple even for pre-1970
    # timestamps, and `div` is INTEGRAL division — the first build used
    # `/` (double division), whose long→double round-trip can truncate
    # onto the wrong bucket past 2^53 µs and silently drop a
    # boundary-spanning pair.
    epoch = F.expr(
        f"(unix_micros({ts_col}) - pmod(unix_micros({ts_col}), {win_us})) "
        f"div {win_us}"
    )

    a = df.select(
        *keys,
        F.col(id_col).alias("a_id"),
        F.unix_micros(F.col(ts_col)).alias("a_us"),
        epoch.alias("__bucket"),
    )
    b = df.select(
        *keys,
        F.col(id_col).alias("b_id"),
        F.unix_micros(F.col(ts_col)).alias("b_us"),
        F.explode(F.array(epoch, epoch - 1)).alias("__bucket"),
    )
    pairs = a.join(b, [*keys, "__bucket"])
    return (
        pairs.filter(
            (F.col("b_us") > F.col("a_us"))
            & (F.col("b_us") - F.col("a_us") <= win_us)
        )
        .select(*keys, "a_id", "b_id", (F.col("b_us") - F.col("a_us")).alias("gap_us"))
    )
