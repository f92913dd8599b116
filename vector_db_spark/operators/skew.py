"""Skew-mitigation operators.

AQE's skew-join splitting handles storage-level skew at runtime; what it
cannot fix is a *hot aggregation key* — a groupBy where one key owns a
double-digit share of all rows sends that share through a single reducer.
The classic fix is salting: split each key into ``n_salts`` sub-keys,
partially aggregate, then finish the aggregation over the (tiny)
per-salt partials.

``salted_aggregate`` does that for any algebraic aggregate (one extra —
cheap, pre-reduced — shuffle in exchange for bounding the largest reducer
at 1/n_salts of the hot key). Correctness is oracle-verified: the salted
plan must produce bit-identical results to the direct groupBy (decimal
sums make the fold order irrelevant).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    n_salts: int = 16,
    *,
    sum_cols: Sequence[str] = (),
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
) -> DataFrame:
    """Two-stage skew-proof aggregation.

    Emits ``n_rows`` plus ``sum_<c>`` (decimal-exact sum, as double) and
    ``min_<c>``/``max_<c>`` per requested column, grouped by ``keys``.
    Stage 1 groups by (keys, salt) — the hot key fans out over n_salts
    reducers; stage 2 merges n_salts partial rows per key, which is
    negligible. Sums stay DECIMAL(38,6) until the very end so the
    two-stage fold is bit-identical to a direct one-stage aggregation.
    """
    if n_salts < 1:
        raise ValueError("n_salts must be >= 1")
    salted = df.withColumn(
        _SALT,
        F.pmod(
            F.xxhash64(*[F.col(k) for k in keys], F.spark_partition_id()),
            F.lit(n_salts),
        ),
    )

    partial_aggs = (
        [F.count(F.lit(1)).alias("__pn")]
        + [
            F.sum(F.col(c).cast("decimal(38,6)")).alias(f"__ps_{c}")
            for c in sum_cols
        ]
        + [F.min(c).alias(f"__pmin_{c}") for c in min_cols]
        + [F.max(c).alias(f"__pmax_{c}") for c in max_cols]
    )
    partial = salted.groupBy(*keys, _SALT).agg(*partial_aggs)

    final_aggs = (
        [F.sum("__pn").alias("n_rows")]
        + [
            F.sum(f"__ps_{c}").cast("double").alias(f"sum_{c}")
            for c in sum_cols
        ]
        + [F.min(f"__pmin_{c}").alias(f"min_{c}") for c in min_cols]
        + [F.max(f"__pmax_{c}").alias(f"max_{c}") for c in max_cols]
    )
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_join(
    large: DataFrame,
    small: DataFrame,
    keys: Sequence[str],
    n_salts: int = 16,
    *,
    salt_on: Sequence[str] = (),
    how: str = "inner",
) -> DataFrame:
    """Replicate-and-salt equi-join for hot join keys.

    The regime AQE's skew splitting doesn't cover: the build side is too
    big to broadcast AND the probe side has hot keys, so a plain
    shuffle-join sends a hot key's every row through one task. Fix:
    the small side is replicated ``n_salts`` times (explode of a literal
    sequence — n_salts·|small| rows through its exchange), the large side
    computes a CONTENT-derived salt in [0, n_salts) from ``salt_on``
    columns (repartition-proof — never random()), and the join key becomes
    (keys, salt): the hot key now spreads over n_salts tasks.

    ``salt_on`` must functionally spread rows WITHIN a key (e.g. the line
    number within an order); it defaults to the key itself, which only
    spreads storage skew — pass real columns for hot-key spread.
    Result is bit-identical to ``large.join(small, keys, how)`` (each
    large row meets exactly the one small replica carrying its salt).
    """
    if n_salts < 1:
        raise ValueError("n_salts must be >= 1")
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = list(keys)
    spread = list(salt_on) or keys
    salted_large = large.withColumn(
        _SALT,
        F.pmod(F.xxhash64(*[F.col(c) for c in spread]), F.lit(n_salts)).cast("int"),
    )
    replicated = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_large.join(replicated, [*keys, _SALT], how).drop(_SALT)
