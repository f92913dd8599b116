"""Grouped vector statistics: per-group centroids and per-dimension
variance over an ``array<float>`` column.

The embedding-analytics counterpart of the relational aggregates: given a
grouping key (class label, IVF cell, source), compute the mean vector and
per-dimension spread in ONE pass — ``posexplode`` to (group, dim, value)
long form, then a single grouped aggregation with map-side partial
combine. No driver-side math, no UDF: the whole thing is codegen'd
expression arithmetic, and the shuffle key (group, dim) spreads 64× wider
than the group key alone, so even a single dominant label cannot skew one
reducer at scale.

Float parity with the SQL oracle is engineered the same way the distance
folds are (vector_db_spark/oracle.py): float addition is not associative,
so instead of summing doubles in shuffle order, each value is scaled by
2^48 (exact for the fixture's float32s — verified integral across every
scale factor) and summed as DECIMAL(38,0), which is exact and order-free;
squares scale by 2^96 (a power-of-two scale is an exponent shift — exact
for any double product). The final mean/variance divisions are single
IEEE ops on identical operands in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_S1 = 2.0**48  # value scale: fixture floats are k / 2^48 exactly
_S2 = 2.0**96  # square scale: (k/2^48)^2 rounds to m/2^96 in double


def label_centroids(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Long-form per-(group, dimension) statistics:

    ``(label, pos, n_vecs, centroid, variance)``

    ``centroid`` is the per-dimension mean; ``variance`` the population
    variance E[v²] − E[v]² — both exact-deterministic (see module doc)."""
    e = (
        df.select(
            F.col(label_col).alias("label"),
            F.posexplode(F.col(vec_col)).alias("pos", "v"),
        )
        .withColumn("v", F.col("v").cast("double"))
        # NULL elements leave the aggregate entirely: the decimal sums
        # skip them while count(*) did not, silently skewing the mean
        .filter(F.col("v").isNotNull())
    )
    s1 = F.sum((F.col("v") * F.lit(_S1)).cast("decimal(38,0)"))
    s2 = F.sum((F.col("v") * F.col("v") * F.lit(_S2)).cast("decimal(38,0)"))
    n = F.count(F.lit(1))
    mean = s1.cast("double") / (n.cast("double") * F.lit(_S1))
    mean_sq = s2.cast("double") / (n.cast("double") * F.lit(_S2))
    # variance rounds at 12 dp: the subtraction E[v²] − E[v]² is the one
    # spot where compilers may contract multiply+subtract into an FMA
    # (observed: DuckDB differs from the JVM by ~1e-18 here); everything
    # upstream is bit-identical, so a 12-dp round restores exact parity.
    return e.groupBy("label", "pos").agg(
        n.alias("n_vecs"),
        mean.alias("centroid"),
        F.round(mean_sq - mean * mean, 12).alias("variance"),
    )


def centroid_vectors(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Wide form: one row per group with the centroid reassembled as an
    ``array<double>`` (ordered by dimension) — directly usable as a query
    vector or an IVF seed."""
    long = label_centroids(df, label_col, vec_col)
    return long.groupBy("label").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("pos"), F.col("centroid")))
        )["centroid"].alias("centroid"),
        F.max("n_vecs").alias("n_vecs"),
    )


def norm_extremes(
    df: DataFrame,
    k: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding QA: the ``k`` vectors whose squared norm sits farthest
    from the corpus mean — the cheap screen for broken rows (zero/clipped
    vectors, unnormalized outliers, wrong-scale ingests) before they
    poison KMeans fits or cosine thresholds.

    Exactness: the corpus mean of ‖x‖² uses the same 2^96-scaled
    per-element DECIMAL sums as label_centroids (order-free, engine
    -exact); each row's ‖x‖² is the standard left-assoc float64 fold.
    Ranking by |‖x‖² − μ| is then a TakeOrderedAndProject over identical
    doubles — no σ, no quantiles, nothing whose engine arithmetic is
    opaque. Ties break by id."""
    from vector_db_spark.functions.vector import dot

    if k < 1:
        raise ValueError("k must be >= 1")
    e = df.select(F.posexplode(F.col(vec_col)).alias("pos", "v")).withColumn(
        "v", F.col("v").cast("double")
    )
    row = e.agg(
        F.sum((F.col("v") * F.col("v") * F.lit(_S2)).cast("decimal(38,0)")).alias("s2"),
    ).head()
    n_rows = df.count()
    if n_rows == 0:
        raise ValueError("corpus is empty")
    if row.s2 is None:  # rows exist but every embedding is NULL/empty
        raise ValueError("corpus has no vector elements")
    mean_norm_sq = float(row.s2) / (n_rows * _S2)
    norm_sq = dot(F.col(vec_col), F.col(vec_col))
    out = df.select(
        F.col(id_col),
        norm_sq.alias("norm_sq"),
        F.abs(norm_sq - F.lit(mean_norm_sq)).alias("abs_dev"),
    )
    return out.orderBy(F.col("abs_dev").desc(), F.col(id_col).asc()).limit(k)


def column_stats(
    df: DataFrame,
    numeric_cols: "list[str]",
) -> DataFrame:
    """ANALYZE-style per-column statistics: one row per column with
    (column, n_rows, n_nulls, n_distinct, min_val, max_val) — the numbers
    that drive pruning decisions (broadcast thresholds, filter
    selectivity, partition-column choice). One aggregate job for ALL
    columns (a single corpus scan emitting 4·|cols| partial aggregates,
    map-side combined), then a tiny unpivot — never one pass per column.
    n_distinct is exact (count distinct inside the same grouped agg);
    values surface as double for a uniform schema."""
    if not numeric_cols:
        raise ValueError("numeric_cols must be non-empty")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in numeric_cols:
        col = F.col(c).cast("double")
        aggs += [
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"__nulls_{c}"),
            F.countDistinct(col).alias(f"__ndv_{c}"),
            F.min(col).alias(f"__min_{c}"),
            F.max(col).alias(f"__max_{c}"),
        ]
    row = df.agg(*aggs)
    stacked = row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col("__n").alias("n_rows"),
                        F.col(f"__nulls_{c}").cast("long").alias("n_nulls"),
                        F.col(f"__ndv_{c}").cast("long").alias("n_distinct"),
                        F.col(f"__min_{c}").alias("min_val"),
                        F.col(f"__max_{c}").alias("max_val"),
                    )
                    for c in numeric_cols
                ]
            )
        ).alias("s")
    )
    return stacked.select("s.*")


def value_histogram(
    df: DataFrame,
    value_col: str,
    bins: int = 20,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Fixed-width histogram of a numeric column: one min/max aggregate
    (skipped when bounds are given), then a single groupBy over the bin
    index — two narrow shuffles total, map-side combined, nothing
    corpus-sized on the driver. Bin edges use a PINNED double expression
    (lo + i·width) so the SQL oracle reproduces them bit-for-bit; the top
    edge clamps into the last bin (right-closed final interval)."""
    if bins < 1:
        raise ValueError("bins must be >= 1")
    v = F.col(value_col).cast("double")
    if lo is None or hi is None:
        row = df.agg(F.min(v).alias("lo"), F.max(v).alias("hi")).head()
        if row.lo is None or row.hi is None:
            raise ValueError(
                f"cannot infer histogram bounds: {value_col!r} has no "
                "non-null values"
            )
        lo = float(row.lo) if lo is None else lo
        hi = float(row.hi) if hi is None else hi
    if hi < lo:
        raise ValueError("hi must be >= lo")
    width = (hi - lo) / bins
    if width <= 0.0:
        # Degenerate range: lo == hi (constant column) or a subnormal span
        # whose width underflows to exactly 0.0 — either way the per-bin
        # division below would raise DIVIDE_BY_ZERO under ANSI mode.  Emit
        # the single-bin histogram [lo, hi] instead; mass is conserved.
        return (
            df.filter(v.isNotNull() & (v >= lo) & (v <= hi))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(
                F.lit(0).alias("bin"),
                F.lit(lo).alias("bin_lo"),
                F.lit(hi).alias("bin_hi"),
                "n",
            )
        )
    bin_idx = F.least(
        F.lit(bins - 1), F.floor((v - F.lit(lo)) / F.lit(width))
    ).cast("int")
    return (
        df.filter(v.isNotNull() & (v >= lo) & (v <= hi))
        .groupBy(bin_idx.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bin",
            (F.lit(lo) + F.col("bin").cast("double") * F.lit(width)).alias("bin_lo"),
            (F.lit(lo) + (F.col("bin") + 1).cast("double") * F.lit(width)).alias("bin_hi"),
            "n",
        )
    )


def correlation_matrix(
    df: DataFrame,
    cols: "list[str]",
    scale: int = 6,
) -> DataFrame:
    """Exact Pearson correlations for every column pair in ONE scan.

    All five moments per pair (Σx, Σy, Σxy, Σx², Σy²) accumulate as
    DECIMAL(38,``scale``·2) — exact and order-free for fixed-point inputs
    (prices/discounts/quantities), so the final
    (nΣxy − ΣxΣy) / √(nΣx²−(Σx)²)·√(nΣy²−(Σy)²) is a deterministic chain
    of IEEE ops on identical operands in both engines. One aggregate job
    emitting O(|cols|²) partials; rows (col_x, col_y, corr) for x < y."""
    if len(cols) < 2:
        raise ValueError("need at least two columns")
    # operands at DECIMAL(18,scale): their product is DECIMAL(36,2·scale)
    # — still inside the 38-digit ceiling, so products and sums stay EXACT.
    # (Casting operands to (38,·) would push products past 38 digits and
    # Spark silently re-scales — losing the exactness this op is for.)
    op = f"decimal(18,{scale})"
    # listwise NULL deletion: the decimal sums skip NULLs while count(*)
    # did not, so any NULL-bearing column silently skewed EVERY pair's
    # correlation; dropping incomplete rows keeps n consistent with the
    # sums (pairwise-complete Pearson is a different, documented choice)
    cond = None
    for c in cols:
        nn = F.col(c).isNotNull()
        cond = nn if cond is None else (cond & nn)
    df = df.filter(cond)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).cast(op)).alias(f"__s_{c}"))
        aggs.append(F.sum(F.col(c).cast(op) * F.col(c).cast(op)).alias(f"__q_{c}"))
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            aggs.append(
                F.sum(F.col(a).cast(op) * F.col(b).cast(op)).alias(f"__p_{a}_{b}")
            )
    row = df.agg(*aggs)
    n = F.col("__n").cast("double")
    pairs = []
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            sa, sb = F.col(f"__s_{a}").cast("double"), F.col(f"__s_{b}").cast("double")
            qa, qb = F.col(f"__q_{a}").cast("double"), F.col(f"__q_{b}").cast("double")
            p = F.col(f"__p_{a}_{b}").cast("double")
            corr = (n * p - sa * sb) / (
                F.sqrt(n * qa - sa * sa) * F.sqrt(n * qb - sb * sb)
            )
            pairs.append(
                F.struct(
                    F.lit(a).alias("col_x"), F.lit(b).alias("col_y"), corr.alias("corr")
                )
            )
    return row.select(F.explode(F.array(*pairs)).alias("s")).select("s.*")
