"""Deterministic sampling for training-data pipelines.

``df.sample()`` is seed-dependent on partitioning and re-rolls when the
input re-partitions — unacceptable for reproducible corpus splits. These
operators sample by CONTENT HASH of a key: a row's fate depends only on
its key and the salt, so samples are stable across runs, clusters,
repartitionings, and engines (md5 is the one hash Spark and DuckDB share,
which also makes every sampling query value-exact against the oracle).

- ``hash_bucket`` — uniform bucket in [0, buckets) from md5(key ‖ salt).
- ``deterministic_sample`` — keep a fixed fraction.
- ``stratified_sample`` — per-stratum fractions (cap a dominant language,
  upweight a rare one).
- ``train_eval_split`` — disjoint splits that stay disjoint forever; new
  data lands on the same side its key always had (no eval contamination
  when the corpus grows).

All pure codegen expressions — sampling at 100 TB is a pushed-down filter,
not a shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

BUCKETS = 10_000


def hash_bucket(key: Column, salt: str = "", buckets: int = BUCKETS) -> Column:
    """Deterministic uniform bucket: first 8 md5 hex digits of
    (key ‖ salt) as an integer, mod ``buckets``. NULL keys hash a
    sentinel string — a NULL bucket made every membership filter drop
    the row, so NULL-keyed rows landed in NEITHER side of a split and
    silently vanished from samples. The sentinel is NUL-framed
    (``"\\x00<null>\\x00"``): the earlier bare ``"<null>"`` collided with a
    genuine key whose string value IS ``<null>``, welding those rows to
    NULL-keyed rows' bucket fate across every salt and split; NUL bytes
    sit outside any plausible key domain. Non-NULL inputs stay byte-
    identical (``cast(key as string) ‖ salt``) so existing splits, and
    the DuckDB oracle twins that inline the same expression, are
    unaffected."""
    h = F.md5(
        F.concat(
            F.coalesce(key.cast("string"), F.lit("\x00<null>\x00")), F.lit(salt)
        )
    )
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % buckets


def _cut(fraction: float) -> int:
    """fraction -> bucket cut, floor(x+0.5) (the repo's portable HALF_UP):
    bare int() truncated float artifacts — int(0.57*10000) == 5699, so a
    57% request sampled 56.99% — and sub-resolution fractions silently
    produced an EMPTY keep set; they now round to the nearest bucket."""
    return int(fraction * BUCKETS + 0.5)


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    key_col: str,
    salt: str = "",
) -> DataFrame:
    """Keep ~``fraction`` of rows, decided per key hash (repartition-proof)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    return df.filter(hash_bucket(F.col(key_col), salt) < _cut(fraction))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum keep fractions; strata missing from ``fractions`` get
    ``default_fraction``."""
    for v in fractions.values():
        if not 0.0 <= v <= 1.0:
            raise ValueError("fractions must be in [0, 1]")
    cut = F.lit(_cut(default_fraction))
    for stratum, frac in fractions.items():
        cut = F.when(
            F.col(strata_col) == stratum, F.lit(_cut(frac))
        ).otherwise(cut)
    return df.filter(hash_bucket(F.col(key_col), salt) < cut)


def train_eval_split(
    df: DataFrame,
    key_col: str,
    eval_fraction: float = 0.01,
    salt: str = "split",
) -> tuple[DataFrame, DataFrame]:
    """(train, eval) with hash-disjoint keys: eval membership is a property
    of the key, so later ingests can never leak eval keys into train."""
    if not 0.0 < eval_fraction < 1.0:
        raise ValueError("eval_fraction must be in (0, 1)")
    cut = _cut(eval_fraction)
    bucket = hash_bucket(F.col(key_col), salt)
    return df.filter(bucket >= cut), df.filter(bucket < cut)


def global_shuffle(
    df: DataFrame,
    key_col: str,
    salt: str = "shuffle",
    n_partitions: int | None = None,
) -> DataFrame:
    """Deterministic whole-corpus shuffle for training-order randomization:
    every row gets ``shuffle_key`` = md5(key ‖ salt) and the frame comes
    back range-partitioned + locally sorted on it — a TOTAL order across
    output partitions, reproducible across runs/clusters/engines.

    Deliberately NOT ``ORDER BY rand()`` (irreproducible) and NOT a global
    ``row_number()`` (a no-partition window collapses to ONE task — the
    classic 100 TB scale-killer). ``repartitionByRange`` does one sampled
    range shuffle; the within-partition sort is local. Writing the result
    preserves order per file, which is all a training loader consumes."""
    key = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    out = df.withColumn("shuffle_key", key)
    # key_col as the secondary sort: duplicate key_col values share a
    # shuffle_key, and without a tie-break their relative order (and the
    # range boundary they straddle) was run-dependent — breaking the
    # documented reproducible total order
    if n_partitions is not None:
        out = out.repartitionByRange(n_partitions, "shuffle_key", key_col)
    else:
        out = out.repartitionByRange("shuffle_key", key_col)
    return out.sortWithinPartitions("shuffle_key", key_col)


def importance_sample(
    df: DataFrame,
    weight: Column,
    key_col: str,
    salt: str = "",
) -> DataFrame:
    """Per-row keep probability = ``weight`` (clamped to [0, 1]):
    quality-weighted corpus downsampling where better documents survive
    proportionally more often, still decided purely by content hash so the
    sample is repartition- and rerun-stable. ``weight`` is any Column
    expression (a quality score, a per-domain target rate, ...); the
    comparison happens in integer bucket space so an integer-valued weight
    expression makes the query value-exact against the SQL oracle."""
    cut = F.least(
        F.lit(BUCKETS).cast("long"),
        F.greatest(F.lit(0).cast("long"), (weight * BUCKETS).cast("long")),
    )
    return df.filter(hash_bucket(F.col(key_col), salt) < cut)


def mixture_sample(
    df: DataFrame,
    group_col: str,
    targets: dict[str, int],
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Rebalance a corpus to TARGET group proportions with maximal data
    retention — the static domain-mixture step every LLM data recipe runs
    (e.g. The Pile / LLaMA per-source weights; DoReMi learns the weights,
    this operator applies them).

    ``targets`` maps group -> proportion in parts-per-million (integer ppm
    keeps every derived count in exact integer arithmetic, so the query is
    value-exact against the SQL oracle). Groups absent from ``targets``
    are dropped. The kept corpus is the LARGEST subset honoring the
    proportions exactly under floor rounding:

        K      = min over groups of  floor(n_g * 1_000_000 / ppm_g)
        kept_g = floor(ppm_g * K / 1_000_000)        (<= n_g by the min)

    Which rows survive inside a group is the same deterministic
    content-hash lottery as ``cap_per_group`` — repartition-proof,
    rerun-stable. Costs one bounded group-count aggregate (rows = number
    of groups, collected driver-side) plus one hash shuffle on the group
    key for the lottery window.
    """
    ppm_total = sum(targets.values())
    if not targets or any(p <= 0 for p in targets.values()):
        raise ValueError("targets must be non-empty positive ppm values")
    if ppm_total > 1_000_000:
        raise ValueError(f"target ppm sum {ppm_total} exceeds 1,000,000")
    counts = {
        r[0]: r[1]
        for r in df.filter(F.col(group_col).isin(*targets))
        .groupBy(group_col)
        .count()
        .collect()
    }
    missing = sorted(set(targets) - set(counts))
    if missing:
        raise ValueError(f"target groups absent from corpus: {missing}")
    k_total = min(counts[g] * 1_000_000 // ppm for g, ppm in targets.items())
    kept = {g: ppm * k_total // 1_000_000 for g, ppm in targets.items()}

    cut = F.lit(0).cast("long")
    for g, n in kept.items():
        cut = F.when(F.col(group_col) == g, F.lit(n).cast("long")).otherwise(cut)
    lottery = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    w = Window.partitionBy(group_col).orderBy(lottery.asc(), F.col(id_col).asc())
    return (
        df.filter(F.col(group_col).isin(*targets))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cut)
        .drop("__rn")
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    max_rows: int,
    id_col: str = "doc_id",
    salt: str = "cap",
) -> DataFrame:
    """Dataset-curation dominance cap: keep at most ``max_rows`` rows per
    group (the per-domain/per-source cap every web-corpus recipe applies
    so one crawl domain cannot dominate training). Selection is a
    deterministic content-hash lottery — rank by (md5(id·salt), id)
    inside each group — so the surviving set is repartition-proof and
    reproducible, never first-N-in-file order. One hash shuffle on the
    group key."""
    if max_rows < 1:
        raise ValueError("max_rows must be >= 1")
    lottery = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    w = Window.partitionBy(group_col).orderBy(lottery.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max_rows)
        .drop("__rn")
    )
