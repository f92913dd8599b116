"""Vector distance/similarity column functions.

These are the engine's scalar "distance kernels". The reference delegates
them to faiss/usearch SIMD C++ (reference: src/core/index_factory.rs:41-48
MetricType {InnerProduct, L2}; src/core/index/faiss_index.rs:60-69); here
they are native Catalyst higher-order-function expressions —
``aggregate(zip_with(...))`` — which stay JVM-side inside whole-stage
codegen, so a brute-force scan is a tight generated loop, no Python in the
hot path.

Conventions (SURVEY.md §7.3.1, pinned once):

- **L2 is squared L2** — matches the backends' native output (faiss
  ``MetricType::L2`` and usearch ``L2sq`` both return squared distance).
- **Inner product** is the raw dot product; *similarity* ordering is DESC.
- **Cosine** is its own metric (normalize-then-dot), deliberately NOT
  conflated with IP the way the reference's comment does
  (reference: src/core/index_factory.rs:43).
- All arithmetic is in float64: elements are cast from float32 before any
  subtraction/multiplication and summed left-to-right, so results are
  bit-reproducible and match an oracle computing the same fold in float64.

Every function takes/returns pyspark Columns and composes with arbitrary
DataFrame expressions (filters push down *around* them).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def l2_sq(a: Column, b: Column) -> Column:
    """Squared euclidean distance between two array<numeric> columns."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def dot(a: Column, b: Column) -> Column:
    """Inner product of two array<numeric> columns."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    """Euclidean norm of an array<numeric> column."""
    return F.sqrt(dot(a, a))


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity; 0-norm inputs yield NULL (guarded — under ANSI
    mode, Spark 4's default, a bare division would raise DIVIDE_BY_ZERO;
    found by the hypothesis identity property in tests/test_properties.py)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0.0, dot(a, b) / denom)


def normalize(a: Column) -> Column:
    """L2-normalize an array<numeric> column (returns array<double>).

    Zero-norm vectors pass through unnormalized (all-zero) instead of
    raising DIVIDE_BY_ZERO under ANSI mode — mirrors cosine_sim's guard,
    and keeps centroid training/assignment finite when a corpus contains
    zero embeddings.
    """
    norm = l2_norm(a)
    doubled = _as_double(a)
    return F.when(norm != 0.0, F.transform(doubled, lambda x: x / norm)).otherwise(
        doubled
    )
