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


# ---------------------------------------------------------------------------
# Unrolled (fixed-dim) twins — r15 optimization pass.
#
# The aggregate(zip_with(...)) folds above are correct and dim-generic, but
# Catalyst evaluates higher-order-function lambdas INTERPRETED, outside
# whole-stage codegen (they are CodegenFallback expressions): every row of a
# brute-force scan pays an interpreted per-element loop plus two transient
# array allocations. When the dimension is STATICALLY KNOWN (a literal query
# vector, or a caller-supplied dim hint), the same computation unrolls into
# a flat chain of codegen'd arithmetic:
#
#     ((0.0 + t_0) + t_1) + ... + t_{d-1},   t_i from a[i]/b[i]/literals
#
# which whole-stage codegen compiles to straight-line Java. The chain seeds
# with lit(0.0) and adds LEFT-TO-RIGHT — the exact operation sequence of the
# fold — so results are BIT-IDENTICAL (pinned in tests/test_knn.py), which
# keeps every oracle-gated query's hash unchanged. Measured 4.7x on the
# 2000x2000 exact 5-NN build at 64-d (OPTIMIZATION_r15.md).
#
# Callers must pass a plain column reference (or cheap expression) for the
# array side: each of the d terms re-references it, so an EXPENSIVE derived
# array (e.g. an SQ decode transform) would rely on codegen subexpression
# elimination to avoid d evaluations — those call sites keep the fold.
# ---------------------------------------------------------------------------

# Unroll ceiling: past this the expression tree stops paying (the Arrow GEMM
# kernels own >= ARROW_DIM_MIN=128 anyway) and very large trees slow codegen.
UNROLL_DIM_MAX = 128


def _chain(terms) -> Column:
    """Left-assoc sum seeded with 0.0 — the fold's exact op sequence."""
    acc = F.lit(0.0)
    for t in terms:
        acc = acc + t
    return acc


def _elem(v, i: int) -> Column:
    """i-th element as double: column arrays index via GetArrayItem (pure
    codegen), Python sequences inline as double literals — both produce
    the same double the fold's transform(cast) path sees."""
    if isinstance(v, Column):
        return v[i].cast("double")
    return F.lit(float(v[i]))


def l2_sq_unrolled(a, b, dim: int) -> Column:
    """Unrolled l2_sq over ``dim`` components; bit-equal to l2_sq when
    both arrays have exactly ``dim`` elements (callers guard sizes)."""
    def term(i: int) -> Column:
        d = _elem(a, i) - _elem(b, i)
        return d * d

    return _chain(term(i) for i in range(dim))


def dot_unrolled(a, b, dim: int) -> Column:
    """Unrolled dot over ``dim`` components; bit-equal to dot when both
    arrays have exactly ``dim`` elements (callers guard sizes)."""
    return _chain(_elem(a, i) * _elem(b, i) for i in range(dim))


def cosine_sim_unrolled(a, b, dim: int) -> Column:
    """Unrolled cosine_sim (same zero-norm NULL guard). When ``b`` is a
    Python sequence its norm is folded to a literal in Python float64 —
    the identical left-assoc IEEE op sequence the engine's per-row fold
    would execute, so the literal is bit-equal to the expression it
    replaces (and stops being re-evaluated interpreted on every row)."""
    import math

    a_norm = F.sqrt(dot_unrolled(a, a, dim))
    if isinstance(b, Column):
        b_norm = F.sqrt(dot_unrolled(b, b, dim))
    else:
        acc = 0.0
        for x in b:
            acc = acc + float(x) * float(x)
        b_norm = F.lit(math.sqrt(acc))
    denom = a_norm * b_norm
    return F.when(denom != 0.0, dot_unrolled(a, b, dim) / denom)


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
