"""DuckDB oracle-SQL fragment builders.

The driver verifies every declared query against DuckDB on the same parquet
(SURVEY.md §2.9). Floating-point parity is engineered, not hoped for
(SURVEY.md §7.3.1): the Spark side computes distances as a left-to-right
float64 fold over float32-cast-to-float64 elements
(functions/vector.py), and these builders emit SQL with the *identical*
association — an explicit left-associated sum of per-element float64 terms —
so both engines produce bit-identical doubles. Output distance columns are
additionally rounded on both sides before hash comparison.

DuckDB lists are 1-indexed; ``dim`` defaults to the fixture embedding width
(FIXTURES.md: 64).
"""

from __future__ import annotations

DIM = 64


def l2_sq_sql(a: str, b: str, dim: int = DIM) -> str:
    """Squared-L2 between two list columns, same fold order as Spark."""
    return " + ".join(
        f"({a}[{i}]::DOUBLE - {b}[{i}]::DOUBLE) * ({a}[{i}]::DOUBLE - {b}[{i}]::DOUBLE)"
        for i in range(1, dim + 1)
    )


def dot_sql(a: str, b: str, dim: int = DIM) -> str:
    return " + ".join(
        f"({a}[{i}]::DOUBLE * {b}[{i}]::DOUBLE)" for i in range(1, dim + 1)
    )


def cosine_sim_sql(a: str, b: str, dim: int = DIM) -> str:
    return (
        f"({dot_sql(a, b, dim)}) / "
        f"(sqrt({dot_sql(a, a, dim)}) * sqrt({dot_sql(b, b, dim)}))"
    )


def cosine_sim_guarded_sql(a: str, b: str, dim: int = DIM) -> str:
    """Cosine with the engine's zero-norm contract (operators/hybrid.py
    _sim: denom == 0 -> 0.0). The unguarded form NULLs/infs on a
    zero-norm vector, which would hash-mismatch any oracle mirroring an
    engine path that defines sim(0-vec, x) = 0 (ADVICE r13)."""
    na = f"sqrt({dot_sql(a, a, dim)})"
    nb = f"sqrt({dot_sql(b, b, dim)})"
    return (
        f"(CASE WHEN ({na}) * ({nb}) = 0 THEN 0.0 "
        f"ELSE ({dot_sql(a, b, dim)}) / (({na}) * ({nb})) END)"
    )
