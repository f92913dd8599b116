"""Physical-plan introspection: programmatic access to the properties that
decide whether a query survives a 100× scale-up.

The reference has no plans at all (its "plan" is a typed request struct,
SURVEY.md §3); on Spark the physical plan IS the performance contract, so
the engine ships helpers to assert it:

- filters reached the parquet scan (``pushed_filters``) — the row-group
  skipping that replaces the reference's roaring-bitmap filter index;
- the scan reads only needed columns (``read_schema_columns``) — a 2-column
  projection must not drag a 100-column row through the scan;
- top-k planned as ``TakeOrderedAndProject`` (``has_take_ordered``) — per
  partition heaps + tiny merge, never a global sort;
- small dims broadcast (``has_broadcast_hash_join``) — the big side never
  shuffles;
- partition pruning hit (``has_partition_filter``) — the IVF nprobe story;
- expressions stayed in whole-stage codegen (``uses_whole_stage_codegen``).

tests/test_plans.py pins these for the engine's flagship queries, so a
regression that silently de-optimizes a plan fails CI, not the cluster.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The final (AQE-resolved where applicable) physical plan as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Per-FileScan PushedFilters contents (one raw string per scan;
    substring-match against it — expressions contain commas)."""
    plan = executed_plan(df)
    return [
        m.group(1).strip()
        for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan)
        if m.group(1).strip()
    ]


def read_schema_columns(df: DataFrame) -> set[str]:
    """Union of column names the plan's FileScans actually read."""
    plan = executed_plan(df)
    cols: set[str] = set()
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        for field in m.group(1).split(","):
            name = field.split(":")[0].strip()
            if name:
                cols.add(name)
    return cols


def has_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in executed_plan(df)


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df)


def has_partition_filter(df: DataFrame, col: str) -> bool:
    """True if some scan prunes partitions on ``col``."""
    plan = executed_plan(df)
    for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", plan):
        if col in m.group(1):
            return True
    return False


def uses_whole_stage_codegen(df: DataFrame) -> bool:
    return re.search(r"\*\(\d+\)", executed_plan(df)) is not None
