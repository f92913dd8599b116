"""Custom stateful streaming operators via ``applyInPandasWithState``.

Built-in stateful ops (windows, dropDuplicates) cover counting shapes;
training-data ingest also needs *policy* state. ``quota_sample`` keeps only
the first ``quota`` rows per key across the whole stream — the standard
"cap contributions per source/domain/user" rule that stops one crawler
host from dominating a corpus. The per-key admitted count lives in the
Spark state store (checkpointed, recovered on restart), so the cap holds
across micro-batches and restarts, not just within a batch.

Scale notes: state is one int per key, partitioned by key hash; the
operator shuffles once on the key (same cost class as the dedup/window
ops). A GroupStateTimeout can evict idle keys where key cardinality is
unbounded; the default here keeps state forever (quotas are usually
corpus-lifetime).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType

STATE_SCHEMA = "admitted long"


def quota_sample(
    stream: DataFrame,
    key_cols: tuple[str, ...],
    quota: int,
    order_col: str | None = None,
) -> DataFrame:
    """Admit at most ``quota`` rows per key, first-come (within a batch,
    ``order_col`` breaks arrival ties deterministically). Works on both
    streaming (stateful, cross-batch) and batch (window rank) frames with
    identical semantics — which is what makes it oracle-checkable."""
    if quota < 1:
        raise ValueError("quota must be >= 1")

    out_schema: StructType = stream.schema

    if not stream.isStreaming:
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        order = F.col(order_col).asc() if order_col else F.monotonically_increasing_id().asc()
        w = Window.partitionBy(*key_cols).orderBy(order)
        return (
            stream.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= quota)
            .drop("__rn")
        )

    cols = stream.columns

    def admit(
        key: tuple,
        batches: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        admitted = state.get[0] if state.exists else 0
        remaining = quota - admitted
        if order_col:
            # A key group may span several Arrow chunks within one
            # micro-batch; admission must be globally ordered by order_col
            # across all of them (matching the batch path's window rank).
            # Memory stays bounded: after each chunk only the current best
            # `remaining` rows are kept.
            best: pd.DataFrame | None = None
            for pdf in batches:
                if remaining <= 0:
                    break
                merged = pdf if best is None else pd.concat([best, pdf])
                best = merged.sort_values(order_col, kind="stable").head(remaining)
            if best is not None and len(best):
                admitted += len(best)
                yield best[cols]
        else:
            for pdf in batches:
                if admitted >= quota:
                    break
                take = pdf.head(quota - admitted)
                admitted += len(take)
                if len(take):
                    yield take[cols]
        state.update((admitted,))

    return stream.groupBy(*key_cols).applyInPandasWithState(
        admit,
        outputStructType=out_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
