"""Physical-plan inspection and assertion helpers."""

from vector_db_spark.plans.inspect import (  # noqa: F401
    executed_plan,
    explain_str,
    has_broadcast_hash_join,
    has_partition_filter,
    has_take_ordered,
    pushed_filters,
    read_schema_columns,
    uses_whole_stage_codegen,
)
