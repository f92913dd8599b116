"""Structured Streaming surface of the engine.

The reference ingests synchronously, one HTTP request at a time
(src/router/handle/insert_index_handle.rs:14-61); the Spark-idiomatic
equivalent of that write path is a micro-batched stream: ``readStream`` over
an arriving-file directory (or Kafka at production), event-time windowed
aggregation with watermarks for late data, and ``foreachBatch`` MERGE into a
collection so upsert semantics hold under continuous ingest.
"""

from vector_db_spark.streaming.ingest import (  # noqa: F401
    read_event_stream,
    read_vector_stream,
    stream_upsert_into,
)
from vector_db_spark.streaming.windows import (  # noqa: F401
    session_aggregate,
    streaming_dedup,
    tumbling_aggregate,
)
