"""Structured Streaming tier (SURVEY.md §2 Tier C — the reference has
no streaming surface; this is the north-star extension).

Spark's unified model means every builder here works identically on a
batch DataFrame and a streaming one — the workload oracle-checks the
batch semantics, and tests/test_streaming.py runs the same builders as
real ``readStream`` queries with watermarks and asserts the streaming
result converges to the batch result.
"""

from pg_lakehouse_spark.streaming.cdc import replicate_changes, stream_changes
from pg_lakehouse_spark.streaming.sink import (
    upsert_stream_to_lake,
    write_stream_to_lake,
)
from pg_lakehouse_spark.streaming.windows import (
    session_agg,
    sliding_agg,
    stream_events,
    tumbling_agg,
)

__all__ = [
    "tumbling_agg",
    "sliding_agg",
    "session_agg",
    "stream_events",
    "write_stream_to_lake",
    "upsert_stream_to_lake",
    "stream_changes",
    "replicate_changes",
]
