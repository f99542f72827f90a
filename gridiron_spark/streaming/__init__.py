"""Structured Streaming surface (SURVEY.md §2.10 north-star scope).

The reference is batch-only ("infinite appending" by re-running ingest,
reference README.md:8); this package extends the same partitioned-lake model
with real readStream → transform → writeStream pipelines. The transformation
expressions are shared with the batch analogs in queries/streaming_batch.py —
one definition, two execution modes — so the DuckDB oracle that validates the
batch form also validates the streaming semantics.
"""

from gridiron_spark.streaming.pipelines import (
    dedup_within_watermark,
    session_agg,
    sliding_counts,
    stream_events,
    stateful_running_totals,
    tumbling_agg,
)

__all__ = [
    "dedup_within_watermark",
    "session_agg",
    "sliding_counts",
    "stream_events",
    "stateful_running_totals",
    "tumbling_agg",
]
