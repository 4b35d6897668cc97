"""Streaming exact dedup — at-least-once sources made effectively-once.

The reference gets idempotency by MERGE-on-key re-runs (`tasks/Query
History API to Delta_withmetrics.py:244-250`); the streaming-native
form is `dropDuplicatesWithinWatermark`: per-key dedup state that the
watermark EVICTS, so state is bounded by (key arrival rate × watermark
horizon) instead of growing with the whole history. Exactly the shape
a 100 TB/day event firehose needs — the classic unbounded
`dropDuplicates` on a stream is an OOM with a delay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop re-deliveries of the same key arriving within the watermark
    horizon. State per key is evicted once the watermark passes it."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
