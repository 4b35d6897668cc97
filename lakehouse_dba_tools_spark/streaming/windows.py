"""Streaming ingestion & windowed aggregation over the events stream.

The reference simulates incrementality with scheduled re-runs + a
look-back window + MERGE idempotency and imperative polling loops
(`tasks/Query History API to Delta_withmetrics.py:18-22`,
`evaluation_tools/Endpoint_Starter.py:47-57`). This module is the
Structured-Streaming rendition: file-source micro-batches → watermarked
windowed aggregation → sink; ``foreachBatch`` + merge for the
idempotent-upsert sink.

Scale notes: a windowed streaming agg shuffles on (window, keys) per
micro-batch with state kept per window; the watermark bounds state.
``session_window`` gap-merges per key — skewed keys are the risk, as in
batch. For tests, the parquet file source with ``maxFilesPerTrigger``
drives deterministic micro-batches and ``processAllAvailable`` runs the
stream to completion synchronously.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

def stream_events(spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1) -> DataFrame:
    """File-source stream of the events table, ``ts`` normalized to TIMESTAMP.

    The fixture's ``ts`` physical type has changed across driver versions
    (TIMESTAMP(NANOS) read as long under nanosAsLong, then timestamp[us]
    read as TIMESTAMP_NTZ), so the stream schema is taken from a batch
    footer read of the same file rather than hardcoded — a hardcoded
    LongType over timestamp[us] silently yields µs values divided as ns,
    collapsing every event into 1970.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch_schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    # The file source takes a DIRECTORY; pathGlobFilter narrows it to
    # the events table file(s).
    raw = (
        spark.readStream.schema(batch_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ts_type = dict(raw.dtypes)["ts"]
    if ts_type == "bigint":
        # ns epoch: integer truncation (ts div 1000), not float division
        # — see sources/tables.py NS_TIMESTAMP_COLS note.
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def tumbling_rollup(events: DataFrame, width: str = "1 hour", watermark: str = "10 minutes") -> DataFrame:
    """Watermarked tumbling-window rollup per event_type."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("w.start").cast("long").alias("hour_epoch"), "event_type", "n", "sum_value"
        )
    )


def sliding_rollup(
    events: DataFrame, width: str = "1 hour", slide: str = "30 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").cast("long").alias("win_epoch"), "event_type", "n")
    )


def session_window_rollup(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Gap-merged session windows per user (streaming-native analog of
    operators/sessionize.py)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").cast("long").alias("session_start_epoch"),
            "n_events",
        )
    )


def run_stream_to_table(stream_df: DataFrame, spark: SparkSession, mode: str = "complete") -> DataFrame:
    """Drive a streaming frame to completion into an in-memory table.

    ``complete`` mode emits every window — append mode would hold back
    windows newer than the final watermark (no late data can close
    them), which is correct streaming semantics but wrong for a bounded
    replay comparison.
    """
    name = f"stream_out_{uuid.uuid4().hex[:8]}"
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def stream_upsert_to_parquet(
    spark: SparkSession,
    source: DataFrame,
    path: str,
    keys: list[str],
    source_order: list[str] | None = None,
    checkpoint_dir: str | None = None,
    partition_col: str | None = None,
) -> None:
    """foreachBatch + keyed merge — the reference's MERGE-idempotent ETL
    (QH:244-250) as an exactly-once streaming sink. ``source_order``
    picks the surviving row per key within a batch (the reference's W1
    dedup-before-MERGE invariant).

    ``partition_col`` routes every micro-batch through the
    partition-pruned MERGE (``create_or_upsert_partitioned``): only
    target partitions receiving batch rows are rewritten — the path a
    100 TB keyed sink must take, since each micro-batch touches a tiny
    key slice and a whole-table rewrite per batch is quadratic in
    history. The column must be stable per key (a creation date, a
    key-prefix bucket). Without it, every batch rewrites the whole
    target — acceptable only for genuinely small dimension tables."""
    from lakehouse_dba_tools_spark.operators.upsert import (
        create_or_upsert_parquet,
        create_or_upsert_partitioned,
    )

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if partition_col is not None:
            create_or_upsert_partitioned(
                spark, batch_df, path, keys,
                partition_col=partition_col, source_order=source_order,
            )
        else:
            create_or_upsert_parquet(spark, batch_df, path, keys, source_order=source_order)

    q = (
        source.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir or path + "._checkpoint")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
