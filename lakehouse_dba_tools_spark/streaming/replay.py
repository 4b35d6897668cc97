"""Deterministic bounded micro-batch replay for ingest compositions.

The test-harness backbone the persisted-index streaming queries share
(streaming/ingest_dedup.py near-dup dedup, streaming/ingest_ann.py
neighbor search): slice a bounded DataFrame into ``id // batch_size``
batches, seed cross-batch state from the FIRST slice, stage the rest
as one parquet file each with strictly increasing mtimes — Spark's
file source (``maxFilesPerTrigger=1``) processes oldest-first, so
micro-batch order is a pure function of the id column — and drive a
``foreachBatch`` sink over them with ``availableNow``. An exact batch
oracle then exists: which batch a row lands in, and therefore every
cross-batch relationship, is determined by ``id // batch_size`` alone.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def replay_in_batches(
    spark: SparkSession,
    df: DataFrame,
    id_col: str,
    batch_size: int,
    seed_fn: Callable[[DataFrame], None],
    sink: Callable[[DataFrame, int], None],
) -> None:
    """Seed from the first ``id // batch_size`` slice, then replay the
    remaining slices as deterministic micro-batches through ``sink``.
    The staging/checkpoint dirs are temp-scoped and removed."""
    stage = tempfile.mkdtemp(prefix="replay_stage_")
    ckpt = tempfile.mkdtemp(prefix="replay_ckpt_")
    try:
        batched = df.withColumn(
            "_b", F.floor(F.col(id_col) / batch_size).cast("long")
        )
        batch_ids = sorted(
            r[0] for r in batched.select("_b").distinct().collect()
        )  # bounded: row_count / batch_size values
        first, rest = batch_ids[0], batch_ids[1:]
        seed_fn(batched.filter(F.col("_b") == first).drop("_b"))
        # Stage the remaining slices as single files with increasing
        # mtimes; the file source (maxFilesPerTrigger=1, oldest-first)
        # then replays them as deterministic micro-batches.
        t0 = 1_600_000_000
        for i, b in enumerate(rest):
            d = os.path.join(stage, f"b{i:05d}")
            batched.filter(F.col("_b") == b).drop("_b").coalesce(1).write.parquet(d)
            for name in os.listdir(d):
                if name.endswith(".parquet"):
                    os.utime(os.path.join(d, name), (t0 + i, t0 + i))
        q = (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 1)
            .option("pathGlobFilter", "*.parquet")
            .option("recursiveFileLookup", "true")
            .parquet(stage)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        for d in (stage, ckpt):
            shutil.rmtree(d, ignore_errors=True)
