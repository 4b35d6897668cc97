"""Partition-layout helpers.

A parquet scan yields one task per file split; a small single-file
table therefore runs every downstream expression on ONE core while the
rest of the cluster idles. At 100 TB the scan naturally gives thousands
of splits, but compute-heavy operators (shingling, signatures, vector
math, pandas UDFs) must not silently serialize when fed a small or
freshly-collected input — so they call ``fan_out`` first.

``fan_out`` is a round-robin repartition (no key → no skew) and a
no-op when the input is already parallel enough, so it costs nothing
in the large-scan case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_fraction: float = 0.5) -> DataFrame:
    """Repartition to the session's default parallelism when the
    current layout uses less than ``min_fraction`` of it."""
    target = df.sparkSession.sparkContext.defaultParallelism
    current = df.rdd.getNumPartitions()
    if current >= max(1, int(target * min_fraction)):
        return df
    return df.repartition(target)
