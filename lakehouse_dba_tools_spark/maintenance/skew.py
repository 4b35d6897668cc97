"""Join/agg key-skew diagnostics — the DBA pre-flight for every shuffle.

The reference's DBA workflow sizes warehouses by inspecting query
history volume (`resources/import_dbsql_pricing.csv`, QH metrics); the
Spark-native analog of that capacity question is "how skewed are my
shuffle keys?" — the single best predictor of a straggling join at
100 TB. This profiler answers it with one keys-only shuffle:

    scan → project key → hash-agg count per key (map-side combine)
         → 1-row reduce of the frequency distribution

The exchange carries (key, partial_count) pairs only. The 1-row summary
(max/avg frequency, skew ratio) is what you read before deciding
between a plain shuffle join, salting, or AQE skew-join handling; the
`heavy_hitters` top-k names the keys to salt.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_skew_profile(df: DataFrame, key: str, label: str | None = None) -> DataFrame:
    """1-row frequency-distribution summary for ``key``.

    skew_ratio = max_freq / avg_freq: ~1 means uniform keys, large
    means a hot key that will straggle any shuffle partitioned on it.
    """
    freqs = df.groupBy(key).agg(F.count("*").alias("_freq"))
    return freqs.agg(
        F.lit(label or key).alias("key_col"),
        F.sum("_freq").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_keys"),
        F.max("_freq").cast("long").alias("max_freq"),
        F.round(F.sum("_freq") / F.count("*"), 4).alias("avg_freq"),
        F.round(F.max("_freq") * F.count("*") / F.sum("_freq"), 4).alias("skew_ratio"),
    )


def heavy_hitters(df: DataFrame, key: str, k: int = 10) -> DataFrame:
    """Top-k hottest keys (the salting candidates): (key, freq)."""
    return (
        df.groupBy(key)
        .agg(F.count("*").alias("freq"))
        .orderBy(F.col("freq").desc(), F.col(key))
        .limit(k)
    )


def skew_report(profiles: list[DataFrame]) -> DataFrame:
    """Union per-key profiles into one report table."""
    out = profiles[0]
    for p in profiles[1:]:
        out = out.unionByName(p)
    return out
