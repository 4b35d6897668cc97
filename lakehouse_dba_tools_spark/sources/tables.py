"""Catalog/table helpers (reference S5, D14).

The reference probes table existence with try/except around
``spark.read.table`` (`tasks/Query History API to
Delta_withmetrics.py:49-56`) and reads managed tables by name. Here the
"warehouse" for tests is a directory of parquet files, so we expose a
uniform loader that registers each table as a temp view — the same name
set the DuckDB oracle uses.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Columns historically stored as parquet TIMESTAMP(NANOS): Spark's
# reader has no ns type, so the session sets nanosAsLong and we convert
# here. Fixture values carry raw ns precision, so ns→µs must truncate
# with INTEGER division — float64 division has ~256ns ULP at 2024 epochs
# and rounds ~12% of rows 1µs off vs DuckDB's integer truncation.
# Current fixtures store timestamp[us] isAdjustedToUTC=false, which
# Spark 4 reads as TIMESTAMP_NTZ — normalize_timestamps handles that.
NS_TIMESTAMP_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def normalize_timestamps(df: DataFrame) -> DataFrame:
    """Cast TIMESTAMP_NTZ columns to session-tz TIMESTAMP.

    The fixtures are UTC-naive and every caller pins the session tz to
    UTC, so the cast is value-preserving; it restores the dtype the rest
    of the engine (epoch casts, windows, watermarks) was built against.
    NTZ cannot be cast to DOUBLE in Spark 4, so leaving it leaks type
    errors into every ``ts.cast("double")`` epoch computation.
    """
    ntz = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    if ntz:
        df = df.select(
            *[
                F.col(c).cast("timestamp").alias(c) if c in ntz else F.col(c)
                for c in df.columns
            ]
        )
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan of one table; Catalyst handles pushdown/pruning."""
    # Runtime-settable SQL confs: tolerate sessions we didn't build (the
    # driver constructs its own SparkSession). UTC keeps date_format /
    # window bucketing aligned with the UTC-naive parquet fixtures.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name in NS_TIMESTAMP_COLS:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for c in NS_TIMESTAMP_COLS.get(name, ()):
        if c in df.columns and dict(df.dtypes)[c] == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return normalize_timestamps(df)


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> dict[str, DataFrame]:
    out: dict[str, DataFrame] = {}
    for name in names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            out[name] = load_table(spark, sf_dir, name)
    return out


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> dict[str, DataFrame]:
    """Register every table as a temp view (oracle-parity names)."""
    dfs = load_tables(spark, sf_dir, names)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


def table_exists(spark: SparkSession, name: str) -> bool:
    """Existence probe; reference uses try/except read.table (QH:49-56)."""
    return spark.catalog.tableExists(name)
