"""Metadata & statistics audits — the reference's operational test
strategy as engine operators.

Rebuilds (Delta-free, over parquet + catalog):
- row-count / partition verification (`resources/TPC-datagen-notebook.scala:1929-1956`)
- DESCRIBE DETAIL-style file/size audit (TPC:1855-1883) from parquet
  footers via pyarrow
- transposed column-stats report (DESCRIBE EXTENDED pivot, TPC:2121-2151)
  computed as ONE distributed aggregation pass (no per-column jobs, no
  DESCRIBE text parsing)
"""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lakehouse_dba_tools_spark.operators.unions import union_all


def rowcount_report(dfs: dict[str, DataFrame]) -> DataFrame:
    """Per-table row counts, one job via tagged union-fold (TPC A1/U2)."""
    frames = [
        df.groupBy().agg(F.count("*").alias("n_rows")).select(F.lit(name).alias("table_name"), "n_rows")
        for name, df in dfs.items()
    ]
    return union_all(frames)


def file_detail_report(spark: SparkSession, paths: dict[str, str]) -> DataFrame:
    """DESCRIBE DETAIL analog for parquet locations: file count, bytes,
    row-group rows from footers (driver-side metadata read — footers
    only, no data scan)."""
    import pyarrow.parquet as pq

    rows = []
    for name, path in paths.items():
        files = sorted(_glob.glob(os.path.join(path, "*.parquet"))) or (
            [path] if os.path.isfile(path) else []
        )
        n_bytes = sum(os.path.getsize(f) for f in files)
        n_rows = sum(pq.read_metadata(f).num_rows for f in files)
        rows.append((name, len(files), n_bytes, n_rows))
    schema = T.StructType(
        [
            T.StructField("table_name", T.StringType()),
            T.StructField("num_files", T.IntegerType()),
            T.StructField("size_bytes", T.LongType()),
            T.StructField("num_rows", T.LongType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


NUMERIC_TYPES = (T.LongType, T.IntegerType, T.DoubleType, T.FloatType, T.ShortType)


def column_stats_report(df: DataFrame, approx_distinct: bool = True) -> DataFrame:
    """Transposed per-column stats (min/max/nulls/distinct) — the
    reference's DESCRIBE EXTENDED pivot, recomputed as one wide
    aggregation then unpivoted. ``approx_distinct`` uses HLL
    (approx_count_distinct) — the scale default; exact countDistinct
    forces per-column expand.
    """
    aggs = []
    for f in df.schema.fields:
        c = F.col(f"`{f.name}`")
        distinct = (
            F.approx_count_distinct(c) if approx_distinct else F.countDistinct(c)
        )
        aggs.append(
            F.struct(
                F.lit(f.name).alias("column_name"),
                F.lit(f.dataType.simpleString()).alias("data_type"),
                # min/max in the column's NATIVE ordering, stringified
                # after (string-cast first would sort lexicographically).
                F.min(c).cast("string").alias("min_value"),
                F.max(c).cast("string").alias("max_value"),
                F.sum(c.isNull().cast("long")).alias("num_nulls"),
                distinct.cast("long").alias("num_distinct"),
            ).alias(f.name)
        )
    wide = df.agg(*aggs)
    stacked = wide.select(F.explode(F.array(*[F.col(f"`{f.name}`") for f in df.schema.fields])).alias("s"))
    return stacked.select("s.*")
