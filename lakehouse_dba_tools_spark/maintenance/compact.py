"""Layout-maintenance verbs: OPTIMIZE / ZORDER / VACUUM / ANALYZE
analogs over parquet (reference D9-D13).

Without a table format's transaction log these are rewrite operations;
the knobs match what the reference tunes:

- ``optimize_compact``  ≈ OPTIMIZE (QH:256): bin-pack small files to a
  target size.
- ``optimize_cluster``  ≈ OPTIMIZE ZORDER BY (TPC:1978-2033): co-locate
  rows by key columns. True Z-ordering interleaves bits of multiple
  keys; ``repartitionByRange`` + ``sortWithinPartitions`` over the key
  tuple gives lexicographic clustering — the same file-skipping win on
  leading keys, built from open primitives. Parquet min/max stats per
  row group then serve as the skip index.
- ``vacuum_staging``    ≈ VACUUM (TPC:2076-2092): remove leftover
  staging/temp dirs.
- ``analyze_table``     ≈ ANALYZE TABLE COMPUTE STATISTICS (QH:260):
  materialize table/column stats for planning (feeds CBO via catalog
  when tables are managed; returned as a report DF here).
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_dba_tools_spark.maintenance.audit import column_stats_report

TARGET_FILE_BYTES = 128 * 1024 * 1024


def _estimate_partitions(path: str, target_bytes: int) -> int:
    files = glob.glob(os.path.join(path, "*.parquet")) or ([path] if os.path.isfile(path) else [])
    total = sum(os.path.getsize(f) for f in files)
    return max(1, round(total / target_bytes))


def optimize_compact(
    spark: SparkSession, path: str, out_path: str | None = None, target_bytes: int = TARGET_FILE_BYTES
) -> str:
    """Bin-pack a parquet location into ~target-size files."""
    out_path = out_path or path
    n = _estimate_partitions(path, target_bytes)
    df = spark.read.parquet(path)
    staging = out_path.rstrip("/") + "._compact"
    df.coalesce(n).write.mode("overwrite").parquet(staging)
    if os.path.exists(out_path) and out_path != staging:
        shutil.rmtree(out_path, ignore_errors=True)
    os.rename(staging, out_path)
    from lakehouse_dba_tools_spark.maintenance.history import record_commit

    record_commit(out_path, "OPTIMIZE", parameters={"target_bytes": target_bytes})
    return out_path


def optimize_cluster(
    spark: SparkSession,
    path: str,
    cluster_by: list[str],
    out_path: str | None = None,
    num_files: int | None = None,
) -> str:
    """Cluster rows by key columns (ZORDER-analog): range-partition on
    the leading key, sort within files by the full tuple → tight
    per-row-group min/max stats → file/row-group skipping on those keys.
    """
    out_path = out_path or path
    df = spark.read.parquet(path)
    n = num_files or _estimate_partitions(path, TARGET_FILE_BYTES)
    clustered = (
        df.repartitionByRange(n, *[F.col(c) for c in cluster_by])
        .sortWithinPartitions(*cluster_by)
    )
    staging = out_path.rstrip("/") + "._cluster"
    clustered.write.mode("overwrite").parquet(staging)
    if os.path.exists(out_path) and out_path != staging:
        shutil.rmtree(out_path, ignore_errors=True)
    os.rename(staging, out_path)
    from lakehouse_dba_tools_spark.maintenance.history import record_commit

    record_commit(out_path, "OPTIMIZE ZORDER", parameters={"cluster_by": cluster_by})
    return out_path


def vacuum_staging(path: str) -> list[str]:
    """Remove leftover staging dirs from interrupted rewrites."""
    removed = []
    for suffix in ("._staging", "._compact", "._cluster", "._checkpoint"):
        p = path.rstrip("/") + suffix
        if os.path.exists(p):
            shutil.rmtree(p, ignore_errors=True)
            removed.append(p)
    return removed


def analyze_table(spark: SparkSession, df: DataFrame, approx: bool = True) -> DataFrame:
    """Column statistics for planning/reporting (ANALYZE analog)."""
    return column_stats_report(df, approx_distinct=approx)
