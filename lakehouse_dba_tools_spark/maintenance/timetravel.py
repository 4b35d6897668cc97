"""Time-travel reads + change-data-feed analog for parquet locations.

The reference gets `VERSION AS OF` and `table_changes()` from Delta's
transaction log (the same log `DESCRIBE HISTORY` reads —
`resources/TPC-datagen-notebook.scala:2168-2183`). Plain parquet
overwrites destroy history, so the engine's emulation writes each
version into an immutable `_v{N}` subdirectory and records it in the
same commit log `maintenance/history.py` keeps (one commit per
version). Honest-boundary notes, like the rest of the no-Delta story:

- Old versions consume storage until `vacuum_versions` (Delta shares
  unchanged files between versions; this emulation snapshots whole
  versions — right semantics, coarser physical granularity).
- `table_changes` derives inserts/deletes by set difference between
  two versions (`exceptAll` both ways). An UPDATE therefore appears as
  a delete+insert pair — Delta CDF without `update_preimage` tagging.

Scale: version resolution is a driver-side log read (O(commits));
`read_as_of` is an ordinary parquet scan of one version directory, so
pruning/pushdown work as usual; `table_changes` is two anti-join-like
set differences that shuffle only the two versions being compared,
never the whole history.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_dba_tools_spark.maintenance.history import (
    _log_path,
    read_log,
    record_commit,
)


def _version_dir(table_path: str, version: int) -> str:
    return os.path.join(table_path, f"_v{version}")


def write_version(df: DataFrame, table_path: str, operation: str = "WRITE") -> int:
    """Write ``df`` as the table's next immutable version; returns the
    version number. The commit is recorded AFTER a successful write so
    a failed write never becomes a readable version.

    Crash-safe: the parquet lands in a `_tmp_v{N}` staging dir and is
    RENAMED into `_v{N}` (atomic on one filesystem) only when complete.
    A `_v{N}` dir present on disk but absent from the log is an orphan
    from a crash between rename and record_commit — it is removed and
    the version slot reused, so a half-failed write can never wedge the
    table on `errorifexists`."""
    import shutil

    entries = read_log(table_path)
    version = max((e["version"] for e in entries), default=-1) + 1
    target = _version_dir(table_path, version)
    if os.path.isdir(target):
        # on-disk but not in the log ⇒ orphaned partial commit
        shutil.rmtree(target)
    staging = os.path.join(table_path, f"_tmp_v{version}")
    if os.path.isdir(staging):
        shutil.rmtree(staging)
    df.write.mode("overwrite").parquet(staging)
    os.rename(staging, target)
    record_commit(
        table_path,
        operation,
        num_output_rows=df.count(),
        parameters={"version_dir": f"_v{version}"},
    )
    return version


def latest_version(table_path: str) -> int:
    entries = read_log(table_path)
    if not entries:
        raise FileNotFoundError(f"no versions at {table_path}")
    return max(e["version"] for e in entries)


def read_as_of(
    spark: SparkSession, table_path: str, version: int | None = None
) -> DataFrame:
    """`SELECT * FROM t VERSION AS OF n` analog: scan exactly the
    requested version's directory."""
    if version is None:
        version = latest_version(table_path)
    target = _version_dir(table_path, version)
    if not os.path.isdir(target):
        raise FileNotFoundError(f"version {version} not found at {table_path}")
    return spark.read.parquet(target)


def table_changes(
    spark: SparkSession, table_path: str, from_version: int, to_version: int
) -> DataFrame:
    """CDF analog: rows that changed between two versions, tagged with
    `_change_type` ('insert' | 'delete'); an update is a delete+insert
    pair. Multiset semantics via exceptAll, so duplicate rows diff
    correctly."""
    old = read_as_of(spark, table_path, from_version)
    new = read_as_of(spark, table_path, to_version)
    inserts = new.exceptAll(old).withColumn("_change_type", F.lit("insert"))
    deletes = old.exceptAll(new).withColumn("_change_type", F.lit("delete"))
    return inserts.unionByName(deletes)


def vacuum_versions(table_path: str, keep_last: int = 1) -> list[int]:
    """Drop all but the newest ``keep_last`` version directories
    (retention enforcement — VACUUM's storage reclaim for this
    emulation). The commit log keeps the full history metadata."""
    import shutil

    entries = read_log(table_path)
    versions = sorted({e["version"] for e in entries})
    doomed = versions[:-keep_last] if keep_last > 0 else versions
    removed = []
    for v in doomed:
        target = _version_dir(table_path, v)
        if os.path.isdir(target):
            shutil.rmtree(target)
            removed.append(v)
    return removed
