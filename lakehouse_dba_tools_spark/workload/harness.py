"""Concurrent SQL workload harness — the dbstress rebuild.

The reference reads a folder of .sql files, strips comments, generates
YAML units and drives N parallel JDBC connections × M repeats through
an external JVM tool (`evaluation_tools/dbstress__Current.py:93-175`),
then CSV-ingests the latency results
(`evaluation_tools/ETL_dbstress_results.py:2-10`).

Rebuilt natively: SQL units (from strings or a directory of .sql
files, comments stripped) run through a thread pool against the
SparkSession — Spark's scheduler interleaves the concurrent jobs the
way a SQL endpoint would — with per-run wall-clock capture into a
results DataFrame ready for percentile analysis.
"""

from __future__ import annotations

import glob
import os
import re
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass
class SqlUnit:
    """One stress unit (reference yaml: unit_name, query, parallel
    connections, repeats — DBS:108-118)."""

    name: str
    sql: str
    parallel: int = 2
    repeats: int = 2


_COMMENT_RE = re.compile(r"--[^\n]*|/\*.*?\*/", re.DOTALL)


def strip_sql_comments(sql: str) -> str:
    """Comment stripping (reference uses sqlparse.format(strip_comments),
    DBS:128-137)."""
    return _COMMENT_RE.sub("", sql).strip().rstrip(";")


def load_sql_units(
    directory: str, parallel: int = 2, repeats: int = 2
) -> list[SqlUnit]:
    """A folder of .sql files → units, deterministic order (DBS:93-103)."""
    units = []
    for path in sorted(glob.glob(os.path.join(directory, "*.sql"))):
        with open(path) as fh:
            sql = strip_sql_comments(fh.read())
        units.append(SqlUnit(os.path.splitext(os.path.basename(path))[0], sql, parallel, repeats))
    return units


RESULT_SCHEMA = T.StructType(
    [
        T.StructField("unit_name", T.StringType()),
        T.StructField("conn_id", T.IntegerType()),
        T.StructField("run_idx", T.IntegerType()),
        T.StructField("duration_ms", T.DoubleType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("status", T.StringType()),
        T.StructField("error", T.StringType()),
    ]
)


def run_workload(
    spark: SparkSession, units: list[SqlUnit], unit_parallel: int = 1,
    retries: int = 0,
) -> DataFrame:
    """Execute every unit with its own parallel×repeats schedule; return
    the latency results table.

    ``unit_parallel`` > 1 additionally overlaps DIFFERENT units (the
    reference's dbstress runs its unit list against a warehouse that
    serves other tenants concurrently — cross-unit overlap is the
    realistic load shape, and Spark's scheduler interleaves the jobs
    exactly as a SQL endpoint would). Results are identical either
    way; only wall-clock and the latency columns change.

    ``retries``: re-attempts per failed run before recording ``error``
    (the dbstress posture — a unit is re-tried, never silently lost to
    a transient broadcast/executor hiccup on a loaded host; a REAL
    semantic error fails every attempt and still surfaces). Retried
    runs report total wall including failed attempts."""
    rows: list[tuple] = []

    def one_run(unit: SqlUnit, conn_id: int, run_idx: int) -> tuple:
        t0 = time.time()
        last_err: Exception | None = None
        for _ in range(retries + 1):
            try:
                n = spark.sql(unit.sql).count()
                return (unit.name, conn_id, run_idx, (time.time() - t0) * 1000, n, "ok", None)
            except Exception as e:  # noqa: BLE001 — harness records, never raises
                last_err = e
        return (unit.name, conn_id, run_idx, (time.time() - t0) * 1000, 0, "error", str(last_err)[:200])

    if unit_parallel <= 1:
        for unit in units:
            with ThreadPoolExecutor(max_workers=unit.parallel) as pool:
                futures = [
                    pool.submit(one_run, unit, c, r)
                    for c in range(unit.parallel)
                    for r in range(unit.repeats)
                ]
                rows.extend(f.result() for f in futures)
    else:
        # cross-unit overlap: one pool sized to the aggregate target;
        # each unit still contributes parallel×repeats runs
        workers = max(unit_parallel, max(u.parallel for u in units))
        with ThreadPoolExecutor(max_workers=workers) as pool:
            futures = [
                pool.submit(one_run, unit, c, r)
                for unit in units
                for c in range(unit.parallel)
                for r in range(unit.repeats)
            ]
            rows.extend(f.result() for f in futures)
    return spark.createDataFrame(rows, RESULT_SCHEMA)


def latency_summary(results: DataFrame) -> DataFrame:
    """Per-unit latency rollup (p50/p95 via percentile_approx — the
    analysis the reference runs over its ingested CSVs)."""
    return results.groupBy("unit_name").agg(
        F.count("*").alias("n_runs"),
        F.sum((F.col("status") == "ok").cast("long")).alias("n_ok"),
        F.min("n_rows").alias("min_rows"),
        F.max("n_rows").alias("max_rows"),
        F.round(F.percentile_approx("duration_ms", 0.5), 1).alias("p50_ms"),
        F.round(F.percentile_approx("duration_ms", 0.95), 1).alias("p95_ms"),
    )
