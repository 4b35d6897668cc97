"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

SF0001 = "/root/testdata/sf0.001"

_SHIPPED: set[int] = set()


def _ensure_shipped(spark: SparkSession) -> None:
    """Ship the package to executors (addPyFile zip).

    Python workers resolve UDF closures by module import; they don't
    see the driver's sys.path mutation. Zipping the package onto the
    Spark files path is the same mechanism a real cluster deployment
    uses — makes pandas-UDF operators work regardless of cwd/session.
    """
    if id(spark) in _SHIPPED:
        return
    import tempfile
    import zipfile

    pkg_dir = "/root/repo/lakehouse_dba_tools_spark"
    zpath = tempfile.mktemp(prefix="lakehouse_dba_tools_spark_", suffix=".zip")
    with zipfile.ZipFile(zpath, "w") as zf:
        import os

        for root, _dirs, files in os.walk(pkg_dir):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    rel = os.path.relpath(full, "/root/repo")
                    zf.write(full, rel)
    spark.sparkContext.addPyFile(zpath)
    _SHIPPED.add(id(spark))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: query-fleet rollup — ingest events, extract JSON props,
    dedup latest per user (W1/W2), roll up per event_type."""
    from pyspark.sql import functions as F

    from lakehouse_dba_tools_spark.operators.dedup import latest_per_group
    from lakehouse_dba_tools_spark.operators.flatten import json_field
    from lakehouse_dba_tools_spark.sources.tables import load_table

    _ensure_shipped(spark)
    ev = load_table(spark, SF0001, "events")
    ev = json_field(ev, "props", "k", alias="k_str")
    latest = latest_per_group(ev, ["user_id"], "ts", tie_break=["event_id"])
    return latest.groupBy("event_type").agg(
        F.count("*").alias("n_users_latest"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.sum(F.col("k_str").cast("bigint")).alias("sum_k"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from lakehouse_dba_tools_spark import registry

    registry.load_all()

    def shipped(fn: Callable[[SparkSession, str], DataFrame]):
        def wrapper(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_shipped(spark)
            return fn(spark, sf_dir)

        wrapper.__name__ = getattr(fn, "__name__", "query")
        return wrapper

    return {name: shipped(fn) for name, fn in registry.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from lakehouse_dba_tools_spark import registry

    registry.load_all()
    return dict(registry.ORACLE)
