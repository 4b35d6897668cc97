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


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: query-fleet rollup — ingest events, extract JSON props,
    dedup latest per user (W1/W2), roll up per event_type."""
    from pyspark.sql import functions as F

    from lakehouse_dba_tools_spark.operators.dedup import latest_per_group
    from lakehouse_dba_tools_spark.operators.flatten import json_field
    from lakehouse_dba_tools_spark.sources.tables import load_table

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
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    from lakehouse_dba_tools_spark import registry

    registry.load_all()
    return dict(registry.ORACLE)
