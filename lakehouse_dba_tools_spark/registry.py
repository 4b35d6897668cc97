"""Shared query registry: name → Spark callable (+ optional DuckDB
oracle SQL). Query modules register into this; ``__spark_entry__``
exports it to the driver."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every query module (registration side effects)."""
    from lakehouse_dba_tools_spark import (  # noqa: F401
        queries,
        queries_advanced,
        queries_collections,
        queries_datagen,
        queries_etl,
        queries_functions,
        queries_ingest,
        queries_lakehouse,
        queries_modern,
        queries_observability,
        queries_ops,
        queries_streaming,
        queries_subqueries,
        queries_text,
        queries_tpch,
        queries_vector,
    )
