"""Catalog DDL wrappers (reference D1-D5, D14).

The reference issues DDL as SQL text with f-string identifiers
(`tasks/Query History API to Delta_withmetrics.py:76,105-143`). These
wrappers go through the same SQL surface (works against any metastore)
but validate identifiers and return structured results via
``spark.catalog`` instead of parsing SHOW/DESCRIBE text output.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*(\.[A-Za-z_][A-Za-z0-9_]*)?$")


def _check_ident(name: str) -> str:
    if not _IDENT.match(name):
        raise ValueError(f"invalid identifier: {name!r}")
    return name


def create_database(spark: SparkSession, name: str, location: str | None = None) -> None:
    """CREATE DATABASE IF NOT EXISTS [LOCATION] (D1, TPC:1626-1635)."""
    loc = f" LOCATION '{location}'" if location else ""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {_check_ident(name)}{loc}")


def drop_database(spark: SparkSession, name: str, cascade: bool = False) -> None:
    spark.sql(f"DROP DATABASE IF EXISTS {_check_ident(name)}{' CASCADE' if cascade else ''}")


def create_table_if_not_exists(spark: SparkSession, name: str, ddl_columns: str) -> None:
    """CREATE TABLE IF NOT EXISTS with a column DDL string (D2, QH:105-143)."""
    spark.sql(f"CREATE TABLE IF NOT EXISTS {_check_ident(name)} ({ddl_columns}) USING parquet")


def table_exists(spark: SparkSession, name: str) -> bool:
    """Existence probe (D14) — catalog API, not try/except-read."""
    return spark.catalog.tableExists(_check_ident(name))


def list_tables(spark: SparkSession, database: str | None = None) -> DataFrame:
    """SHOW TABLES as a structured frame (D3, TPC:334-338)."""
    tables = spark.catalog.listTables(database) if database else spark.catalog.listTables()
    schema = T.StructType(
        [
            T.StructField("namespace", T.StringType()),
            T.StructField("table_name", T.StringType()),
            T.StructField("is_temporary", T.BooleanType()),
        ]
    )
    rows = [(".".join(t.namespace or []), t.name, t.isTemporary) for t in tables]
    return spark.createDataFrame(rows, schema)


def create_table_as(spark: SparkSession, name: str, df: DataFrame, replace: bool = True) -> None:
    """CTAS (S10, EP:183): create-or-replace a managed table from a
    DataFrame — the engine form of ``create or replace table ... as
    select``."""
    _check_ident(name)
    writer = df.write.format("parquet")
    if replace:
        writer.mode("overwrite").saveAsTable(name)
    else:
        writer.mode("errorifexists").saveAsTable(name)


def insert_into(spark: SparkSession, name: str, df: DataFrame, by_name: bool = True) -> None:
    """INSERT INTO ... SELECT (S11, EP:181). ``by_name=True`` aligns
    columns by name (the reconcile-safe default); positional otherwise
    (the reference's dynamic column-list INSERT relied on generated
    ordering)."""
    _check_ident(name)
    if by_name:
        # project into the target's column order first — insertInto is
        # positional, the reference's generated-ordering trap (EP:181)
        df = df.select(*spark.table(name).columns)
    df.write.mode("append").insertInto(name)


def register_external_table(
    spark: SparkSession,
    name: str,
    location: str,
    fmt: str = "parquet",
    partitioned_by: list[str] | None = None,
    ddl_columns: str | None = None,
) -> None:
    """CREATE TABLE ... USING fmt LOCATION path + MSCK REPAIR (S15,
    TPC:1767-1778): register existing files as a catalog table and
    discover Hive-style partitions (required for non-transactional
    formats before partition pruning can work)."""
    _check_ident(name)
    if partitioned_by:
        if not ddl_columns:
            raise ValueError("partitioned external tables need explicit ddl_columns")
        cols = ", ".join(partitioned_by)
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {name} ({ddl_columns}) USING {fmt} "
            f"PARTITIONED BY ({cols}) LOCATION '{location}'"
        )
        spark.sql(f"MSCK REPAIR TABLE {name}")
    else:
        spark.sql(f"CREATE TABLE IF NOT EXISTS {name} USING {fmt} LOCATION '{location}'")


def show_partitions(spark: SparkSession, name: str) -> DataFrame:
    """SHOW PARTITIONS as a frame (D4/A2, TPC:342-350,1940)."""
    _check_ident(name)
    return spark.sql(f"SHOW PARTITIONS {name}")


def describe_columns(spark: SparkSession, name: str) -> DataFrame:
    """DESCRIBE as a structured frame (D5) — schema introspection via
    catalog, replacing the reference's DESCRIBE-text filtering
    (`tasks/Endpoint_History_Status_ETL.py:160-164`)."""
    cols = spark.catalog.listColumns(_check_ident(name))
    schema = T.StructType(
        [
            T.StructField("col_name", T.StringType()),
            T.StructField("data_type", T.StringType()),
            T.StructField("nullable", T.BooleanType()),
        ]
    )
    return spark.createDataFrame([(c.name, c.dataType, c.nullable) for c in cols], schema)
