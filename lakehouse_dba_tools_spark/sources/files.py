"""File sources (reference S2, S3, S4, S14).

- ``read_csv_inferred``: header + type inference
  (`evaluation_tools/ETL_dbstress_results.py:2`).
- ``read_csv_declared``: pipe-delimited generator output with the
  reference's exotic option set and the trailing-delimiter shim
  (`resources/TPC-datagen-notebook.scala:1705-1720`).
- ``read_csv_via_pandas``: small-file pandas bridge
  (`tasks/import_dbsql_pricing.py:7-11`) — Arrow-backed conversion.
- ``write_text``: raw text sink with compression
  (`resources/TPC-datagen-notebook.scala:1689-1695`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_csv_inferred(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.csv(path, header=True, inferSchema=True)


def read_csv_declared(
    spark: SparkSession,
    path: str,
    ddl_schema: str,
    delimiter: str = "|",
    date_format: str = "yyyy-MM-dd",
    timestamp_format: str = "yyyy-MM-dd HH:mm:ss",
    charset: str = "iso-8859-1",
    trailing_delimiter: bool = True,
) -> DataFrame:
    """Declared-schema CSV scan with the TPC generator's option set.

    ``trailing_delimiter`` reproduces the dummy-last-column trick for
    rows that end with the delimiter (TPC:1713-1720): parse with one
    extra string column, then drop it.
    """
    schema = ddl_schema + ", _trailing string" if trailing_delimiter else ddl_schema
    df = (
        spark.read.option("delimiter", delimiter)
        .option("mode", "PERMISSIVE")
        .option("emptyValue", "")
        .option("charset", charset)
        .option("dateFormat", date_format)
        .option("timestampFormat", timestamp_format)
        .schema(schema)
        .csv(path)
    )
    return df.drop("_trailing") if trailing_delimiter else df


def read_csv_via_pandas(spark: SparkSession, path: str) -> DataFrame:
    import pandas as pd

    return spark.createDataFrame(pd.read_csv(path))


def write_text(df: DataFrame, path: str, compression: str | None = None) -> None:
    writer = df.write.mode("overwrite")
    if compression:
        writer = writer.option("compression", compression)
    writer.text(path)
