"""Nested-struct flattening & derived columns (reference P2, P3, F1).

The reference flattens its REST payloads with a SQL struct splat
``select *, channel_used.*, metrics.*`` (`tasks/Query History API to
Delta_withmetrics.py:215`) and derives human timestamps from epoch
millis with ``from_unixtime(ms/1000)`` (QH:219-221).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def splat_structs(df: DataFrame, struct_cols: Sequence[str], drop: bool = True) -> DataFrame:
    """Promote the fields of each struct column to top level (P2)."""
    cols: list = ["*"]
    for sc in struct_cols:
        cols.append(F.col(f"{sc}.*"))
    out = df.select(*cols)
    if drop:
        out = out.drop(*struct_cols)
    return out


def flatten_all(df: DataFrame, sep: str = "_") -> DataFrame:
    """Recursively flatten every struct column, prefixing field names.

    Generalizes P2 for arbitrarily nested ingest records; column name
    collisions are avoided by the parent-prefix (the reference's splat
    would collide instead).
    """
    while True:
        struct_fields = [f for f in df.schema.fields if isinstance(f.dataType, T.StructType)]
        if not struct_fields:
            return df
        cols = []
        for f in df.schema.fields:
            if isinstance(f.dataType, T.StructType):
                cols.extend(
                    F.col(f"`{f.name}`.`{sub.name}`").alias(f"{f.name}{sep}{sub.name}")
                    for sub in f.dataType.fields
                )
            else:
                cols.append(F.col(f"`{f.name}`"))
        df = df.select(*cols)


def with_epoch_timestamps(
    df: DataFrame, ms_cols: dict[str, str], keep_string_form: bool = False
) -> DataFrame:
    """Derive timestamp columns from epoch-millis columns (P3/F1).

    ``ms_cols`` maps source epoch-ms column → new column name. The
    reference uses ``from_unixtime(ms/1000)`` which yields a STRING;
    we default to ``timestamp_millis`` (exact TimestampType, no
    second-truncation) and offer the string form for parity.
    """
    for src, dst in ms_cols.items():
        if keep_string_form:
            df = df.withColumn(dst, F.from_unixtime(F.col(src) / 1000))
        else:
            df = df.withColumn(dst, F.timestamp_millis(F.col(src).cast("long")))
    return df


def json_field(df: DataFrame, json_col: str, field: str, alias: str | None = None) -> DataFrame:
    """Extract one field from a JSON string column (F4: json_tuple /
    get_json_object)."""
    return df.withColumn(alias or field, F.get_json_object(F.col(json_col), f"$.{field}"))


def compat_alias(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """P13 dup-column compatibility shim: expose old column names as
    aliases of renamed ones (reference keeps `queryid`+`query_id`
    side-by-side for downstream readers). One projection, no copy."""
    out = df
    for new, old in mapping.items():
        out = out.withColumn(new, F.col(old))
    return out


def sort_by_ordinal(df: DataFrame, ordinals: list[int], ascending: bool | list[bool] = True) -> DataFrame:
    """O1 ordinal ORDER BY (`ORDER BY 1, 2`): sort by 1-based column
    positions — the reference's SQL habit mapped onto the DataFrame API."""
    cols = [df.columns[i - 1] for i in ordinals]
    if isinstance(ascending, bool):
        ascending = [ascending] * len(cols)
    exprs = [F.col(c) if a else F.col(c).desc() for c, a in zip(cols, ascending)]
    return df.orderBy(*exprs)


def to_json_struct(df: DataFrame, cols: list[str], alias: str = "json") -> DataFrame:
    """Serialize columns into one JSON-string column (F10,
    ``to_json(struct(...))`` — reference TPC:2307-2309). The inverse of
    the S1 ingest path; stays a single JVM-side projection."""
    return df.withColumn(alias, F.to_json(F.struct(*[F.col(c) for c in cols])))
