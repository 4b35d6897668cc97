"""Schema reconciliation (reference EP:157-183, rebuilt structurally).

The reference hand-rolls schema evolution by querying ``DESCRIBE`` rows
as data, full-outer-joining destination vs incoming column names, and
string-splicing a dynamic ``INSERT ... SELECT`` with ``null as c`` /
``'' as c`` padding (`tasks/Endpoint_History_Status_ETL.py:157-183`).
Semantics:

- column in BOTH         → passthrough
- column only in DEST    → pad source with NULL
- column only in SOURCE  → dropped (unless evolution allowed)

We reimplement over ``StructType`` set-diffs + ``unionByName(
allowMissingColumns=True)`` — same semantics, no string codegen, no
driver ``toPandas()`` collect (EP:171,177), and type-aware NULL padding
instead of the reference's untyped ``null as``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class SchemaDiff:
    matched: list[str] = field(default_factory=list)
    only_in_dest: list[str] = field(default_factory=list)
    only_in_source: list[str] = field(default_factory=list)


def diff_schemas(dest: DataFrame, source: DataFrame) -> SchemaDiff:
    """Column-name diff, case-insensitive like the metastore (EP:166-177)."""
    d = {f.name.lower(): f.name for f in dest.schema.fields}
    s = {f.name.lower(): f.name for f in source.schema.fields}
    return SchemaDiff(
        matched=[d[k] for k in d if k in s],
        only_in_dest=[d[k] for k in d if k not in s],
        only_in_source=[s[k] for k in s if k not in d],
    )


def conform_to_schema(source: DataFrame, dest: DataFrame, allow_new_columns: bool = False) -> DataFrame:
    """Project ``source`` into ``dest``'s schema (EP's INSERT projection).

    Missing-in-source columns become typed NULLs; extra source columns
    are dropped unless ``allow_new_columns`` (the autoMerge analog,
    QH:35) — then they're appended after the destination columns.
    """
    diff = diff_schemas(dest, source)
    src_lower = {f.name.lower(): f.name for f in source.schema.fields}
    dest_types = {f.name.lower(): f.dataType for f in dest.schema.fields}
    cols = []
    for f in dest.schema.fields:
        k = f.name.lower()
        if k in src_lower:
            cols.append(F.col(f"`{src_lower[k]}`").cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(dest_types[k]).alias(f.name))
    if allow_new_columns:
        cols.extend(F.col(f"`{c}`") for c in diff.only_in_source)
    return source.select(*cols)


def append_with_reconcile(dest: DataFrame, source: DataFrame, allow_new_columns: bool = False) -> DataFrame:
    """dest ∪ conformed(source) — the EP append, as one unionByName."""
    conformed = conform_to_schema(source, dest, allow_new_columns=allow_new_columns)
    return dest.unionByName(conformed, allowMissingColumns=allow_new_columns)
