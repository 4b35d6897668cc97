"""In-memory JSON-records source (reference S1, S7, P12).

The reference ingests paginated REST payloads by round-tripping through
``spark.read.json(sc.parallelize(json_strings))`` with a driver-side
walk that stringifies booleans first (`tasks/Query History API to
Delta_withmetrics.py:61-69,89-96,153-204`). We rebuild that as:

- ``records_to_df``: list-of-dicts → DataFrame with inferred (or
  declared) nested schema, optional bool normalization;
- ``paged_source``: a generator-of-pages source that parses each page
  into a DataFrame and returns ONE DataFrame via a single union fold —
  avoiding the reference's N-page-deep union chain built inside the
  loop (QH:225), which bloats the logical plan (SURVEY.md §3.1).

The reference also drops the final page because it breaks before
parsing when ``has_next_page`` is false (QH:187-188). We process the
page first and then stop — fixed divergence, documented here.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterable, Iterator
from functools import reduce
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def normalize_bools(obj: Any) -> Any:
    """Recursively replace bools with lowercase strings (QH:61-69).

    The reference does this so JSON schema inference never sees mixed
    bool/string columns across pages.
    """
    if isinstance(obj, bool):
        return str(obj).lower()
    if isinstance(obj, dict):
        return {k: normalize_bools(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [normalize_bools(v) for v in obj]
    return obj


def records_to_df(
    spark: SparkSession,
    records: list[dict[str, Any]],
    schema: T.StructType | str | None = None,
    stringify_bools: bool = False,
) -> DataFrame:
    """Parse a list of JSON-able records into a DataFrame.

    With ``schema=None`` the nested schema is inferred exactly as the
    reference's ``spark.read.json(sc.parallelize(...))`` does (QH:96).
    Prefer passing a declared schema in production — inference scans the
    data twice and is sensitive to missing/None-only fields.
    """
    if stringify_bools:
        records = [normalize_bools(r) for r in records]
    payload = [json.dumps(r) for r in records]
    rdd = spark.sparkContext.parallelize(payload or [""], max(1, len(payload) // 5000 + 1))
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if not payload:
        if schema is None:
            raise ValueError("empty record set requires an explicit schema")
        return spark.createDataFrame([], schema)
    return reader.json(rdd)


def paged_source(
    spark: SparkSession,
    pages: Iterable[list[dict[str, Any]]],
    schema: T.StructType | str | None = None,
    stringify_bools: bool = True,
    max_pages: int = 500,
    flatten: Callable[[DataFrame], DataFrame] | None = None,
) -> DataFrame:
    """Drain a page iterator into one DataFrame (reference S7 rebuilt).

    ``pages`` stands in for the REST pagination loop — any generator
    yielding lists of records (an HTTP client, a file tailer, a fixture).
    Unlike the reference we union once over the collected page frames
    (and by NAME, not position — SURVEY.md §7 risk 4), and we never drop
    the final page.
    """
    frames: list[DataFrame] = []
    it: Iterator[list[dict[str, Any]]] = iter(pages)
    for i, page in enumerate(it):
        if i >= max_pages:
            break
        if not page:
            continue
        df = records_to_df(spark, page, schema=schema, stringify_bools=stringify_bools)
        if flatten is not None:
            df = flatten(df)
        frames.append(df)
    if not frames:
        if schema is None:
            raise ValueError("no pages and no schema")
        return spark.createDataFrame([], schema)
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), frames)
