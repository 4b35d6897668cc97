"""Range (interval) join — point-in-interval matching at scale.

Spark plans a naive ``l.ts BETWEEN r.start AND r.end`` join as a
broadcast-nested-loop / cartesian filter: O(|L|·|R|). The scale
strategy is bucketization: quantize the range dimension into
fixed-width buckets, explode each interval into the buckets it
overlaps, equi-join points to buckets, then apply the exact predicate
as a residual filter. Shuffle is on (key, bucket) — linear in inputs +
overlap, like DuckDB/Trino's range-join optimizations.

Bucket width trades explosion factor (intervals spanning many buckets)
against bucket population; pick ~median interval length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    by: list[str] | None = None,
    bucket_width_sec: float = 3600.0,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to interval rows with start <= point <= end
    (plus optional equi-keys ``by``). Columns must not collide.

    Inner-only: the exact range predicate is applied as a residual
    filter AFTER the bucket equi-join, and bucket explosion duplicates
    interval rows — null-extended outer rows would be dropped by the
    filter and unmatched rows double-counted, silently collapsing any
    outer variant to inner semantics. An outer range join needs a
    different construction (bucket join + anti-join backfill).
    """
    if how != "inner":
        raise ValueError(
            f"range_join supports how='inner' only (got {how!r}); outer variants "
            "need anti-join backfill of unmatched rows, not a post-join filter"
        )
    by = by or []
    # Rename every interval column: points and intervals often derive
    # from the same source frame, and same-lineage attributes make the
    # join condition resolve ambiguously (trivially true).
    i = intervals
    renames = {c: f"_iv_{c}" for c in i.columns}
    for old, new in renames.items():
        i = i.withColumnRenamed(old, new)
    r_start, r_end = renames[start_col], renames[end_col]

    p = points.withColumn("_bkt", F.floor(F.col(point_col).cast("double") / bucket_width_sec))
    i = i.withColumn(
        "_ibkt",
        F.explode(
            F.sequence(
                F.floor(F.col(r_start).cast("double") / bucket_width_sec),
                F.floor(F.col(r_end).cast("double") / bucket_width_sec),
            )
        ),
    )
    cond = (F.col("_bkt") == F.col("_ibkt"))
    for c in by:
        cond = cond & (F.col(c) == F.col(renames[c]))
    exact: Column = (F.col(point_col) >= F.col(r_start)) & (F.col(point_col) <= F.col(r_end))
    joined = p.join(i, cond, how).filter(exact)
    keep = [*points.columns] + [renames[c] for c in intervals.columns if c not in by]
    out = joined.select(*keep)
    for c in intervals.columns:
        if c not in by:
            out = out.withColumnRenamed(renames[c], c)
    return out
