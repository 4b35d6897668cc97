"""Skew-safe aggregation via key salting.

AQE's skew-join splitting handles join-side skew; aggregation over a
hot key still funnels every row of that key through one reducer when a
non-decomposable aggregate blocks partial aggregation. Salting splits
each key into ``n_salts`` sub-keys, aggregates partials per sub-key,
then merges — two small shuffles instead of one skewed one.

For decomposable aggregates (sum/count/min/max) Spark's map-side
partial aggregation already neutralizes skew; salting matters for
``collect_list``/``countDistinct``-style aggregates or extreme
single-key distributions. The operator keeps the decomposed form
explicit so callers supply (partial, merge) pairs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Sequence[Column],
    merge_aggs: Sequence[Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``partial_aggs`` aggregate within (keys, salt); ``merge_aggs``
    combine the partials per key. Each partial must alias the column
    its merge expression consumes.

    Example (count + sum):
        salted_agg(df, ["k"],
                   [F.count("*").alias("_n"), F.sum("v").alias("_s")],
                   [F.sum("_n").alias("n"), F.sum("_s").alias("total")])
    """
    salted = df.withColumn("_salt", (F.rand(seed=0) * n_salts).cast("int"))
    partial = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*merge_aggs)


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    keys: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the skewed side, replicate the other.

    Each skewed-side row gets one random salt in ``[0, n_salts)``; the
    other side is replicated once per salt value, and the join runs on
    ``keys + [_salt]`` — a hot key's rows spread across ``n_salts``
    reducers instead of funneling through one. Every (skewed, other)
    row pair still matches exactly once (the skewed row's single salt
    meets exactly one replica), so the result is identical to the
    plain join for ``inner`` and ``left`` semantics.

    When to use over the automatic paths: AQE's skew-split only fires
    on sort-merge joins at runtime and cannot help when the skewed key
    feeds a later partitioning-preserving stage, when AQE is off
    (streaming micro-batches), or in stream-static joins. Salting
    fixes the split at plan time. Cost: the other side shuffles
    ``n_salts``× — use for moderate-size right sides only; a
    broadcast-able right side never needs salting at all.

    ``right``/``full`` are rejected: an unmatched other-side key would
    surface once per replica (n_salts duplicate null-extended rows).
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: "
            "right/full would duplicate unmatched replicated rows"
        )
    salted = skewed.withColumn("_salt", (F.rand(seed=0) * n_salts).cast("int"))
    replicated = other.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted.join(replicated, [*keys, "_salt"], how).drop("_salt")
