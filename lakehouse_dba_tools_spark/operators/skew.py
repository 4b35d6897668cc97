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
