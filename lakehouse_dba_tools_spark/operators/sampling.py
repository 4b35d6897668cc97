"""Deterministic sampling & dataset splitting for training pipelines.

Randomness is derived from a content hash (md5 of key + salt), not an
RNG: splits are (a) reproducible under any partitioning/retry, (b)
stable when the dataset grows (a row's split never changes), and
(c) expressible identically in any engine with md5 — so even the
"random" sample has an exact relational oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_uniform(key: Column, salt: str) -> Column:
    """Deterministic uniform [0,1) from md5(key || salt) — first 8 hex
    digits / 16^8. Engine-portable (md5 is md5 everywhere)."""
    h = F.md5(F.concat(key.cast("string"), F.lit(salt)))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / float(16**8)


def train_val_test_split(
    df: DataFrame,
    key_col: str,
    weights: tuple[float, float, float] = (0.8, 0.1, 0.1),
    salt: str = "split-v1",
    split_col: str = "split",
) -> DataFrame:
    """Assign train/val/test by hashed key — no shuffle, no RNG state."""
    u = hash_uniform(F.col(key_col), salt)
    train_w, val_w, _ = weights
    return df.withColumn(
        split_col,
        F.when(u < train_w, "train").when(u < train_w + val_w, "val").otherwise("test"),
    )


def stratified_sample_topn(
    df: DataFrame, strata_cols: list[str], n_per_stratum: int, key_col: str, salt: str = "sample-v1"
) -> DataFrame:
    """Exactly-n-per-class deterministic sample: rank rows within each
    stratum by their hash and keep the first n. One shuffle on the
    strata; reproducible and oracle-expressible (unlike reservoir
    sampling, whose result depends on encounter order)."""
    rank_key = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    w = Window.partitionBy(*strata_cols).orderBy(rank_key, F.col(key_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_stratum)
        .drop("_rn")
    )
