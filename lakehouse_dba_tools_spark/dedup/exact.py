"""Exact & canonical-form dedup — the cheap first pass of every corpus
pipeline.

Hash-groupBy on a content digest: one shuffle on the digest, map-side
partial aggregation. At 100 TB the digest (16 bytes) shuffles, never the
document bodies — project doc_id + md5 BEFORE the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lakehouse_dba_tools_spark.functions.text import normalized_text


def content_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", normalize: bool = False
) -> DataFrame:
    """One row per distinct content: keeper id (min), copy count."""
    key = normalized_text(text_col) if normalize else F.col(text_col)
    return (
        df.select(F.md5(key).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keeper_id"), F.count("*").alias("n_copies"))
    )


def drop_exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", normalize: bool = False
) -> DataFrame:
    """Keep the min-id row per distinct content (deterministic survivor)."""
    key = normalized_text(text_col) if normalize else F.col(text_col)
    keepers = (
        df.select(F.md5(key).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return df.join(keepers, on=id_col, how="left_semi")
