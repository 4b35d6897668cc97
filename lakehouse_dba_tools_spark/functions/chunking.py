"""Document chunking — overlapping token-window segmentation for
LLM-context preparation. Pure column algebra: sequence+transform builds
chunk indices per row, explode emits one row per chunk; no UDF, fully
parallel, linear in output size."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lakehouse_dba_tools_spark.functions.text import tokens


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """(doc_id, chunk_idx, chunk_text, n_chunk_tokens): sliding windows
    of ``chunk_tokens`` tokens advancing by ``chunk_tokens - overlap``.
    The last chunk may be short; every token appears in ≥1 chunk."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    staged = df.select(F.col(id_col), tokens(text_col).alias("_toks"))
    n = F.size("_toks")
    n_chunks = F.greatest(F.ceil((n - F.lit(overlap)) / stride), F.lit(1)).cast("int")
    idx = F.sequence(F.lit(0), n_chunks - 1)
    chunks = F.transform(
        idx,
        lambda i: F.struct(
            i.cast("int").alias("chunk_idx"),
            F.concat_ws(" ", F.slice("_toks", i * stride + 1, chunk_tokens)).alias("chunk_text"),
            F.least(n - i * stride, F.lit(chunk_tokens)).alias("n_chunk_tokens"),
        ),
    )
    return (
        staged.select(id_col, F.explode(chunks).alias("c"))
        .select(id_col, "c.chunk_idx", "c.chunk_text", "c.n_chunk_tokens")
    )
