"""Vectorized vector kernels: Arrow-batched pandas UDFs over numpy.

The JVM column algebra in similarity/vector.py is right for single
dot products inside oracle-checked queries (deterministic sequential
fold). For *batch* geometry — projecting every vector onto P
hyperplanes, scoring 10⁵-10⁶ candidate pairs — a 1000-node Catalyst
expression tree of literal arrays is interpreted per row and becomes
the bottleneck; one numpy matmul per Arrow batch is the scale path
(BLAS, zero per-row overhead).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def multi_table_bucket_udf(planes: np.ndarray) -> Column:
    """planes: (n_tables, n_planes, dim) → UDF: vec → array<long> of one
    sign-pattern bucket key per table."""
    n_tables, n_planes, _ = planes.shape
    flat = planes.reshape(n_tables * n_planes, -1)  # (T*P, dim)
    weights = (1 << np.arange(n_planes, dtype=np.int64))

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def bucket(vecs: pd.Series) -> pd.Series:
        X = np.array(vecs.tolist(), dtype=np.float64)  # (n, dim)
        bits = (X @ flat.T >= 0).reshape(len(X), n_tables, n_planes)
        keys = (bits * weights).sum(axis=2)  # (n, T)
        return pd.Series(list(keys))

    return bucket


def nearest_centroids_udf(centroids: np.ndarray, nprobe: int) -> Column:
    """centroids: (C, dim) → UDF: vec → array<int> of nprobe nearest
    centroid ids by cosine (vectors assumed L2-normalized).
    Deterministic tie-break: lower centroid id wins."""
    C = np.asarray(centroids, dtype=np.float64)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def nearest(vecs: pd.Series) -> pd.Series:
        X = np.array(vecs.tolist(), dtype=np.float64)
        sims = np.round(X @ C.T, 9)  # (n, C); round → stable ordering
        order = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe].astype(np.int32)
        return pd.Series(list(order))

    return nearest


@F.pandas_udf(T.DoubleType())
def pair_dot(a: pd.Series, b: pd.Series) -> pd.Series:
    """Batch dot product for candidate-pair scoring."""
    A = np.array(a.tolist(), dtype=np.float64)
    B = np.array(b.tolist(), dtype=np.float64)
    return pd.Series(np.einsum("ij,ij->i", A, B))
