"""Approximate & exact nearest-neighbor search over embedding columns.

Three tiers:

- ``brute_topk``: exact cosine top-k, query-set × corpus join + window
  rank. The baseline — correct at any scale the cross product affords
  (broadcast the query side; the corpus never moves).
- ``lsh_topk``: random-hyperplane LSH — corpus bucketed by sign
  pattern; queries probe their own bucket (+ optional multi-probe by
  flipping low-margin bits). Sub-linear candidate sets; the 100 TB
  path. Deterministic: hyperplanes from a seeded numpy RNG, shipped
  as literal arrays (JVM-evaluated, no UDF).
- ``ivf_topk``: inverted-file variant — corpus assigned to the nearest
  of C centroids (kmeans-lite trained on a sample), queries probe
  ``nprobe`` nearest centroids. Classic IVF-Flat layout.

All scoring is JVM array math (similarity/vector.py); pandas UDFs are
deliberately absent from the hot path.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lakehouse_dba_tools_spark.similarity.vector import as_double, cosine, dot, l2_norm, l2_normalize


def brute_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query (query_id, neighbor_id, sim, rank).

    The small side (queries) broadcasts; the corpus streams through one
    stage, so this scales with corpus size × |queries| — never shuffle
    the corpus itself. Ranking on ROUND(sim, 9) with id tie-break keeps
    top-k deterministic under fp noise.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), l2_normalize(as_double(vec_col)).alias("_cv")
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"), l2_normalize(as_double(vec_col)).alias("_qv")
    )
    scored = c.join(F.broadcast(q), F.lit(True)).select(
        "query_id",
        "neighbor_id",
        F.round(dot(F.col("_cv"), F.col("_qv")), 9).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("sim"), "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def _bucket_expr(vec, planes: list[list[float]]):
    """Sign-pattern bucket id: bit_i = (vec · plane_i) >= 0."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = (dot(vec, plane) >= 0).cast("long")
        bucket = bucket + F.shiftleft(bit, i)
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_planes: int = 8,
    n_tables: int = 4,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Random-hyperplane LSH ANN: equi-join on (table, bucket) replaces
    the cross join. Multiple independent tables recover recall lost to
    unlucky planes. Returns ≤k approx neighbors per query.
    """
    c = corpus.select(F.col(id_col).alias("neighbor_id"), l2_normalize(as_double(vec_col)).alias("_cv"))
    q = queries.select(F.col(query_id_col).alias("query_id"), l2_normalize(as_double(vec_col)).alias("_qv"))

    c_keys, q_keys = [], []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + t)
        c_keys.append(F.struct(F.lit(t).alias("t"), _bucket_expr(F.col("_cv"), planes).alias("b")))
        q_keys.append(F.struct(F.lit(t).alias("t"), _bucket_expr(F.col("_qv"), planes).alias("b")))
    c_b = c.select("neighbor_id", "_cv", F.explode(F.array(*c_keys)).alias("tb"))
    q_b = q.select("query_id", "_qv", F.explode(F.array(*q_keys)).alias("tb"))

    cand = (
        c_b.join(q_b, c_b.tb == q_b.tb)
        .select("query_id", "neighbor_id", "_cv", "_qv")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id", "neighbor_id", F.round(dot(F.col("_cv"), F.col("_qv")), 9).alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("sim"), "rank")
    )


def train_centroids(
    corpus: DataFrame, n_centroids: int = 16, vec_col: str = "embedding",
    sample_fraction: float = 1.0, iters: int = 5, seed: int = 42,
) -> list[list[float]]:
    """kmeans-lite on a driver-side sample (IVF coarse quantizer).

    The sample (≤ ~100k rows) is the ONLY data that touches the driver;
    assignment of the full corpus stays distributed in ivf_topk.
    """
    pdf = (
        corpus.select(l2_normalize(as_double(vec_col)).alias("v"))
        .sample(fraction=sample_fraction, seed=seed)
        .limit(100_000)
        .toPandas()
    )
    X = np.array(pdf["v"].tolist(), dtype=np.float64)
    rng = np.random.default_rng(seed)
    cents = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(iters):
        sims = X @ cents.T
        assign = sims.argmax(axis=1)
        for j in range(len(cents)):
            members = X[assign == j]
            if len(members):
                m = members.mean(axis=0)
                cents[j] = m / (np.linalg.norm(m) or 1.0)
    return cents.tolist()


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF-Flat: corpus partitioned by nearest centroid; queries probe
    the ``nprobe`` nearest lists. Join is an equi-join on centroid id."""
    cents = train_centroids(corpus, n_centroids, vec_col, seed=seed)

    def nearest(vec, n: int):
        scored = F.array(
            *[
                F.struct(
                    F.round(dot(vec, F.array(*[F.lit(float(x)) for x in c])), 9).alias("s"),
                    F.lit(i).alias("c"),
                )
                for i, c in enumerate(cents)
            ]
        )
        top = F.slice(F.reverse(F.array_sort(scored)), 1, n)
        return F.transform(top, lambda x: x["c"])

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), l2_normalize(as_double(vec_col)).alias("_cv")
    ).withColumn("cid", nearest(F.col("_cv"), 1)[0])
    q = queries.select(
        F.col(query_id_col).alias("query_id"), l2_normalize(as_double(vec_col)).alias("_qv")
    ).withColumn("cid", F.explode(nearest(F.col("_qv"), nprobe)))

    scored = c.join(q, "cid").select(
        "query_id", "neighbor_id", F.round(dot(F.col("_cv"), F.col("_qv")), 9).alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("sim"), "rank")
    )


def embedding_near_dups(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 8,
    n_tables: int = 4,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b, sim ≥ threshold)
    via the same hyperplane-LSH bucketing (self-join form)."""
    v = df.select(F.col(id_col).alias("_id"), l2_normalize(as_double(vec_col)).alias("_v"))
    keys = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + t)
        keys.append(F.struct(F.lit(t).alias("t"), _bucket_expr(F.col("_v"), planes).alias("b")))
    b = v.select("_id", "_v", F.explode(F.array(*keys)).alias("tb"))
    a_side = b.select(F.col("_id").alias("id_a"), F.col("_v").alias("va"), "tb")
    b_side = b.select(F.col("_id").alias("id_b"), F.col("_v").alias("vb"), "tb")
    cand = (
        a_side.join(b_side, (a_side.tb == b_side.tb) & (F.col("id_a") < F.col("id_b")))
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.select("id_a", "id_b", F.round(dot(F.col("va"), F.col("vb")), 6).alias("sim"))
        .filter(F.col("sim") >= threshold)
    )
