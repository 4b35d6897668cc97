"""Iterative graph algorithms as DataFrame loops: PageRank.

Web-corpus curation ranks documents/domains by link-graph centrality
(PageRank/harmonic centrality) as a quality prior; the reference has
no graph operator, so this is an extension tier alongside
connected-components (`dedup/components.py`).

Scale shape: each power iteration is one shuffle (groupBy dst) plus a
broadcast-able per-node merge — the edge list never moves to the
driver. Determinism: every iteration's rank is rounded to 12 decimal
places, which absorbs double-summation order noise (~1e-16 per add)
so repeated runs — and an unrolled SQL oracle computing the same
formula — produce bit-identical ranks. For deep iteration counts,
`checkpoint_every` truncates the lineage with localCheckpoint exactly
like the CC min-label loop (dedup/components.py:51-128).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
    checkpoint_every: int = 8,
    materialize_edges: bool = True,
) -> DataFrame:
    """Power-iteration PageRank over a directed edge list.

    Simplified (dangling mass dropped) formulation — the one every
    unrolled-SQL oracle can state exactly:

        rank0(v)   = 1 / N
        rank_i(v)  = (1-d)/N + d * sum over in-edges (u,v) of
                     rank_{i-1}(u) / outdeg(u)

    Returns (node, rank) for every node appearing as src or dst.
    Ranks are rounded to 12 dp each iteration (see module docstring).
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    # The edge list appears in every iteration's contribution join AND
    # feeds nodes/outdeg — without materialization an expensive edge
    # derivation (e.g. a fact-table self-join) recomputes once per
    # appearance in the final plan. localCheckpoint computes it once
    # and truncates lineage, same discipline as the CC min-label loop.
    if materialize_edges:
        e = e.localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    # 1-row broadcast count stamp (repo convention: no driver collect
    # for scalars that feed the plan)
    n_df = nodes.agg(F.count("*").alias("n_nodes"))
    nodes = nodes.crossJoin(F.broadcast(n_df))
    if materialize_edges:
        # reused by every iteration's rank merge (left join) + init
        nodes = nodes.localCheckpoint()
    outdeg = e.groupBy("src").agg(F.count("*").alias("deg"))
    contrib_src = e.join(outdeg, "src")

    r = nodes.withColumn("rank", F.lit(1.0) / F.col("n_nodes"))
    for i in range(iterations):
        contribs = (
            contrib_src.join(
                r.select(F.col("node").alias("src"), "rank"), "src"
            )
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("in_mass"))
        )
        r = (
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .select(
                "node",
                "n_nodes",
                F.round(
                    (1.0 - damping) / F.col("n_nodes")
                    + damping * F.coalesce(F.col("in_mass"), F.lit(0.0)),
                    12,
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            r = r.localCheckpoint()
    return r.select("node", "rank")
