"""Cascade delete / right-to-be-forgotten propagation.

The lakehouse deletion problem: a small set of root entities must
disappear from every downstream fact table that references them,
directly or transitively. The reference handles point deletes only via
MERGE semantics (`tasks/Query History API to Delta_withmetrics.py:
244-250`); this operator generalizes to a keyed cascade across a
foreign-key DAG, returning both the surviving frames and an audit
report — the pair a compliance pipeline needs (apply + prove).

Scale shapes:
- The root forget-set is tiny (thousands of users against billions of
  rows): every direct child prunes via a BROADCAST semi/anti join — no
  fact shuffle at all.
- Transitive hops (lineitem ← deleted orders) key on a derived set
  that GROWS with fan-out; `Edge.broadcast=False` lets AQE pick
  shuffle strategy once the derived key set stops being dim-sized.
  Either way only key columns cross any exchange.
- Nothing collects: the audit is a union of 1-row aggregates.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Edge:
    """FK hop: child rows die when child_col ∈ deleted parent's parent_col."""

    parent: str
    parent_col: str
    child: str
    child_col: str
    broadcast: bool = True


def cascade_delete(
    tables: dict[str, DataFrame],
    root: str,
    root_condition: Column,
    edges: list[Edge],
) -> tuple[dict[str, DataFrame], dict[str, DataFrame]]:
    """Propagate deletion of root rows matching ``root_condition``.

    ``edges`` must be topologically ordered (parents before children).
    Returns (survivors, deleted) — both lazy DataFrames per table.
    """
    deleted: dict[str, DataFrame] = {root: tables[root].filter(root_condition)}
    keys_used: dict[str, tuple[str, bool]] = {}
    for e in edges:
        pkeys = (
            deleted[e.parent]
            .select(F.col(e.parent_col).alias(e.child_col))
            .distinct()
        )
        if e.broadcast:
            pkeys = F.broadcast(pkeys)
        deleted[e.child] = tables[e.child].join(pkeys, e.child_col, "left_semi")
        keys_used[e.child] = (e.child_col, e.broadcast)

    survivors: dict[str, DataFrame] = {}
    for t, dead in deleted.items():
        if t == root:
            survivors[t] = tables[t].filter(~root_condition)
        else:
            key, bcast = keys_used[t]
            dead_keys = dead.select(key).distinct()
            if bcast:
                dead_keys = F.broadcast(dead_keys)
            survivors[t] = tables[t].join(dead_keys, key, "left_anti")
    return survivors, deleted


def deletion_audit(
    tables: dict[str, DataFrame], deleted: dict[str, DataFrame]
) -> DataFrame:
    """(table, rows_before, rows_deleted, rows_after) — pure aggregates,
    no driver-side counting."""
    reports = []
    for t in sorted(deleted):
        before = tables[t].agg(F.count(F.lit(1)).alias("rows_before"))
        dead = deleted[t].agg(F.count(F.lit(1)).alias("rows_deleted"))
        reports.append(
            before.crossJoin(dead).select(
                F.lit(t).alias("table_name"),
                "rows_before",
                "rows_deleted",
                (F.col("rows_before") - F.col("rows_deleted")).alias("rows_after"),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out
