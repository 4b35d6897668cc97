"""Declarative data-quality constraint checking (deequ-style, DBA tier).

The reference validates pipelines imperatively — row-count probes after
writes (`tasks/Query History API to Delta_withmetrics.py:252-258`) and
ad-hoc DESCRIBE audits. This operator generalizes that into a rule set
evaluated against a table, producing one report row per rule:
(rule, kind, n_rows, n_violations, passed).

Scale shapes:
- Every ROW-LEVEL rule (not_null / range / accepted_values / regex /
  custom predicate) folds into ONE aggregate pass — a single scan, one
  `sum(CASE WHEN violated)` column per rule, partial map-side combine,
  then a 1-row → long unpivot on the driver-free stack() path. Adding a
  rule adds a column to the agg, not a scan.
- `unique` needs its own hash aggregate on the key (the only rule class
  that shuffles data-proportional volume; the exchange carries just the
  key columns).
- `foreign_key` is a broadcast anti-join when the parent key set is
  dim-sized; at fact-fact scale flip `broadcast_parent=False` to let
  AQE/sort-merge handle it.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One constraint. ``kind`` picks the evaluation strategy."""

    name: str
    kind: str  # not_null | range | accepted_values | regex | predicate | unique | foreign_key
    col: str | None = None
    lo: float | None = None
    hi: float | None = None
    values: tuple = ()
    pattern: str | None = None
    predicate: str | None = None  # SQL expr that is TRUE for GOOD rows
    keys: tuple = ()
    parent: str | None = None  # parent-table name, resolved via `parents`
    parent_keys: tuple = ()  # parent-side column names, when they differ


def _violation(rule: Rule) -> Column:
    c = F.col(rule.col) if rule.col else None
    if rule.kind == "not_null":
        return c.isNull()
    if rule.kind == "range":
        bad = F.lit(False)
        if rule.lo is not None:
            bad = bad | (c < rule.lo)
        if rule.hi is not None:
            bad = bad | (c > rule.hi)
        return c.isNotNull() & bad
    if rule.kind == "accepted_values":
        return c.isNotNull() & ~c.isin(*rule.values)
    if rule.kind == "regex":
        return c.isNotNull() & ~c.rlike(rule.pattern)
    if rule.kind == "predicate":
        return ~F.expr(rule.predicate)
    raise ValueError(f"not a row-level rule: {rule.kind}")


ROW_LEVEL = {"not_null", "range", "accepted_values", "regex", "predicate"}


def check_constraints(
    df: DataFrame,
    rules: Sequence[Rule],
    parents: dict[str, DataFrame] | None = None,
    broadcast_parent: bool = True,
) -> DataFrame:
    """Evaluate ``rules`` → (rule, kind, n_rows, n_violations, passed)."""
    parents = parents or {}
    row_rules = [r for r in rules if r.kind in ROW_LEVEL]
    reports: list[DataFrame] = []

    if row_rules:
        agg = df.agg(
            F.count(F.lit(1)).alias("_n"),
            *[
                F.coalesce(
                    F.sum(_violation(r).cast("long")), F.lit(0)
                ).alias(f"_v{i}")
                for i, r in enumerate(row_rules)
            ],
        )
        stack_args = ", ".join(
            f"'{r.name}', '{r.kind}', _v{i}" for i, r in enumerate(row_rules)
        )
        reports.append(
            agg.selectExpr(
                f"stack({len(row_rules)}, {stack_args}) AS (rule, kind, n_violations)",
                "_n AS n_rows",
            ).select("rule", "kind", "n_rows", "n_violations")
        )

    for r in rules:
        if r.kind == "unique":
            # SQL UNIQUE-constraint semantics: a key containing NULL
            # never conflicts, so NULL-key groups contribute rows to
            # n_rows but zero violations (matches the oracle's
            # count(col) - count(DISTINCT col)).
            keys = list(r.keys or (r.col,))
            null_key = F.lit(False)
            for k in keys:
                null_key = null_key | F.col(k).isNull()
            per_key = df.select(*keys).groupBy(*keys).agg(F.count("*").alias("_c"))
            rep = per_key.agg(
                F.coalesce(F.sum("_c"), F.lit(0)).alias("n_rows"),
                F.coalesce(
                    F.sum(F.when(null_key, 0).otherwise(F.col("_c") - 1)),
                    F.lit(0),
                ).alias("n_violations"),
            ).select(
                F.lit(r.name).alias("rule"),
                F.lit("unique").alias("kind"),
                F.col("n_rows").cast("long"),
                F.col("n_violations").cast("long"),
            )
            reports.append(rep)
        elif r.kind == "foreign_key":
            parent = parents[r.parent]
            keys = list(r.keys or (r.col,))
            pkeys = list(r.parent_keys or keys)
            parent_keys = parent.select(
                *[F.col(p).alias(k) for k, p in zip(keys, pkeys)]
            ).distinct()
            if broadcast_parent:
                parent_keys = F.broadcast(parent_keys)
            orphans = df.select(*keys).na.drop(subset=keys).join(
                parent_keys, on=keys, how="left_anti"
            )
            rep = df.agg(F.count(F.lit(1)).alias("n_rows")).crossJoin(
                orphans.agg(F.count(F.lit(1)).alias("n_violations"))
            ).select(
                F.lit(r.name).alias("rule"),
                F.lit("foreign_key").alias("kind"),
                "n_rows",
                "n_violations",
            )
            reports.append(rep)
        elif r.kind not in ROW_LEVEL:
            raise ValueError(f"unknown rule kind: {r.kind}")

    out = reports[0]
    for rep in reports[1:]:
        out = out.unionByName(rep)
    return out.withColumn("passed", F.col("n_violations") == 0)
