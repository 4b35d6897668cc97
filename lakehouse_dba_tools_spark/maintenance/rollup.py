"""Incrementally-maintained rollups (the hypertable/materialized-agg
pattern).

The reference re-aggregates from scratch on every scheduled run
(`tasks/Query History API to Delta_withmetrics.py:18-22` rerun-window
model). The scale-correct form keeps a PARTIAL-AGGREGATE table —
per-group (count, exact sums) — and folds each new batch into it:

    refresh cost ∝ |delta| + |rollup|,   not |history|

Re-aggregatable state only (count/sum/min/max — avg derives as sum/n
at read time), so merging partials is itself a groupBy-sum: the same
map-side-combine hash aggregate Spark already optimizes. Sums are
EXACT decimal(38,12) (`functions/stable.py`): merge order across
refreshes cannot perturb results, which is what makes
incremental == full-recompute an equality, not an approximation.

At 100 TB: the delta aggregate shuffles |delta's groups|, the merge
shuffles |rollup| — both orders of magnitude below the fact table. The
rollup table itself should be bucketed by the group keys so the merge
co-locates without a shuffle (see SCALE.md bucketing notes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lakehouse_dba_tools_spark.functions.stable import DEC


def build_rollup(df: DataFrame, keys: list[str], measures: list[str]) -> DataFrame:
    """Partial-aggregate frame: (keys…, n_rows, sum_<m> exact decimal,
    min_<m>, max_<m>)."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for m in measures:
        aggs.append(F.sum(F.col(m).cast(DEC)).alias(f"sum_{m}"))
        aggs.append(F.min(m).alias(f"min_{m}"))
        aggs.append(F.max(m).alias(f"max_{m}"))
    return df.groupBy(*keys).agg(*aggs)


def merge_rollups(
    existing: DataFrame, delta: DataFrame, keys: list[str], measures: list[str]
) -> DataFrame:
    """Fold a delta's partial aggregates into the standing rollup."""
    aggs = [F.sum("n_rows").alias("n_rows")]
    for m in measures:
        aggs.append(F.sum(f"sum_{m}").alias(f"sum_{m}"))
        aggs.append(F.min(f"min_{m}").alias(f"min_{m}"))
        aggs.append(F.max(f"max_{m}").alias(f"max_{m}"))
    return existing.unionByName(delta).groupBy(*keys).agg(*aggs)


def incremental_rollup(
    df: DataFrame,
    keys: list[str],
    measures: list[str],
    batch_condition_cols: list,
) -> DataFrame:
    """Build a rollup by successive refreshes over disjoint batches.

    ``batch_condition_cols`` — list of boolean Columns partitioning the
    input (must be exhaustive + disjoint). Simulates the arrival
    schedule; each batch folds in via `merge_rollups`.
    """
    rollup: DataFrame | None = None
    for cond in batch_condition_cols:
        delta = build_rollup(df.filter(cond), keys, measures)
        rollup = delta if rollup is None else merge_rollups(rollup, delta, keys, measures)
    assert rollup is not None, "need at least one batch"
    return rollup


def rollup_report(
    rollup: DataFrame, keys: list[str], measures: list[str], scale: int = 2
) -> DataFrame:
    """Read-time finalization: rounded sums + derived avgs as doubles."""
    cols = [F.col(k) for k in keys] + [F.col("n_rows")]
    for m in measures:
        cols.append(F.round(F.col(f"sum_{m}"), scale).cast("double").alias(f"sum_{m}"))
        cols.append(
            F.round(
                F.col(f"sum_{m}").cast("double") / F.col("n_rows"), 4
            ).alias(f"avg_{m}")
        )
        cols.append(F.col(f"min_{m}"))
        cols.append(F.col(f"max_{m}"))
    return rollup.select(*cols)


def incremental_join_delta(
    a_old: DataFrame,
    delta_a: DataFrame,
    b_old: DataFrame,
    delta_b: DataFrame,
    on: list[str],
) -> DataFrame:
    """Insert-only IVM for an inner equi-join.

    The classic delta algebra: with A' = A ∪ ΔA and B' = B ∪ ΔB,

        A'⋈B' = A⋈B  ∪  ΔA⋈B  ∪  A⋈ΔB  ∪  ΔA⋈ΔB

    so the VIEW refresh only computes the three delta joins — cost
    ∝ |Δ| × match rate, never |A⋈B|. At 100 TB the deltas are the
    small sides: Catalyst broadcasts them against the standing tables
    (or, with both sides bucketed on the key, all three joins
    co-locate shuffle-free — same discipline as merge_upsert).
    Complements the partial-aggregate rollup maintenance above: joins
    via delta algebra, aggregates via re-aggregatable partials.
    """
    return (
        delta_a.join(b_old, on)
        .unionByName(a_old.join(delta_b, on))
        .unionByName(delta_a.join(delta_b, on))
    )


def incremental_join_retract(
    old_view: DataFrame,
    a_new: DataFrame,
    del_a: DataFrame,
    b_old: DataFrame,
    del_b: DataFrame,
    on: list[str],
) -> DataFrame:
    """Deletion-aware IVM for an inner equi-join (multiset semantics).

    With A = A' ⊎ ∇A and B = B' ⊎ ∇B (∇ = deleted rows), the removals
    from the standing view A⋈B are

        ∇A⋈B  ⊎  A'⋈∇B

    (the second term uses the NEW A' so the ∇A⋈∇B intersection is not
    subtracted twice), and the refreshed view is

        A'⋈B' = (A⋈B) exceptAll removals.

    exceptAll is multiset-exact (duplicate join rows retract one-for-
    one). Cost ∝ |view| + |∇|·match — the view re-shuffles once for
    the exceptAll, which is the honest price of retraction without a
    keyed state store; insert-only pipelines should prefer
    incremental_join_delta. ``b_old`` is the pre-deletion B.
    """
    removals = del_a.join(b_old, on).unionByName(a_new.join(del_b, on))
    return old_view.exceptAll(removals)
