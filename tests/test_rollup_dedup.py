"""Incremental rollup maintenance + streaming dedup invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_dba_tools_spark.maintenance.rollup import (
    build_rollup,
    incremental_rollup,
    merge_rollups,
    rollup_report,
)
from lakehouse_dba_tools_spark.sources.tables import load_table


def _report_rows(df, keys):
    return sorted(
        (tuple(r[k] for k in keys), r["n_rows"], r["sum_value"], r["avg_value"])
        for r in df.collect()
    )


def test_incremental_equals_full_recompute(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    full = rollup_report(
        build_rollup(ev, ["event_type"], ["value"]), ["event_type"], ["value"]
    )
    inc = rollup_report(
        incremental_rollup(
            ev,
            ["event_type"],
            ["value"],
            [F.col("event_id") % 4 == i for i in range(4)],
        ),
        ["event_type"],
        ["value"],
    )
    assert _report_rows(full, ["event_type"]) == _report_rows(inc, ["event_type"])


def test_merge_is_batch_order_invariant(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    parts = [
        build_rollup(ev.filter(F.col("event_id") % 3 == i), ["event_type"], ["value"])
        for i in range(3)
    ]
    ab_c = merge_rollups(
        merge_rollups(parts[0], parts[1], ["event_type"], ["value"]),
        parts[2],
        ["event_type"],
        ["value"],
    )
    c_ba = merge_rollups(
        merge_rollups(parts[2], parts[1], ["event_type"], ["value"]),
        parts[0],
        ["event_type"],
        ["value"],
    )
    a = _report_rows(rollup_report(ab_c, ["event_type"], ["value"]), ["event_type"])
    b = _report_rows(rollup_report(c_ba, ["event_type"], ["value"]), ["event_type"])
    assert a == b  # exact decimal partials: merge order cannot matter


def test_delta_refresh_only_aggregates_delta(spark, sf_dir):
    """Plan pin: refreshing with a delta must scan/aggregate the delta
    and the standing rollup — never re-scan prior batches. With the
    standing rollup materialized (in practice: read back from its
    table), the merge plan contains exactly one events scan (the
    delta's)."""
    ev = load_table(spark, sf_dir, "events")
    standing = build_rollup(
        ev.filter(F.col("event_id") % 2 == 0), ["event_type"], ["value"]
    )
    standing = spark.createDataFrame(standing.collect(), standing.schema)
    delta = build_rollup(
        ev.filter(F.col("event_id") % 2 == 1), ["event_type"], ["value"]
    )
    merged = merge_rollups(standing, delta, ["event_type"], ["value"])
    plan = merged._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 1


def test_streaming_dedup_drops_redelivery(spark, sf_dir):
    from lakehouse_dba_tools_spark.streaming.dedup import dedup_within_watermark
    from lakehouse_dba_tools_spark.streaming.windows import (
        run_stream_to_table,
        stream_events,
    )

    base = load_table(spark, sf_dir, "events").count()
    doubled = stream_events(spark, sf_dir).union(stream_events(spark, sf_dir))
    dd = dedup_within_watermark(doubled, ["event_id"], watermark="24 hours")
    agg = dd.groupBy().agg(F.count("*").alias("n"))
    out = run_stream_to_table(agg, spark)
    assert out.collect()[0]["n"] == base


def test_incremental_join_delta_identity(spark):
    """A'⋈B' == A⋈B ∪ deltas, including duplicate-key multiplicities."""
    from lakehouse_dba_tools_spark.maintenance.rollup import incremental_join_delta

    a_old = spark.createDataFrame([(1, "a1"), (2, "a2"), (2, "a2x")], ["k", "av"])
    d_a = spark.createDataFrame([(2, "a3"), (3, "a4")], ["k", "av"])
    b_old = spark.createDataFrame([(1, "b1"), (2, "b2")], ["k", "bv"])
    d_b = spark.createDataFrame([(2, "b3"), (3, "b4"), (9, "b5")], ["k", "bv"])
    full = sorted(
        tuple(r)
        for r in a_old.unionByName(d_a).join(b_old.unionByName(d_b), ["k"]).collect()
    )
    incr = sorted(
        tuple(r)
        for r in a_old.join(b_old, ["k"])
        .unionByName(incremental_join_delta(a_old, d_a, b_old, d_b, ["k"]))
        .collect()
    )
    assert incr == full


def test_incremental_join_retract_identity(spark):
    """Retraction is multiset-exact: duplicate join rows retract
    one-for-one, and the refreshed view equals the post-deletion
    from-scratch join."""
    from lakehouse_dba_tools_spark.maintenance.rollup import incremental_join_retract

    a = spark.createDataFrame(
        [(1, "a1"), (2, "a2"), (2, "a2"), (3, "a3")], ["k", "av"]
    )
    b = spark.createDataFrame([(1, "b1"), (2, "b2"), (3, "b3"), (3, "b3x")], ["k", "bv"])
    del_a = a.filter("k = 3")
    a_new = a.exceptAll(del_a)
    del_b = b.filter("bv = 'b2'")
    b_new = b.exceptAll(del_b)
    refreshed = sorted(
        tuple(r)
        for r in incremental_join_retract(
            a.join(b, ["k"]), a_new, del_a, b, del_b, ["k"]
        ).collect()
    )
    scratch = sorted(tuple(r) for r in a_new.join(b_new, ["k"]).collect())
    assert refreshed == scratch
    # the duplicate (2, 'a2') rows are both gone with b2 deleted
    assert all(r[0] != 2 for r in refreshed)
