from __future__ import annotations

import re

from pyspark.sql import functions as F

from lakehouse_dba_tools_spark.maintenance.bucketing import bucketed_join, write_bucketed
from lakehouse_dba_tools_spark.operators.scd2 import OPEN_TS, scd2_init, scd2_merge
from lakehouse_dba_tools_spark.sources.tables import load_table
from lakehouse_dba_tools_spark.streaming.joins import purchases_after_views


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """Same-bucketed tables must sort-merge join with ZERO exchanges —
    the write-time shuffle replaces every future join-time shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(
        orders.select(F.col("o_orderkey").alias("k"), "o_totalprice"), "b_orders", ["k"], 8
    )
    write_bucketed(
        li.select(F.col("l_orderkey").alias("k"), "l_quantity"), "b_lineitem", ["k"], 8
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bucketed_join(spark, "b_orders", "b_lineitem", on=["k"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def _dim(spark, rows):
    return spark.createDataFrame(rows, "k int, name string, score double")


def test_scd2_lifecycle(spark):
    b1 = _dim(spark, [(1, "a", 1.0), (2, "b", 2.0)])
    target = scd2_init(b1, ["k"], ["name", "score"], "2024-01-01 00:00:00")
    assert target.count() == 2

    # batch 2: k=1 changes, k=2 unchanged, k=3 new
    b2 = _dim(spark, [(1, "a", 9.0), (2, "b", 2.0), (3, "c", 3.0)])
    out = scd2_merge(target, b2, ["k"], ["name", "score"], "2024-02-01 00:00:00")
    rows = {(r.k, str(r.valid_from), str(r.valid_to)): (r.name, r.score) for r in out.collect()}
    assert len(rows) == 4
    # closed-out old version of k=1
    assert rows[(1, "2024-01-01 00:00:00", "2024-02-01 00:00:00")] == ("a", 1.0)
    # open new version of k=1
    assert rows[(1, "2024-02-01 00:00:00", OPEN_TS)] == ("a", 9.0)
    # k=2 untouched
    assert rows[(2, "2024-01-01 00:00:00", OPEN_TS)] == ("b", 2.0)
    # k=3 inserted
    assert rows[(3, "2024-02-01 00:00:00", OPEN_TS)] == ("c", 3.0)

    # batch 3: source missing k=2 → current row must survive; k=1 changes again
    b3 = _dim(spark, [(1, "a", 11.0)])
    out2 = scd2_merge(out, b3, ["k"], ["name", "score"], "2024-03-01 00:00:00")
    cur = {r.k: r.score for r in out2.filter(F.col("valid_to") == OPEN_TS).collect()}
    assert cur == {1: 11.0, 2: 2.0, 3: 3.0}
    hist_k1 = out2.filter((F.col("k") == 1) & (F.col("valid_to") != OPEN_TS)).count()
    assert hist_k1 == 2  # two closed versions of k=1


def test_scd2_null_tracking(spark):
    b1 = _dim(spark, [(1, None, 1.0)])
    target = scd2_init(b1, ["k"], ["name", "score"], "2024-01-01 00:00:00")
    # NULL == NULL must count as unchanged (eqNullSafe)
    b2 = _dim(spark, [(1, None, 1.0)])
    out = scd2_merge(target, b2, ["k"], ["name", "score"], "2024-02-01 00:00:00")
    assert out.count() == 1
    # NULL → value is a change
    b3 = _dim(spark, [(1, "x", 1.0)])
    out2 = scd2_merge(out, b3, ["k"], ["name", "score"], "2024-03-01 00:00:00")
    assert out2.count() == 2


def test_stream_stream_join_bounds(spark, sf_dir):
    from lakehouse_dba_tools_spark.streaming.windows import run_stream_to_table, stream_events

    ev_stream = stream_events(spark, sf_dir)
    got = run_stream_to_table(
        purchases_after_views(ev_stream, within="1 hour"), spark, mode="append"
    )
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").alias("p")
    v = ev.filter(F.col("event_type") == "view").alias("v")
    batch = p.join(
        v,
        (F.col("v.user_id") == F.col("p.user_id"))
        & (F.col("v.ts") <= F.col("p.ts"))
        & (F.col("p.ts") <= F.col("v.ts") + F.expr("INTERVAL 1 hour")),
    )
    assert got.count() == batch.count()
    # every attributed view strictly precedes (or equals) its purchase
    ids = {(r.purchase_id, r.view_id) for r in got.collect()}
    ts = {r.event_id: r.ts for r in ev.collect()}
    assert all(ts[vid] <= ts[pid] for pid, vid in ids)


def test_merge_upsert_bucketed_target_shuffles_only_source(spark, sf_dir):
    """The 100 TB MERGE story (SCALE.md): when the target is bucketed
    on the merge key, the anti-join reuses the target's layout — the
    only exchange in the plan is the (small) source side. The target
    fact never re-shuffles."""
    from lakehouse_dba_tools_spark.operators.upsert import merge_upsert

    orders = load_table(spark, sf_dir, "orders")
    write_bucketed(
        orders.select(F.col("o_orderkey").alias("k"), "o_totalprice"),
        "b_merge_target", ["k"], 8,
    )
    source = spark.range(0, 50).select(
        (F.col("id") * 7 + 3).alias("k"), (F.col("id") * 1.5).alias("o_totalprice")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        target = spark.table("b_merge_target")
        merged = merge_upsert(target, source, ["k"], validate_unique=False)
        plan = merged._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # every Exchange must hash the SOURCE (range-derived) side; the
        # bucketed target contributes none
        n_exchanges = plan.count("Exchange hashpartitioning")
        assert n_exchanges <= 2, plan  # anti-join source + union source
        assert "Exchange hashpartitioning(k#" in plan
        # bucketed scan present and not followed by its own exchange:
        # the target branch reads straight into the sort-merge join
        assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_merge_target")


def test_bucketed_merge_upsert_zero_exchange(spark, sf_dir):
    """The 100 TB MERGE story, plan-pinned: a merge_upsert whose target
    AND source are same-bucketed on the merge key must run its
    left-anti (kept-target) join with ZERO exchanges — the write-time
    bucket shuffle replaces the per-merge shuffle Delta MERGE pays on
    every run against an unclustered target."""
    from lakehouse_dba_tools_spark.operators.upsert import merge_upsert

    orders = load_table(spark, sf_dir, "orders")
    write_bucketed(
        orders.select(F.col("o_orderkey").alias("k"), "o_totalprice"),
        "b_merge_target", ["k"], 8,
    )
    write_bucketed(
        orders.limit(500).select(
            F.col("o_orderkey").alias("k"),
            (F.col("o_totalprice") * 2).alias("o_totalprice"),
        ),
        "b_merge_source", ["k"], 8,
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        target = spark.table("b_merge_target")
        source = spark.table("b_merge_source")
        merged = merge_upsert(target, source, ["k"], validate_unique=False)
        plan = merged._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan and "LeftAnti" in plan
        assert "Exchange" not in plan, plan
        assert merged.count() == target.count()
        # matched rows really were replaced
        doubled = (
            merged.join(orders, merged["k"] == orders["o_orderkey"])
            .filter(merged["o_totalprice"] == orders["o_totalprice"] * 2)
            .count()
        )
        assert doubled >= 500
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_merge_target")
        spark.sql("DROP TABLE IF EXISTS b_merge_source")
