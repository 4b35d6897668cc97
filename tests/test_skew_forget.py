"""Skew profiler + cascade-delete semantics and plan shapes."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_dba_tools_spark.maintenance.skew import heavy_hitters, key_skew_profile
from lakehouse_dba_tools_spark.operators.forget import Edge, cascade_delete, deletion_audit
from lakehouse_dba_tools_spark.sources.tables import load_table


def test_skew_profile_values(spark):
    df = spark.createDataFrame(
        [(k,) for k in [1, 1, 1, 1, 2, 2, 3, 4]], ["k"]
    )
    row = key_skew_profile(df, "k").collect()[0]
    assert (row["n_rows"], row["n_keys"], row["max_freq"]) == (8, 4, 4)
    assert row["avg_freq"] == 2.0
    assert row["skew_ratio"] == 2.0


def test_heavy_hitters_order_and_tiebreak(spark):
    df = spark.createDataFrame([(k,) for k in [5, 5, 9, 9, 1]], ["k"])
    top = [(r["k"], r["freq"]) for r in heavy_hitters(df, "k", 2).collect()]
    assert top == [(5, 2), (9, 2)]  # freq desc, then key asc


def test_cascade_delete_partitions_tables(spark):
    customer = spark.createDataFrame([(1,), (2,), (3,)], ["c_custkey"])
    orders = spark.createDataFrame(
        [(10, 1), (11, 1), (12, 2), (13, 3)], ["o_orderkey", "o_custkey"]
    )
    lineitem = spark.createDataFrame(
        [(10, 1), (10, 2), (12, 1), (13, 1)], ["l_orderkey", "l_linenumber"]
    )
    tables = {"customer": customer, "orders": orders, "lineitem": lineitem}
    survivors, deleted = cascade_delete(
        tables,
        "customer",
        F.col("c_custkey") == 1,
        [
            Edge("customer", "c_custkey", "orders", "o_custkey"),
            Edge("orders", "o_orderkey", "lineitem", "l_orderkey"),
        ],
    )
    audit = {r["table_name"]: r for r in deletion_audit(tables, deleted).collect()}
    assert audit["customer"]["rows_deleted"] == 1
    assert audit["orders"]["rows_deleted"] == 2  # orders 10, 11
    assert audit["lineitem"]["rows_deleted"] == 2  # both lines of order 10
    for t in tables:
        # survivors ∪ deleted == table, disjoint
        assert survivors[t].count() + deleted[t].count() == tables[t].count()
        assert survivors[t].intersect(deleted[t]).count() == 0


def test_cascade_delete_diamond_dag_unions_edges(spark):
    # Diamond: shipment dies when its order OR its warehouse is deleted.
    # A child with two incoming FK edges must delete the UNION of both
    # edges' matches, with no double-count when a row matches both.
    user = spark.createDataFrame([(1,), (2,)], ["u_id"])
    orders = spark.createDataFrame([(10, 1), (11, 2)], ["o_id", "o_uid"])
    warehouse = spark.createDataFrame([(100, 1), (101, 2)], ["w_id", "w_uid"])
    shipment = spark.createDataFrame(
        # (s_id, s_oid, s_wid): row 3 matches BOTH dying parents; row 4
        # only the order edge; row 5 only the warehouse edge; row 6 neither.
        [(3, 10, 100), (4, 10, 101), (5, 11, 100), (6, 11, 101)],
        ["s_id", "s_oid", "s_wid"],
    )
    tables = {"user": user, "orders": orders, "warehouse": warehouse, "shipment": shipment}
    survivors, deleted = cascade_delete(
        tables,
        "user",
        F.col("u_id") == 1,
        [
            Edge("user", "u_id", "orders", "o_uid"),
            Edge("user", "u_id", "warehouse", "w_uid"),
            Edge("orders", "o_id", "shipment", "s_oid"),
            Edge("warehouse", "w_id", "shipment", "s_wid"),
        ],
    )
    assert sorted(r["s_id"] for r in deleted["shipment"].collect()) == [3, 4, 5]
    assert [r["s_id"] for r in survivors["shipment"].collect()] == [6]
    assert deleted["shipment"].count() + survivors["shipment"].count() == 4


def test_cascade_delete_rejects_foreign_parent(spark):
    import pytest

    t = {"a": spark.createDataFrame([(1,)], ["k"]), "b": spark.createDataFrame([(1,)], ["k"])}
    with pytest.raises(ValueError, match="cycle or reference parents"):
        cascade_delete(t, "a", F.col("k") == 1, [Edge("missing", "k", "b", "k")])


def test_cascade_delete_accepts_interleaved_edge_order(spark):
    # A valid DAG whose edge LIST interleaves children: [A→B, A→C, C→B]
    # mentions B before C has a deletion set. Children must be resolved
    # by dependency, not first appearance.
    a = spark.createDataFrame([(1,), (2,)], ["a_id"])
    b = spark.createDataFrame(
        [(10, 1, 100), (11, 2, 101), (12, 2, 100)], ["b_id", "b_aid", "b_cid"]
    )
    c = spark.createDataFrame([(100, 1), (101, 2)], ["c_id", "c_aid"])
    survivors, deleted = cascade_delete(
        {"a": a, "b": b, "c": c},
        "a",
        F.col("a_id") == 1,
        [
            Edge("a", "a_id", "b", "b_aid"),
            Edge("a", "a_id", "c", "c_aid"),
            Edge("c", "c_id", "b", "b_cid"),
        ],
    )
    # b row 10 dies via A, row 12 via C(100); row 11 survives
    assert sorted(r["b_id"] for r in deleted["b"].collect()) == [10, 12]
    assert [r["b_id"] for r in survivors["b"].collect()] == [11]


def test_cascade_plan_broadcasts_and_never_shuffles_facts(spark, sf_dir):
    tables = {t: load_table(spark, sf_dir, t) for t in ("customer", "orders", "lineitem")}
    _, deleted = cascade_delete(
        tables,
        "customer",
        F.col("c_custkey") % 97 == 11,
        [
            Edge("customer", "c_custkey", "orders", "o_custkey"),
            Edge("orders", "o_orderkey", "lineitem", "l_orderkey"),
        ],
    )
    plan = deleted["lineitem"]._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_salted_join_matches_plain_inner(spark):
    from lakehouse_dba_tools_spark.operators.skew import salted_join

    fact = spark.createDataFrame(
        [(k, v) for v, k in enumerate(["a", "a", "a", "b", "c", "a"])],
        ["k", "v"],
    )
    dim = spark.createDataFrame([("a", 10), ("b", 20), ("d", 40)], ["k", "w"])
    got = sorted(
        tuple(r) for r in salted_join(fact, dim, ["k"], n_salts=4).collect()
    )
    want = sorted(tuple(r) for r in fact.join(dim, "k").collect())
    assert got == want


def test_salted_join_matches_plain_left(spark):
    from lakehouse_dba_tools_spark.operators.skew import salted_join

    fact = spark.createDataFrame([("a", 1), ("zz", 2)], ["k", "v"])
    dim = spark.createDataFrame([("a", 10)], ["k", "w"])
    got = sorted(
        (r["k"], r["v"], r["w"])
        for r in salted_join(fact, dim, ["k"], n_salts=3, how="left").collect()
    )
    assert got == [("a", 1, 10), ("zz", 2, None)]


def test_salted_join_rejects_right_full(spark):
    import pytest as _pytest

    from lakehouse_dba_tools_spark.operators.skew import salted_join

    df = spark.createDataFrame([("a", 1)], ["k", "v"])
    for how in ("right", "full", "outer"):
        with _pytest.raises(ValueError):
            salted_join(df, df, ["k"], how=how)


def test_salted_join_salt_reaches_join_keys(spark):
    """The physical join must key on _salt (the whole point: the hot
    key's rows hash to n_salts partitions, not one)."""
    from lakehouse_dba_tools_spark.operators.skew import salted_join

    fact = spark.createDataFrame([("a", 1)] * 8, ["k", "v"])
    dim = spark.createDataFrame([("a", 10)], ["k", "w"])
    plan = (
        salted_join(fact, dim, ["k"], n_salts=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "_salt" in plan


def test_pagerank_one_iteration_hand_values(spark):
    """A→B, A→C, B→C (C dangling): r1(A)=(1-d)/3, r1(B)=0.05+0.85/6,
    r1(C)=0.05+0.85*(1/6+1/3)."""
    from lakehouse_dba_tools_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [("A", "B"), ("A", "C"), ("B", "C")], ["src", "dst"]
    )
    got = {r["node"]: r["rank"] for r in pagerank(edges, iterations=1).collect()}
    assert got["A"] == round(0.15 / 3, 12)
    assert got["B"] == round(0.15 / 3 + 0.85 * (1 / 3) / 2, 12)
    assert got["C"] == round(0.15 / 3 + 0.85 * ((1 / 3) / 2 + (1 / 3)), 12)


def test_pagerank_run_invariant(spark):
    """Shuffle/summation order must not leak into ranks (the
    per-iteration round(12) guarantee)."""
    from lakehouse_dba_tools_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(i % 17, (i * 7) % 23) for i in range(300) if i % 17 != (i * 7) % 23],
        ["src", "dst"],
    ).distinct()
    a = sorted(tuple(r) for r in pagerank(edges, iterations=4).collect())
    b = sorted(
        tuple(r) for r in pagerank(edges.repartition(13), iterations=4).collect()
    )
    assert a == b
