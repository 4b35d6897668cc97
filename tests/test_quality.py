"""Data-quality constraint checker: rule semantics + one-scan plan."""

from __future__ import annotations

from lakehouse_dba_tools_spark.maintenance.quality import Rule, check_constraints


def _dirty(spark):
    rows = [
        (1, "O", 10.0, 100),
        (2, "F", -5.0, 101),   # price range violation
        (2, "X", 50.0, 102),   # dup key + bad status
        (None, "O", None, 999),  # null key + orphan custkey (999)
        (4, "P", 9e9, 100),    # price above hi
    ]
    child = spark.createDataFrame(rows, ["k", "status", "price", "custkey"])
    parent = spark.createDataFrame([(100,), (101,), (102,)], ["id"])
    return child, parent


RULES = [
    Rule("k_not_null", "not_null", col="k"),
    Rule("status_ok", "accepted_values", col="status", values=("O", "F", "P")),
    Rule("price_band", "range", col="price", lo=0.0, hi=1000.0),
    Rule("k_unique", "unique", col="k"),
    Rule("custkey_fk", "foreign_key", col="custkey", parent="p", parent_keys=("id",)),
]


def test_rule_semantics(spark):
    child, parent = _dirty(spark)
    rep = {
        r["rule"]: (r["n_violations"], r["passed"])
        for r in check_constraints(child, RULES, parents={"p": parent}).collect()
    }
    assert rep["k_not_null"] == (1, False)
    assert rep["status_ok"] == (1, False)
    assert rep["price_band"] == (2, False)  # -5 and 9e9; NULL price not counted
    assert rep["k_unique"] == (1, False)  # one extra copy of k=2
    assert rep["custkey_fk"] == (1, False)  # 999 orphan; NULL keys dropped


def test_unique_null_keys_never_conflict(spark):
    # SQL UNIQUE-constraint semantics: NULL keys don't conflict with
    # each other — 3 NULL keys contribute 0 violations but 3 rows.
    df = spark.createDataFrame(
        [(None,), (None,), (None,), (1,), (1,), (2,)], ["k"]
    )
    rep = check_constraints(df, [Rule("u", "unique", col="k")], parents={}).collect()[0]
    assert (rep["n_rows"], rep["n_violations"]) == (6, 1)


def test_clean_table_passes(spark):
    child, parent = _dirty(spark)
    clean = child.filter("k in (1, 4) AND price < 1e6")
    rep = check_constraints(
        clean, [r for r in RULES if r.kind != "foreign_key"], parents={}
    )
    assert all(r["passed"] for r in rep.collect())


def test_row_level_rules_fold_into_one_scan(spark, sf_dir):
    from lakehouse_dba_tools_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    row_rules = [
        Rule("a", "not_null", col="o_orderkey"),
        Rule("b", "accepted_values", col="o_orderstatus", values=("O", "F", "P")),
        Rule("c", "range", col="o_totalprice", lo=0.0),
        Rule("d", "regex", col="o_orderpriority", pattern="^[1-5]-"),
    ]
    plan = (
        check_constraints(orders, row_rules)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("FileScan") == 1, "row-level rules must share one scan"
