from __future__ import annotations

import importlib.util
import sys


def _load_entry():
    spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_smoke(spark):
    mod = _load_entry()
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert {"event_type", "n_users_latest", "sum_value", "sum_k"} <= set(df.columns)


def test_queries_oracle_keys_align():
    mod = _load_entry()
    q = mod.queries()
    o = mod.oracle_sql()
    assert q, "no queries registered"
    missing = set(o) - set(q)
    assert not missing, f"oracle entries without queries: {missing}"


def test_all_queries_run_sf0001(spark, sf_dir):
    mod = _load_entry()
    for name, fn in mod.queries().items():
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name
