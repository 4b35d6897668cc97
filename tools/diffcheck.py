"""Local stand-in for the driver's DuckDB-oracle differential check.

Runs every registered query on Spark and its oracle SQL on DuckDB over
the same sf dir, compares row count, column names, and order-insensitive
values. Usage:

    python tools/diffcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")


def normalize(df, float_tol=1e-9):
    """pandas frame → sorted list-of-tuples with normalized values.

    Type-strict for numerics: the driver hashes raw values, so Spark's
    int64 123 vs an oracle float64 123.0 (e.g. DuckDB HUGEINT→pandas
    float) MUST fail here too — tag each numeric with its family so
    local green predicts driver green.
    """
    import numbers

    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False):
        row = []
        for v in tup:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                row.append(None)
            elif isinstance(v, bool) or type(v).__name__ == "bool_":
                row.append(("b", bool(v)))
            elif isinstance(v, numbers.Integral):
                row.append(("i", int(v)))
            elif isinstance(v, float):
                row.append(("f", round(v, 9)))
            elif hasattr(v, "isoformat"):
                row.append(v.isoformat())
            elif isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
                row.append(tuple(round(float(x), 6) for x in v))
            else:
                row.append(v)
        rows.append(tuple(row))
    return sorted(rows, key=lambda r: tuple(str(x) for x in r))


def main() -> int:
    import os

    import duckdb

    from lakehouse_dba_tools_spark import get_session, registry
    from lakehouse_dba_tools_spark.sources.tables import TABLE_NAMES

    registry.load_all()
    ORACLE, QUERIES = registry.ORACLE, registry.QUERIES

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    if os.environ.get("DIFFCHECK_VANILLA"):
        # Mimic the round driver: a bare session with none of
        # get_session's SEMANTIC confs (no AQE tuning, no UTC tz, no
        # nanosAsLong, default shuffle partitions, ANSI defaults).
        # Every query must still pass — operators set the confs they
        # need at runtime. Machine SIZING is not part of the check:
        # the default 1 GB driver heap deterministically dies on a
        # broadcast build ~250 queries into this single-session
        # marathon ("Not enough memory to build and broadcast") from
        # accumulated UI/status retention — a battery-length artifact
        # no 50-query driver run hits — so heap and UI retention are
        # sized for the marathon while semantics stay bare.
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[16]")
            .appName("diffcheck-vanilla")
            .config(
                "spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
            )
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        spark = get_session(app_name="diffcheck")
    con = duckdb.connect()
    import os

    for t in TABLE_NAMES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    n_pass = n_fail = n_skip = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_pd = sdf.toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            if os.environ.get("DIFFCHECK_TRACE"):
                import traceback

                traceback.print_exc()
            n_fail += 1
            continue
        if name not in ORACLE:
            print(f"SKIP {name}: no oracle ({len(spark_pd)} rows, {time.time()-t0:.1f}s)")
            n_skip += 1
            continue
        try:
            duck_pd = con.sql(ORACLE[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = []
        if len(spark_pd) != len(duck_pd):
            problems.append(f"rowcount spark={len(spark_pd)} duck={len(duck_pd)}")
        sc, dc = sorted(spark_pd.columns), sorted(duck_pd.columns)
        if sc != dc:
            problems.append(f"columns spark={sc} duck={dc}")
        if not problems:
            a, b = normalize(spark_pd), normalize(duck_pd)
            if a != b:
                bad = [(x, y) for x, y in zip(a, b) if x != y][:3]
                problems.append(f"values differ, first diffs: {bad}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_pd)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
