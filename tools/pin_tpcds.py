"""Regenerate the pinned VALUES oracles for queries_tpcds.py.

RETIRED (round 6) for 98 of the tier's 99 query numbers: their
oracles are real TPC-DS SQL executed by DuckDB over the
datagen/export.py gate warehouse and MUST NOT be re-pinned from
engine output. Only `tpcds_warehouse_build_audit` (structural counts)
still carries a pin — for it, run after any intentional generator
change, paste the printed blocks over the existing pins, then re-run
tools/diffcheck.py to confirm. Skips converted queries automatically
(their oracle is not a VALUES block).
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def fmt_val(v, dtype: str) -> str:
    if v is None:
        return f"CAST(NULL AS {dtype})"
    if dtype in ("INT", "BIGINT"):
        return f"CAST({int(v)} AS {dtype})"
    if dtype == "DOUBLE":
        return f"CAST({float(v)!r} AS DOUBLE)"
    s = str(v).replace("'", "''")
    return f"'{s}'"


def duck_type(spark_type: str) -> str:
    return {
        "int": "INT",
        "bigint": "BIGINT",
        "double": "DOUBLE",
        "string": "VARCHAR",
    }[spark_type]


def main() -> None:
    from lakehouse_dba_tools_spark import get_session
    from lakehouse_dba_tools_spark import queries_tpcds  # noqa: F401
    from lakehouse_dba_tools_spark.registry import ORACLE, QUERIES

    spark = get_session()
    names = sys.argv[1:] or [n for n in QUERIES if n.startswith("tpcds_")]
    converted = [
        n for n in names if "VALUES" not in ORACLE.get(n, "VALUES")
    ]
    if converted:
        print(f"skipping {len(converted)} independent-oracle queries: {converted}")
        names = [n for n in names if n not in converted]
    blocks = []
    for name in names:
        df = QUERIES[name](spark, "/root/testdata/sf0.001")
        dtypes = dict(df.dtypes)
        cols = df.columns
        rows = df.collect()
        lines = []
        for row in rows:
            vals = ", ".join(fmt_val(row[c], duck_type(dtypes[c])) for c in cols)
            lines.append(f"      ({vals})")
        body = ",\n".join(lines)
        sql = (
            "\n    SELECT * FROM (VALUES\n"
            + body
            + f"\n    ) AS t({', '.join(cols)})\n    "
        )
        blocks.append((name, sql))
    spark.stop()
    for name, sql in blocks:
        print(f"===== {name} =====")
        print(sql)


if __name__ == "__main__":
    main()
