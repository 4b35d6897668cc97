"""Regenerate the pinned VALUES oracles for queries_tpcds.py.

FULLY RETIRED (round 6): every oracle in the tier — all 99 query
numbers AND the warehouse-build audit — is now real SQL executed by
DuckDB over the datagen/export.py gate warehouse, and MUST NOT be
re-pinned from engine output. This tool is kept only as tooling
history; running it finds no VALUES-block oracles to regenerate
(it skips any oracle that is not a VALUES block).
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
