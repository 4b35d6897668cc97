"""Flag oracle SQL whose DuckDB result types would hash-mismatch vs Spark.

DuckDB types sum(<integer expr>) as HUGEINT; duckdb.sql(...).df() converts
HUGEINT to float64, so the driver's value-hash sees 123.0 where Spark
produces int64 123.  Any oracle with a HUGEINT/UHUGEINT output column is a
latent (or live) hash failure.  Run this over the FULL registry, not just
the checked-first window, so trailing queries are safe to rotate in.

Usage: python tools/oracle_typecheck.py [sf_dir]
Exit code 1 if any oracle is flagged.
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

BAD_TYPES = {"HUGEINT", "UHUGEINT"}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import __spark_entry__ as entry

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    flagged: dict[str, list[str]] = {}
    errors: dict[str, str] = {}
    oracles = entry.oracle_sql()
    for name, sql in oracles.items():
        try:
            rel = con.sql(sql)
            bad = [
                f"{col}:{dtype}"
                for col, dtype in zip(rel.columns, [str(t) for t in rel.types])
                if str(dtype) in BAD_TYPES
            ]
        except Exception as e:  # noqa: BLE001 - report and continue
            errors[name] = str(e).splitlines()[0][:200]
            continue
        if bad:
            flagged[name] = bad

    print(f"oracles checked: {len(oracles)}")
    for name, cols in sorted(flagged.items()):
        print(f"FLAG {name}: {', '.join(cols)}")
    for name, err in sorted(errors.items()):
        print(f"ERR  {name}: {err}")
    if not flagged and not errors:
        print("all oracle output types are hash-safe")
    return 1 if (flagged or errors) else 0


if __name__ == "__main__":
    raise SystemExit(main())
