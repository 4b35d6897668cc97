"""Order-independent float aggregation for oracle parity.

``sum(double)`` is partition-order dependent (FP addition is not
associative), and Spark's HALF_UP vs DuckDB's rounding diverge when the
accumulated sum lands near a rounding boundary — the exact failure class
of round-1's 4 hash-mismatched rollups. The fix is to make the sum
EXACT: cast every term to ``decimal(38,12)`` first. The double→decimal
conversion is deterministic and engine-identical (round-to-nearest of
the exact binary value), decimal addition is exact integer arithmetic
(order-independent), and rounding an exact decimal is unambiguous on
both engines.

Cost note: decimal sums don't vectorize quite as tightly as double sums
in Tungsten, but they stay JVM-side inside hash aggregation with
map-side partial combine — at 100 TB the scan still dominates. Use for
result-facing rounded sums; keep raw double sums for internal
intermediates that never face an equality check.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,12)"


def stable_sum(col: Column | str, scale: int = 2) -> Column:
    """Exact (order-independent) sum of a double column, rounded to
    ``scale`` and returned as double. Spark side of the pattern; pair
    with :func:`stable_sum_sql` in the oracle."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(DEC)), scale).cast("double")


def stable_avg(col: Column | str, scale: int = 4) -> Column:
    """Order-independent avg: exact decimal sum, cast to double, THEN
    divide — both engines then round an identical IEEE quotient.
    (Dividing in decimal would hit engine-specific quotient scales.)"""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(DEC)).cast("double") / F.count(c), scale)


def stable_sum_sql(expr: str, scale: int = 2) -> str:
    """DuckDB oracle fragment matching :func:`stable_sum`."""
    return f"CAST(round(sum(CAST(({expr}) AS DECIMAL(38,12))), {scale}) AS DOUBLE)"


def stable_avg_sql(expr: str, scale: int = 4) -> str:
    """DuckDB oracle fragment matching :func:`stable_avg`."""
    return (
        f"round(CAST(sum(CAST(({expr}) AS DECIMAL(38,12))) AS DOUBLE)"
        f" / count({expr}), {scale})"
    )
