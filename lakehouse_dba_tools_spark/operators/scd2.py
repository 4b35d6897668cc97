"""SCD Type-2 merge: history-preserving dimension updates.

The reference's MERGE (S9) is Type-1 (overwrite in place); warehouse
dimensions usually need Type-2: close the current row (set its
``valid_to``) and append the new version. Emulated Delta-free with the
same decomposition Delta's own MERGE uses — change detection via join,
then a union of (untouched ∪ closed-out ∪ new-version ∪ brand-new):

    changed   := source rows whose tracked columns differ from the
                 CURRENT target row of the same key
    closed    := current target rows of changed/new keys, valid_to set
    appended  := changed ∪ new-key source rows, valid_from = batch ts

One shuffle on the key (the join); the unions are shuffle-free.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

OPEN_TS = "9999-12-31 00:00:00"


def scd2_merge(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    tracked: Sequence[str],
    batch_ts: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Apply one source batch to an SCD2 target.

    ``target`` carries (keys, tracked..., valid_from, valid_to) with the
    current row having valid_to = OPEN_TS. ``source`` carries
    (keys, tracked...). ``batch_ts`` is the effective timestamp literal
    (injectable → deterministic tests; current_timestamp() in prod).
    """
    ts = F.lit(batch_ts).cast("timestamp")
    current = target.filter(F.col(valid_to) == F.lit(OPEN_TS).cast("timestamp"))
    history = target.filter(F.col(valid_to) != F.lit(OPEN_TS).cast("timestamp"))

    src = source.select(*keys, *tracked)
    # Non-nullable presence markers tagged BEFORE the join: detecting
    # side-presence from a key column would misclassify rows whose
    # leading key is legitimately NULL (which also never matches the
    # equi-join, so a null-keyed row appears on both sides unmatched).
    cur = current.withColumn("_t_present", F.lit(True)).alias("t")
    s = src.withColumn("_s_present", F.lit(True)).alias("s")
    key_cond = [F.col(f"t.{k}") == F.col(f"s.{k}") for k in keys]

    def differs() -> Column:
        c = F.lit(False)
        for col in tracked:
            c = c | ~F.col(f"t.{col}").eqNullSafe(F.col(f"s.{col}"))
        return c

    joined = cur.join(s, on=key_cond, how="full_outer")
    t_key = F.col("t._t_present").isNotNull()
    s_key = F.col("s._s_present").isNotNull()

    # current rows with no change → pass through
    unchanged = joined.filter(s_key & t_key & ~differs()).select(
        *[F.col(f"t.{c}") for c in current.columns]
    )
    # current rows without a source match → pass through
    unmatched = joined.filter(~s_key).select(
        *[F.col(f"t.{c}") for c in current.columns]
    )
    # changed keys: close out the old version
    closed = joined.filter(t_key & s_key & differs()).select(
        *[F.col(f"t.{k}") for k in keys],
        *[F.col(f"t.{c}") for c in tracked],
        F.col(f"t.{valid_from}").alias(valid_from),
        ts.alias(valid_to),
    )
    # changed + brand-new keys: open the new version
    opened = joined.filter(
        s_key & (~t_key | differs())
    ).select(
        *[F.col(f"s.{k}") for k in keys],
        *[F.col(f"s.{c}") for c in tracked],
        ts.alias(valid_from),
        F.lit(OPEN_TS).cast("timestamp").alias(valid_to),
    )

    cols = [*keys, *tracked, valid_from, valid_to]
    parts = [history.select(*cols), unchanged.select(*cols), unmatched.select(*cols),
             closed.select(*cols), opened.select(*cols)]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def scd2_init(source: DataFrame, keys: Sequence[str], tracked: Sequence[str], batch_ts: str) -> DataFrame:
    """Bootstrap an SCD2 target from the first batch."""
    return source.select(
        *keys,
        *tracked,
        F.lit(batch_ts).cast("timestamp").alias("valid_from"),
        F.lit(OPEN_TS).cast("timestamp").alias("valid_to"),
    )
