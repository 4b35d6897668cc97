"""Stream-stream and stream-static joins with watermark-bounded state.

Not in the reference (no streaming at all — SURVEY.md §2.10); required
for event-correlation pipelines at scale. A stream-stream inner join
keeps both sides' state until the watermark passes the join-time bound;
the time-range predicate is what lets Spark evict state — an unbounded
join condition would grow state forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def purchases_after_views(
    events: DataFrame,
    within: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Correlate each purchase with prior views of the same user within
    a bounded window: the canonical attribution stream-stream join.

    Join condition: v.ts <= p.ts <= v.ts + within — time-bounded both
    ways, so state for both sides is evicted as watermarks advance.
    """
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
            F.col("event_id").alias("view_id"),
        )
        .withWatermark("v_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("purchase_id"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("p_ts", watermark)
    )
    cond = (
        (F.col("v_user") == F.col("p_user"))
        & (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr(f"INTERVAL {within}"))
    )
    return views.join(purchases, cond, "inner").select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "view_id",
        F.round("purchase_value", 2).alias("purchase_value"),
    )


def enrich_with_static(
    stream: DataFrame, dim: DataFrame, on: list[str], broadcast: bool = True
) -> DataFrame:
    """Stream-static enrichment join: STATELESS — the static side is
    re-planned per micro-batch (picking up dim updates between
    batches), no watermark or state store involved.

    ``broadcast=True`` is for genuinely FIXED-SIZE dims (lookup/config
    tables), where a per-batch shuffle of the stream would defeat
    micro-batch latency. For SF-scaling dims (customer, part, ...)
    pass ``broadcast=False`` and let Catalyst/AQE pick the strategy
    from size estimates — forcing a broadcast on a scaling side OOMs
    at large SF (repo rule, queries_tpcds.py header)."""
    return stream.join(F.broadcast(dim) if broadcast else dim, on)
