"""Datagen + cost-attribution queries (reference pillar 3 + J4)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_dba_tools_spark.datagen.generator import gen_lineitem
from lakehouse_dba_tools_spark.registry import register
from lakehouse_dba_tools_spark.sources.tables import load_table

# The reference's pricing dimension (9 endpoint T-shirt sizes,
# resources/azure_databricks_sql_pricing.csv) — inlined literal dim.
PRICING_TIERS = [
    ("2X-Small", 4, 2.25),
    ("X-Small", 8, 4.50),
    ("Small", 16, 9.00),
    ("Medium", 32, 18.00),
    ("Large", 64, 36.00),
    ("X-Large", 128, 72.00),
    ("2X-Large", 264, 147.82),
    ("3X-Large", 520, 291.18),
    ("4X-Large", 528, 295.64),
]


@register(
    "event_cost_attribution",
    f"""
    WITH pricing(cluster_size, dbu_per_hour, usd_per_hour) AS (
      VALUES {", ".join(f"('{n}', {d}, {u})" for n, d, u in PRICING_TIERS)}
    ),
    sized AS (SELECT *, CASE user_id % 9
        {" ".join(f"WHEN {i} THEN '{n}'" for i, (n, _, _) in enumerate(PRICING_TIERS))}
      END AS cluster_size FROM events)
    SELECT cluster_size, count(*) AS n_events,
           round(sum(value * usd_per_hour / 3600.0), 2) AS attributed_usd
    FROM sized JOIN pricing USING (cluster_size)
    GROUP BY cluster_size
    """,
)
def event_cost_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 cost-attribution join: usage facts × broadcast pricing dim
    (the reason `dbsql_pricing_table` and `endpoints` share a schema in
    the reference — import_dbsql_pricing.py:19 + QH:24-26)."""
    ev = load_table(spark, sf_dir, "events")
    pricing = spark.createDataFrame(
        PRICING_TIERS, "cluster_size string, dbu_per_hour int, usd_per_hour double"
    )
    tier = F.element_at(
        F.array(*[F.lit(n) for n, _, _ in PRICING_TIERS]),
        (F.col("user_id") % 9 + 1).cast("int"),
    )
    sized = ev.withColumn("cluster_size", tier)
    return (
        sized.join(F.broadcast(pricing), "cluster_size")
        .groupBy("cluster_size")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value") * F.col("usd_per_hour") / 3600.0), 2).alias(
                "attributed_usd"
            ),
        )
    )


@register("datagen_lineitem_rollup")
def datagen_lineitem_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generate 200k synthetic lineitem rows distributed (seed=100,
    partition-count-independent determinism) and roll them up — the
    datagen → verify loop of the reference (TPC:1818-1845 + 1929-1956).
    Hash-derived data has no DuckDB twin → rows-only check; determinism
    is pinned in tests/test_datagen.py."""
    li = gen_lineitem(spark, 200_000, seed=100)
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
    )
