"""Datagen + cost-attribution queries (reference pillar 3 + J4)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_dba_tools_spark.datagen.generator import gen_lineitem
from lakehouse_dba_tools_spark.functions.stable import stable_avg, stable_sum
from lakehouse_dba_tools_spark.registry import register
from lakehouse_dba_tools_spark.sources.tables import load_table

# The reference's pricing dimension lives as a CSV asset
# (resources/azure_databricks_sql_pricing.csv, loaded by
# import_dbsql_pricing.py:7-11); ours ships the same way and is read
# through the S4 pandas bridge at query time. The literal twin below is
# (a) the import fallback and (b) the source for the VALUES oracle —
# test_datagen_catalog pins that CSV and literal agree.
PRICING_CSV = __file__.rsplit("/", 1)[0] + "/resources/sql_pricing.csv"
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


def load_pricing_dim(spark: SparkSession) -> DataFrame:
    """Pricing dim from the CSV asset (reference import_dbsql_pricing
    trace: CSV → dataframe → dimension table), literal fallback."""
    import os

    if os.path.exists(PRICING_CSV):
        from lakehouse_dba_tools_spark.sources.files import read_csv_via_pandas

        df = read_csv_via_pandas(spark, PRICING_CSV)
        return df.select(
            F.col("cluster_size").cast("string"),
            F.col("dbu_per_hour").cast("int"),
            F.col("usd_per_hour").cast("double"),
        )
    return spark.createDataFrame(
        PRICING_TIERS, "cluster_size string, dbu_per_hour int, usd_per_hour double"
    )


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
           CAST(round(sum(CAST(value * usd_per_hour / 3600.0 AS DECIMAL(38,12))), 2) AS DOUBLE) AS attributed_usd
    FROM sized JOIN pricing USING (cluster_size)
    GROUP BY cluster_size
    """,
)
def event_cost_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 cost-attribution join: usage facts × broadcast pricing dim
    (the reason `dbsql_pricing_table` and `endpoints` share a schema in
    the reference — import_dbsql_pricing.py:19 + QH:24-26)."""
    ev = load_table(spark, sf_dir, "events")
    pricing = load_pricing_dim(spark)
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
            stable_sum(F.col("value") * F.col("usd_per_hour") / 3600.0, 2).alias(
                "attributed_usd"
            ),
        )
    )


@register(
    "datagen_lineitem_rollup",
    """
    SELECT * FROM (VALUES
      ('A', 'F', CAST(33339 AS BIGINT), CAST(851386.74 AS DOUBLE), CAST(50400.5802 AS DOUBLE)),
      ('A', 'O', CAST(33538 AS BIGINT), CAST(850178.51 AS DOUBLE), CAST(50440.97   AS DOUBLE)),
      ('N', 'F', CAST(33234 AS BIGINT), CAST(847979.54 AS DOUBLE), CAST(50519.2225 AS DOUBLE)),
      ('N', 'O', CAST(33216 AS BIGINT), CAST(848109.07 AS DOUBLE), CAST(50151.3685 AS DOUBLE)),
      ('R', 'F', CAST(33389 AS BIGINT), CAST(851873.4  AS DOUBLE), CAST(50339.4208 AS DOUBLE)),
      ('R', 'O', CAST(33284 AS BIGINT), CAST(847104.55 AS DOUBLE), CAST(50594.2832 AS DOUBLE))
    ) AS t(l_returnflag, l_linestatus, n, sum_qty, avg_price)
    """,
)
def datagen_lineitem_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generate 200k synthetic lineitem rows distributed (seed=100,
    partition-count-independent determinism) and roll them up — the
    datagen → verify loop of the reference (TPC:1818-1845 + 1929-1956).
    Hash-derived data has no DuckDB twin, so the oracle PINS the exact
    expected aggregates as VALUES: the generator is deterministic by
    construction (hash of (seed, row_id)) and the sums use the exact
    decimal pattern, so any drift in the generator or the rollup flips
    the hash loudly. Determinism across partition counts is additionally
    pinned in tests/test_datagen_catalog.py."""
    li = gen_lineitem(spark, 200_000, seed=100)
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        stable_sum("l_quantity", 2).alias("sum_qty"),
        stable_avg("l_extendedprice", 4).alias("avg_price"),
    )
