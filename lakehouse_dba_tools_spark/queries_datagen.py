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


# Pinned from a seed=100 run; the generator is a pure function of
# (seed, row_id), so these VALUES are stable across partition counts
# and Spark versions (decimal-exact arithmetic; determinism pinned in
# tests/test_datagen_catalog.py).
_SUPPLIER_PARTSUPP_VALUES = """(CAST(0 AS BIGINT), CAST(1600 AS BIGINT), CAST(8047384 AS BIGINT), CAST(1.76 AS DOUBLE), CAST(8020483.2 AS DOUBLE)),
      (CAST(1 AS BIGINT), CAST(1600 AS BIGINT), CAST(8120825 AS BIGINT), CAST(1.05 AS DOUBLE), CAST(6527196.8 AS DOUBLE)),
      (CAST(2 AS BIGINT), CAST(1600 AS BIGINT), CAST(8180815 AS BIGINT), CAST(2.76 AS DOUBLE), CAST(6561644.4 AS DOUBLE)),
      (CAST(3 AS BIGINT), CAST(1600 AS BIGINT), CAST(8029017 AS BIGINT), CAST(1.82 AS DOUBLE), CAST(6733173.2 AS DOUBLE)),
      (CAST(4 AS BIGINT), CAST(1600 AS BIGINT), CAST(8034865 AS BIGINT), CAST(1.23 AS DOUBLE), CAST(8225215.2 AS DOUBLE)),
      (CAST(5 AS BIGINT), CAST(1600 AS BIGINT), CAST(8025989 AS BIGINT), CAST(1.86 AS DOUBLE), CAST(7087981.2 AS DOUBLE)),
      (CAST(6 AS BIGINT), CAST(1600 AS BIGINT), CAST(8019850 AS BIGINT), CAST(1.28 AS DOUBLE), CAST(5857502.4 AS DOUBLE)),
      (CAST(7 AS BIGINT), CAST(1600 AS BIGINT), CAST(7910501 AS BIGINT), CAST(1.27 AS DOUBLE), CAST(6908365.2 AS DOUBLE)),
      (CAST(8 AS BIGINT), CAST(1600 AS BIGINT), CAST(7884745 AS BIGINT), CAST(1.53 AS DOUBLE), CAST(6856252.8 AS DOUBLE)),
      (CAST(9 AS BIGINT), CAST(1600 AS BIGINT), CAST(7890445 AS BIGINT), CAST(1.56 AS DOUBLE), CAST(7018362.4 AS DOUBLE)),
      (CAST(10 AS BIGINT), CAST(1600 AS BIGINT), CAST(7973294 AS BIGINT), CAST(3.03 AS DOUBLE), CAST(6817537.6 AS DOUBLE)),
      (CAST(11 AS BIGINT), CAST(1600 AS BIGINT), CAST(8055646 AS BIGINT), CAST(1.1 AS DOUBLE), CAST(5890861.6 AS DOUBLE)),
      (CAST(12 AS BIGINT), CAST(1600 AS BIGINT), CAST(7985384 AS BIGINT), CAST(1.93 AS DOUBLE), CAST(7427686.4 AS DOUBLE)),
      (CAST(13 AS BIGINT), CAST(1600 AS BIGINT), CAST(8030410 AS BIGINT), CAST(2.0 AS DOUBLE), CAST(6542851.6 AS DOUBLE)),
      (CAST(14 AS BIGINT), CAST(1600 AS BIGINT), CAST(7898769 AS BIGINT), CAST(1.52 AS DOUBLE), CAST(6234300.4 AS DOUBLE)),
      (CAST(15 AS BIGINT), CAST(1600 AS BIGINT), CAST(7836512 AS BIGINT), CAST(1.46 AS DOUBLE), CAST(8246196.4 AS DOUBLE)),
      (CAST(16 AS BIGINT), CAST(1600 AS BIGINT), CAST(8026952 AS BIGINT), CAST(1.65 AS DOUBLE), CAST(7702967.6 AS DOUBLE)),
      (CAST(17 AS BIGINT), CAST(1600 AS BIGINT), CAST(7972583 AS BIGINT), CAST(1.71 AS DOUBLE), CAST(7347053.6 AS DOUBLE)),
      (CAST(18 AS BIGINT), CAST(1600 AS BIGINT), CAST(7852087 AS BIGINT), CAST(1.37 AS DOUBLE), CAST(7186650.0 AS DOUBLE)),
      (CAST(19 AS BIGINT), CAST(1600 AS BIGINT), CAST(7995956 AS BIGINT), CAST(1.95 AS DOUBLE), CAST(7392635.6 AS DOUBLE)),
      (CAST(20 AS BIGINT), CAST(1600 AS BIGINT), CAST(8039287 AS BIGINT), CAST(1.11 AS DOUBLE), CAST(7723426.4 AS DOUBLE)),
      (CAST(21 AS BIGINT), CAST(1600 AS BIGINT), CAST(8179101 AS BIGINT), CAST(1.16 AS DOUBLE), CAST(6977964.0 AS DOUBLE)),
      (CAST(22 AS BIGINT), CAST(1600 AS BIGINT), CAST(8059724 AS BIGINT), CAST(1.15 AS DOUBLE), CAST(5882720.0 AS DOUBLE)),
      (CAST(23 AS BIGINT), CAST(1600 AS BIGINT), CAST(7943279 AS BIGINT), CAST(1.1 AS DOUBLE), CAST(6935130.0 AS DOUBLE)),
      (CAST(24 AS BIGINT), CAST(1600 AS BIGINT), CAST(8087720 AS BIGINT), CAST(1.39 AS DOUBLE), CAST(6874485.6 AS DOUBLE))"""


@register(
    "datagen_supplier_partsupp",
    f"""
    SELECT * FROM (VALUES
      {_SUPPLIER_PARTSUPP_VALUES}
    ) AS t(s_nationkey, n, total_qty, min_cost, total_bal)
    """,
)
def datagen_supplier_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generated supplier × partsupp join rollup — the reference's
    full-schema datagen loop (`resources/TPC-datagen-notebook.scala:
    1413-1491` declares all 8 TPC-H schemas; 1818-1845 generates and
    verifies). partsupp is the fact (4 rows/part), supplier the dim —
    but supplier scales with the datagen config, so the join is left to
    AQE (which broadcasts the 1k-row dim here, and demotes at real
    scale); the rollup is a 25-key hash agg with map-side partials."""
    from lakehouse_dba_tools_spark.datagen.generator import gen_partsupp, gen_supplier

    supp = gen_supplier(spark, 1_000, seed=100)
    ps = gen_partsupp(spark, 10_000, n_suppliers=1_000, seed=100)
    return (
        ps.join(supp, ps.ps_suppkey == supp.s_suppkey)
        .groupBy("s_nationkey")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("ps_availqty").cast("long")).alias("total_qty"),
            F.min("ps_supplycost").cast("double").alias("min_cost"),
            F.round(F.sum("s_acctbal"), 2).cast("double").alias("total_bal"),
        )
    )


_STORE_SALES_VALUES = """(CAST(1 AS INT), CAST(12382 AS BIGINT), CAST(623593 AS BIGINT), CAST(53599979.2 AS DOUBLE), CAST(101.0866 AS DOUBLE)),
      (CAST(2 AS INT), CAST(12562 AS BIGINT), CAST(634837 AS BIGINT), CAST(54305774.88 AS DOUBLE), CAST(100.8112 AS DOUBLE)),
      (CAST(3 AS INT), CAST(12645 AS BIGINT), CAST(635239 AS BIGINT), CAST(54450499.02 AS DOUBLE), CAST(100.7551 AS DOUBLE)),
      (CAST(4 AS INT), CAST(12418 AS BIGINT), CAST(626198 AS BIGINT), CAST(53352347.05 AS DOUBLE), CAST(100.4542 AS DOUBLE)),
      (CAST(5 AS INT), CAST(12491 AS BIGINT), CAST(633541 AS BIGINT), CAST(54243701.59 AS DOUBLE), CAST(100.5145 AS DOUBLE)),
      (CAST(6 AS INT), CAST(12465 AS BIGINT), CAST(628000 AS BIGINT), CAST(53498700.37 AS DOUBLE), CAST(100.4974 AS DOUBLE)),
      (CAST(7 AS INT), CAST(12519 AS BIGINT), CAST(629405 AS BIGINT), CAST(53660673.03 AS DOUBLE), CAST(100.4007 AS DOUBLE)),
      (CAST(8 AS INT), CAST(12518 AS BIGINT), CAST(627921 AS BIGINT), CAST(53720932.45 AS DOUBLE), CAST(100.648 AS DOUBLE))"""


@register(
    "datagen_store_sales_rollup",
    f"""
    SELECT * FROM (VALUES
      {_STORE_SALES_VALUES}
    ) AS t(ss_store_sk, n, total_qty, total_ext, avg_price)
    """,
)
def datagen_store_sales_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS-side datagen loop: generate the widest TPC-DS fact
    (store_sales, spec types from datagen/schemas.py) and roll it up
    per store — the reference generates/validates TPC-DS the same way
    it does TPC-H (`resources/TPC-datagen-notebook.scala:1818-1845`).
    Decimal money columns sum exactly (no double drift); the oracle
    pins the seed-100 aggregates as VALUES like the other gen_* loops."""
    from lakehouse_dba_tools_spark.datagen.generator import gen_store_sales

    ss = gen_store_sales(spark, 100_000, seed=100)
    return (
        ss.groupBy("ss_store_sk")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("ss_quantity").cast("long")).alias("total_qty"),
            F.round(F.sum("ss_ext_sales_price"), 2).cast("double").alias("total_ext"),
            F.round(
                F.sum("ss_list_price").cast("double") / F.count("*"), 4
            ).alias("avg_price"),
        )
    )
