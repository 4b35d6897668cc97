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


def _lineitem_rollup_oracle() -> str:
    from lakehouse_dba_tools_spark.datagen.export import rp_datagen
    from lakehouse_dba_tools_spark.functions.stable import (
        stable_avg_sql,
        stable_sum_sql,
    )

    return f"""
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           {stable_sum_sql('l_quantity', 2)} AS sum_qty,
           {stable_avg_sql('l_extendedprice', 4)} AS avg_price
    FROM {rp_datagen('lineitem')}
    GROUP BY l_returnflag, l_linestatus
    """


@register("datagen_lineitem_rollup", _lineitem_rollup_oracle())
def datagen_lineitem_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generate 200k synthetic lineitem rows distributed (seed=100,
    partition-count-independent determinism) and roll them up — the
    datagen → verify loop of the reference (TPC:1818-1845 + 1929-1956).

    Round-7 oracle independence: the generated rows are exported once
    per machine (`datagen/export.py ensure_datagen_export`) and DuckDB
    RECOMPUTES the rollup from that parquet — an independent
    formulation of the aggregation over the same rows (the
    tpcds_warehouse_build_audit read-back pattern), replacing the old
    pinned-VALUES determinism pin. Export rows == generator rows is
    pinned by test_datagen_export_equals_generator_output; determinism
    across partition counts by tests/test_datagen_catalog.py."""
    from lakehouse_dba_tools_spark.datagen.export import ensure_datagen_export

    ensure_datagen_export(spark)
    li = gen_lineitem(spark, 200_000, seed=100)
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        stable_sum("l_quantity", 2).alias("sum_qty"),
        stable_avg("l_extendedprice", 4).alias("avg_price"),
    )


def _supplier_partsupp_oracle() -> str:
    from lakehouse_dba_tools_spark.datagen.export import rp_datagen

    return f"""
    SELECT s_nationkey, count(*) AS n,
           CAST(sum(CAST(ps_availqty AS BIGINT)) AS BIGINT) AS total_qty,
           CAST(min(ps_supplycost) AS DOUBLE) AS min_cost,
           CAST(round(sum(s_acctbal), 2) AS DOUBLE) AS total_bal
    FROM {rp_datagen('partsupp')} ps
    JOIN {rp_datagen('supplier')} s ON ps.ps_suppkey = s.s_suppkey
    GROUP BY s_nationkey
    """


@register("datagen_supplier_partsupp", _supplier_partsupp_oracle())
def datagen_supplier_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generated supplier × partsupp join rollup — the reference's
    full-schema datagen loop (`resources/TPC-datagen-notebook.scala:
    1413-1491` declares all 8 TPC-H schemas; 1818-1845 generates and
    verifies). partsupp is the fact (4 rows/part), supplier the dim —
    but supplier scales with the datagen config, so the join is left to
    AQE (which broadcasts the 1k-row dim here, and demotes at real
    scale); the rollup is a 25-key hash agg with map-side partials.
    Oracle: DuckDB re-joins and re-aggregates the exported generator
    rows (round-7 read-back conversion; decimal sums exact on both
    engines)."""
    from lakehouse_dba_tools_spark.datagen.export import ensure_datagen_export
    from lakehouse_dba_tools_spark.datagen.generator import gen_partsupp, gen_supplier

    ensure_datagen_export(spark)
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


def _store_sales_rollup_oracle() -> str:
    from lakehouse_dba_tools_spark.datagen.export import rp_datagen

    return f"""
    SELECT ss_store_sk, count(*) AS n,
           CAST(sum(CAST(ss_quantity AS BIGINT)) AS BIGINT) AS total_qty,
           CAST(round(sum(ss_ext_sales_price), 2) AS DOUBLE) AS total_ext,
           round(CAST(sum(ss_list_price) AS DOUBLE) / count(*), 4) AS avg_price
    FROM {rp_datagen('store_sales')}
    GROUP BY ss_store_sk
    """


@register("datagen_store_sales_rollup", _store_sales_rollup_oracle())
def datagen_store_sales_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS-side datagen loop: generate the widest TPC-DS fact
    (store_sales, spec types from datagen/schemas.py) and roll it up
    per store — the reference generates/validates TPC-DS the same way
    it does TPC-H (`resources/TPC-datagen-notebook.scala:1818-1845`).
    Decimal money columns sum exactly (no double drift); the oracle is
    DuckDB recomputing the rollup from the exported generator rows
    (round-7 read-back conversion — NOTE this export is the 100k-row
    verification table, distinct from the TPC-DS warehouse's 200k
    store_sales)."""
    from lakehouse_dba_tools_spark.datagen.export import ensure_datagen_export
    from lakehouse_dba_tools_spark.datagen.generator import gen_store_sales

    ensure_datagen_export(spark)
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
