"""TPC-DS query tier — the reference's benchmark corpus, Spark-first.

The reference's whole stress harness exists to run the 99 TPC-DS v2.13
queries against dsdgen-built warehouses
(`evaluation_tools/dbstress__Current.py:93-103` loads
`queries/tpcds_2.13/*.sql`; job params at `:7-15` point it at
`tpcds_sf100`/`sf1000` databases). This module implements the
highest-frequency TPC-DS query *shapes* over the Spark-native
generators in ``datagen/tpcds.py`` (full spec schemas, deterministic by
construction): the q3/q42/q52/q55 date×item brand/category rollup
family, the q7 demographics star, the q65 store-item vs store-average
nested aggregation, and the q98 within-class revenue-ratio window.

Scale design (the 100 TB story):
- store_sales is the only SF-scaling side; it is never broadcast and
  every query reduces it with one hash-aggregate after dim filters.
- date_dim (1826 rows), store (8), promotion (300) are fixed-size dims
  — AQE/Catalyst broadcasts them from size estimates; no forced
  ``F.broadcast`` on item (18k at sf1 but SF-scaling per spec, like
  customer/part in TPC-H) or customer_demographics (1.92M rows fixed
  but wide enough that the optimizer should decide).
- Filters land before joins so partition pruning on ss_sold_date_sk
  (the spec partition key, schemas.TPCDS_PARTITION_KEYS) applies when
  the fact is a partitioned table rather than a generator.

Oracles: generated data has no DuckDB-readable twin, so each oracle
PINS the seed-100 results as VALUES — the generators are pure
functions of (seed, row id), aggregation stays in exact decimal
arithmetic until a final round-and-cast, and every ORDER BY carries a
unique tiebreak key, so the pinned rows are run- and
partitioning-invariant (pinned across partition counts in
tests/test_tpcds.py, same argument as `datagen_lineitem_rollup`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_dba_tools_spark.datagen.generator import gen_store_sales
from lakehouse_dba_tools_spark.datagen.tpcds import (
    gen_customer_demographics,
    gen_date_dim,
    gen_item,
    gen_promotion,
    gen_store,
)
from lakehouse_dba_tools_spark.registry import register

# One fact size for the whole tier: big enough that every group in the
# checked rollups is multi-row, small enough for the sf0.01 gate.
SS_ROWS = 200_000


def _star(spark: SparkSession):
    """The generated TPC-DS star: fact + the dims this tier touches."""
    ss = gen_store_sales(spark, SS_ROWS, seed=100)
    dd = gen_date_dim(spark)
    it = gen_item(spark, 18_000, seed=100)
    return ss, dd, it


def _money(col, ndigits: int = 2):
    """Exact-decimal sum → round → double, the hash-stable money path."""
    return F.round(F.sum(col), ndigits).cast("double")


@register(
    "tpcds_q3_brand_rollup",
    """
    SELECT * FROM (VALUES
      (CAST(1998 AS INT), CAST(4302 AS INT), 'Brand#43-2', CAST(68000.47 AS DOUBLE)),
      (CAST(1998 AS INT), CAST(4309 AS INT), 'Brand#43-9', CAST(52454.51 AS DOUBLE)),
      (CAST(1998 AS INT), CAST(4307 AS INT), 'Brand#43-7', CAST(51570.72 AS DOUBLE)),
      (CAST(1998 AS INT), CAST(4306 AS INT), 'Brand#43-6', CAST(45688.14 AS DOUBLE)),
      (CAST(1998 AS INT), CAST(4310 AS INT), 'Brand#43-10', CAST(26700.89 AS DOUBLE)),
      (CAST(1998 AS INT), CAST(4308 AS INT), 'Brand#43-8', CAST(21648.32 AS DOUBLE)),
      (CAST(1998 AS INT), CAST(4304 AS INT), 'Brand#43-4', CAST(21095.52 AS DOUBLE)),
      (CAST(1998 AS INT), CAST(4305 AS INT), 'Brand#43-5', CAST(19728.6 AS DOUBLE)),
      (CAST(1998 AS INT), CAST(4301 AS INT), 'Brand#43-1', CAST(15715.16 AS DOUBLE)),
      (CAST(1998 AS INT), CAST(4303 AS INT), 'Brand#43-3', CAST(4394.68 AS DOUBLE))
    ) AS t(d_year, i_brand_id, i_brand, sum_agg)
    """,
)
def tpcds_q3_brand_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q3 shape (`evaluation_tools/dbstress__Current.py:103`
    corpus): November sales of one manufacturer's items by brand and
    year. Fact filtered through two dim equi-joins, one hash-agg, top-k
    with deterministic tiebreak. d_moy pushes into date_dim's scan;
    i_manufact_id into item's — the fact joins only surviving keys."""
    ss, dd, it = _star(spark)
    return (
        ss.join(dd, ss.ss_sold_date_sk == dd.d_date_sk)
        .join(it, ss.ss_item_sk == it.i_item_sk)
        .where((F.col("i_manufact_id") == 43) & (F.col("d_moy") == 11))
        .groupBy("d_year", "i_brand_id", "i_brand")
        .agg(_money("ss_ext_sales_price").alias("sum_agg"))
        .orderBy(F.col("d_year"), F.col("sum_agg").desc(), F.col("i_brand_id"))
        .limit(10)
    )


@register(
    "tpcds_q7_demographics_star",
    """
    SELECT * FROM (VALUES
      ('0000000000000I22', CAST(4.0 AS DOUBLE), CAST(169.85 AS DOUBLE), CAST(0.0 AS DOUBLE), CAST(156.26 AS DOUBLE)),
      ('0000000000000I42', CAST(8.0 AS DOUBLE), CAST(149.42 AS DOUBLE), CAST(0.0 AS DOUBLE), CAST(110.57 AS DOUBLE)),
      ('0000000000000I61', CAST(30.5 AS DOUBLE), CAST(67.965 AS DOUBLE), CAST(0.0 AS DOUBLE), CAST(49.07 AS DOUBLE)),
      ('000000000000I111', CAST(32.0 AS DOUBLE), CAST(182.79 AS DOUBLE), CAST(0.0 AS DOUBLE), CAST(131.61 AS DOUBLE)),
      ('000000000000I140', CAST(15.0 AS DOUBLE), CAST(199.51 AS DOUBLE), CAST(0.0 AS DOUBLE), CAST(177.56 AS DOUBLE)),
      ('000000000000I149', CAST(43.0 AS DOUBLE), CAST(161.52 AS DOUBLE), CAST(0.0 AS DOUBLE), CAST(129.22 AS DOUBLE)),
      ('000000000000I162', CAST(69.0 AS DOUBLE), CAST(21.68 AS DOUBLE), CAST(0.0 AS DOUBLE), CAST(18.43 AS DOUBLE)),
      ('000000000000I165', CAST(84.0 AS DOUBLE), CAST(12.12 AS DOUBLE), CAST(0.0 AS DOUBLE), CAST(11.39 AS DOUBLE)),
      ('000000000000I181', CAST(3.0 AS DOUBLE), CAST(85.07 AS DOUBLE), CAST(0.0 AS DOUBLE), CAST(74.86 AS DOUBLE)),
      ('000000000000I182', CAST(79.0 AS DOUBLE), CAST(70.22 AS DOUBLE), CAST(0.0 AS DOUBLE), CAST(66.71 AS DOUBLE))
    ) AS t(i_item_id, agg1, agg2, agg3, agg4)
    """,
)
def tpcds_q7_demographics_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q7 shape: average sales metrics per item for one
    demographic slice in promoted transactions. Five-table star; the
    1.92M-row demographics cross-product is filtered to 1/70th by its
    predicate BEFORE the join (predicate pushdown), so the join-side
    stays small without any forced broadcast."""
    ss, dd, it = _star(spark)
    cd = gen_customer_demographics(spark)
    pr = gen_promotion(spark)
    return (
        ss.join(cd, ss.ss_cdemo_sk == cd.cd_demo_sk)
        .join(dd, ss.ss_sold_date_sk == dd.d_date_sk)
        .join(it, ss.ss_item_sk == it.i_item_sk)
        .join(pr, ss.ss_promo_sk == pr.p_promo_sk)
        .where(
            (F.col("cd_gender") == "M")
            & (F.col("cd_marital_status") == "S")
            & (F.col("cd_education_status") == "College")
            & ((F.col("p_channel_email") == "N") | (F.col("p_channel_event") == "N"))
            & (F.col("d_year") == 1998)
        )
        .groupBy("i_item_id")
        .agg(
            F.round(F.avg("ss_quantity"), 4).cast("double").alias("agg1"),
            F.round(F.avg("ss_list_price"), 4).cast("double").alias("agg2"),
            F.round(F.avg("ss_coupon_amt"), 4).cast("double").alias("agg3"),
            F.round(F.avg("ss_sales_price"), 4).cast("double").alias("agg4"),
        )
        .orderBy("i_item_id")
        .limit(10)
    )


@register(
    "tpcds_q42_category_rollup",
    """
    SELECT * FROM (VALUES
      (CAST(1998 AS INT), CAST(6 AS INT), 'Men', CAST(3881248.24 AS DOUBLE)),
      (CAST(1998 AS INT), CAST(2 AS INT), 'Children', CAST(3687374.53 AS DOUBLE)),
      (CAST(1998 AS INT), CAST(9 AS INT), 'Sports', CAST(3593318.92 AS DOUBLE)),
      (CAST(1998 AS INT), CAST(7 AS INT), 'Music', CAST(3536998.78 AS DOUBLE)),
      (CAST(1998 AS INT), CAST(4 AS INT), 'Home', CAST(3528890.05 AS DOUBLE)),
      (CAST(1998 AS INT), CAST(8 AS INT), 'Shoes', CAST(3523107.93 AS DOUBLE)),
      (CAST(1998 AS INT), CAST(5 AS INT), 'Jewelry', CAST(3445515.57 AS DOUBLE)),
      (CAST(1998 AS INT), CAST(1 AS INT), 'Books', CAST(3400838.22 AS DOUBLE)),
      (CAST(1998 AS INT), CAST(10 AS INT), 'Women', CAST(3340825.83 AS DOUBLE)),
      (CAST(1998 AS INT), CAST(3 AS INT), 'Electronics', CAST(3331471.92 AS DOUBLE))
    ) AS t(d_year, i_category_id, i_category, sum_agg)
    """,
)
def tpcds_q42_category_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q42 shape: one month's revenue by item category. The
    10-category domain makes this the low-cardinality end of the rollup
    family (map-side partials collapse almost everything)."""
    ss, dd, it = _star(spark)
    return (
        ss.join(dd, ss.ss_sold_date_sk == dd.d_date_sk)
        .join(it, ss.ss_item_sk == it.i_item_sk)
        .where((F.col("d_moy") == 11) & (F.col("d_year") == 1998))
        .groupBy("d_year", "i_category_id", "i_category")
        .agg(_money("ss_ext_sales_price").alias("sum_agg"))
        .orderBy(F.col("sum_agg").desc(), F.col("i_category_id"))
        .limit(10)
    )


@register(
    "tpcds_q52_brand_monthly",
    """
    SELECT * FROM (VALUES
      (CAST(1998 AS INT), CAST(9907 AS INT), 'Brand#99-7', CAST(112025.32 AS DOUBLE)),
      (CAST(1998 AS INT), CAST(2202 AS INT), 'Brand#22-2', CAST(109542.21 AS DOUBLE)),
      (CAST(1998 AS INT), CAST(7607 AS INT), 'Brand#76-7', CAST(106346.48 AS DOUBLE)),
      (CAST(1998 AS INT), CAST(5110 AS INT), 'Brand#51-10', CAST(102686.26 AS DOUBLE)),
      (CAST(1998 AS INT), CAST(9303 AS INT), 'Brand#93-3', CAST(99449.55 AS DOUBLE)),
      (CAST(1998 AS INT), CAST(802 AS INT), 'Brand#8-2', CAST(97426.54 AS DOUBLE)),
      (CAST(1998 AS INT), CAST(7608 AS INT), 'Brand#76-8', CAST(94590.36 AS DOUBLE)),
      (CAST(1998 AS INT), CAST(3002 AS INT), 'Brand#30-2', CAST(93518.75 AS DOUBLE)),
      (CAST(1998 AS INT), CAST(10006 AS INT), 'Brand#100-6', CAST(91626.29 AS DOUBLE)),
      (CAST(1998 AS INT), CAST(3804 AS INT), 'Brand#38-4', CAST(88719.15 AS DOUBLE))
    ) AS t(d_year, i_brand_id, i_brand, ext_price)
    """,
)
def tpcds_q52_brand_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q52 shape: December brand revenue leaderboard (q3 without
    the manufacturer filter — higher fact survival rate, bigger agg)."""
    ss, dd, it = _star(spark)
    return (
        ss.join(dd, ss.ss_sold_date_sk == dd.d_date_sk)
        .join(it, ss.ss_item_sk == it.i_item_sk)
        .where((F.col("d_moy") == 12) & (F.col("d_year") == 1998))
        .groupBy("d_year", "i_brand_id", "i_brand")
        .agg(_money("ss_ext_sales_price").alias("ext_price"))
        .orderBy(F.col("ext_price").desc(), F.col("i_brand_id"))
        .limit(10)
    )


@register(
    "tpcds_q55_manager_brands",
    """
    SELECT * FROM (VALUES
      (CAST(6209 AS INT), 'Brand#62-9', CAST(26688.69 AS DOUBLE)),
      (CAST(8809 AS INT), 'Brand#88-9', CAST(21607.57 AS DOUBLE)),
      (CAST(9107 AS INT), 'Brand#91-7', CAST(17026.25 AS DOUBLE)),
      (CAST(5007 AS INT), 'Brand#50-7', CAST(16167.4 AS DOUBLE)),
      (CAST(7804 AS INT), 'Brand#78-4', CAST(16053.29 AS DOUBLE)),
      (CAST(7703 AS INT), 'Brand#77-3', CAST(15813.39 AS DOUBLE)),
      (CAST(7008 AS INT), 'Brand#70-8', CAST(14292.93 AS DOUBLE)),
      (CAST(6107 AS INT), 'Brand#61-7', CAST(14093.89 AS DOUBLE)),
      (CAST(6002 AS INT), 'Brand#60-2', CAST(12585.65 AS DOUBLE)),
      (CAST(9604 AS INT), 'Brand#96-4', CAST(12516.19 AS DOUBLE))
    ) AS t(i_brand_id, i_brand, ext_price)
    """,
)
def tpcds_q55_manager_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q55 shape: one manager's brand revenue for one month."""
    ss, dd, it = _star(spark)
    return (
        ss.join(dd, ss.ss_sold_date_sk == dd.d_date_sk)
        .join(it, ss.ss_item_sk == it.i_item_sk)
        .where(
            (F.col("i_manager_id") == 28) & (F.col("d_moy") == 11) & (F.col("d_year") == 1999)
        )
        .groupBy("i_brand_id", "i_brand")
        .agg(_money("ss_ext_sales_price").alias("ext_price"))
        .orderBy(F.col("ext_price").desc(), F.col("i_brand_id"))
        .limit(10)
    )


@register(
    "tpcds_q65_underperforming_items",
    """
    SELECT * FROM (VALUES
      ('able', 'Premium handmade supplies', CAST(1.26 AS DOUBLE), CAST(30.84 AS DOUBLE), CAST(18.5 AS DOUBLE), 'Brand#67-3', CAST(55 AS INT)),
      ('able', 'Classic certified goods', CAST(7.96 AS DOUBLE), CAST(18.72 AS DOUBLE), CAST(11.23 AS DOUBLE), 'Brand#73-8', CAST(83 AS INT)),
      ('able', 'Durable imported items', CAST(8.62 AS DOUBLE), CAST(23.22 AS DOUBLE), CAST(13.93 AS DOUBLE), 'Brand#28-9', CAST(136 AS INT)),
      ('able', 'Durable everyday items', CAST(7.47 AS DOUBLE), CAST(63.1 AS DOUBLE), CAST(37.86 AS DOUBLE), 'Brand#90-2', CAST(159 AS INT)),
      ('able', 'Compact handmade essentials', CAST(1.52 AS DOUBLE), CAST(46.58 AS DOUBLE), CAST(27.95 AS DOUBLE), 'Brand#100-1', CAST(181 AS INT)),
      ('able', 'Durable imported essentials', CAST(7.6 AS DOUBLE), CAST(26.44 AS DOUBLE), CAST(15.86 AS DOUBLE), 'Brand#46-6', CAST(207 AS INT)),
      ('able', 'Compact seasonal essentials', CAST(7.92 AS DOUBLE), CAST(23.88 AS DOUBLE), CAST(14.33 AS DOUBLE), 'Brand#77-8', CAST(221 AS INT)),
      ('able', 'Popular everyday essentials', CAST(11.49 AS DOUBLE), CAST(26.87 AS DOUBLE), CAST(16.12 AS DOUBLE), 'Brand#68-7', CAST(225 AS INT)),
      ('able', 'Durable handmade items', CAST(4.88 AS DOUBLE), CAST(27.42 AS DOUBLE), CAST(16.45 AS DOUBLE), 'Brand#13-1', CAST(247 AS INT)),
      ('able', 'Classic imported supplies', CAST(2.17 AS DOUBLE), CAST(82.27 AS DOUBLE), CAST(49.36 AS DOUBLE), 'Brand#73-8', CAST(390 AS INT))
    ) AS t(s_store_name, i_item_desc, revenue, i_current_price, i_wholesale_cost, i_brand, item_sk)
    """,
)
def tpcds_q65_underperforming_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q65 shape: items whose revenue in a store runs under 10%
    of that store's average item revenue — aggregate, re-aggregate the
    aggregate, join the two back. The per-(store,item) rollup shuffles
    once; the per-store average is a rollup OF that result (tiny), so
    the second join broadcasts it by size without a hint."""
    ss, dd, _ = _star(spark)
    st = gen_store(spark)
    it = gen_item(spark, 18_000, seed=100)
    sa = (
        ss.join(dd, ss.ss_sold_date_sk == dd.d_date_sk)
        .where(F.col("d_month_seq").between(1176, 1187))
        .groupBy("ss_store_sk", "ss_item_sk")
        .agg(F.sum("ss_sales_price").alias("revenue"))
    )
    sb = sa.groupBy("ss_store_sk").agg(F.avg("revenue").alias("ave"))
    return (
        sa.join(sb, "ss_store_sk")
        .where(F.col("revenue") <= 0.1 * F.col("ave"))
        .join(st, sa.ss_store_sk == st.s_store_sk)
        .join(it, sa.ss_item_sk == it.i_item_sk)
        .select(
            "s_store_name",
            "i_item_desc",
            F.round("revenue", 2).cast("double").alias("revenue"),
            F.col("i_current_price").cast("double").alias("i_current_price"),
            F.col("i_wholesale_cost").cast("double").alias("i_wholesale_cost"),
            "i_brand",
            F.col("i_item_sk").alias("item_sk"),
        )
        .orderBy("s_store_name", "item_sk")
        .limit(10)
    )


@register(
    "tpcds_q98_class_revenue_ratio",
    """
    SELECT * FROM (VALUES
      ('000000000000I157', 'Books', 'accent', CAST(2850.12 AS DOUBLE), CAST(0.3619 AS DOUBLE)),
      ('000000000000I346', 'Books', 'accent', CAST(408.17 AS DOUBLE), CAST(0.0518 AS DOUBLE)),
      ('000000000000I464', 'Books', 'accent', CAST(720.07 AS DOUBLE), CAST(0.0914 AS DOUBLE)),
      ('000000000000I804', 'Books', 'accent', CAST(4076.06 AS DOUBLE), CAST(0.5175 AS DOUBLE)),
      ('00000000000I1488', 'Books', 'accent', CAST(5548.73 AS DOUBLE), CAST(0.7045 AS DOUBLE)),
      ('00000000000I1947', 'Books', 'accent', CAST(11347.52 AS DOUBLE), CAST(1.4407 AS DOUBLE)),
      ('00000000000I2180', 'Books', 'accent', CAST(15198.74 AS DOUBLE), CAST(1.9296 AS DOUBLE)),
      ('00000000000I2381', 'Books', 'accent', CAST(11001.33 AS DOUBLE), CAST(1.3967 AS DOUBLE)),
      ('00000000000I2507', 'Books', 'accent', CAST(10456.79 AS DOUBLE), CAST(1.3276 AS DOUBLE)),
      ('00000000000I2650', 'Books', 'accent', CAST(1125.09 AS DOUBLE), CAST(0.1428 AS DOUBLE)),
      ('00000000000I3810', 'Books', 'accent', CAST(15366.0 AS DOUBLE), CAST(1.9509 AS DOUBLE)),
      ('00000000000I3957', 'Books', 'accent', CAST(51.68 AS DOUBLE), CAST(0.0066 AS DOUBLE)),
      ('00000000000I4706', 'Books', 'accent', CAST(1291.57 AS DOUBLE), CAST(0.164 AS DOUBLE)),
      ('00000000000I5117', 'Books', 'accent', CAST(7704.38 AS DOUBLE), CAST(0.9781 AS DOUBLE)),
      ('00000000000I5167', 'Books', 'accent', CAST(10773.15 AS DOUBLE), CAST(1.3678 AS DOUBLE)),
      ('00000000000I5267', 'Books', 'accent', CAST(9048.04 AS DOUBLE), CAST(1.1487 AS DOUBLE)),
      ('00000000000I5412', 'Books', 'accent', CAST(3327.02 AS DOUBLE), CAST(0.4224 AS DOUBLE)),
      ('00000000000I5919', 'Books', 'accent', CAST(10793.66 AS DOUBLE), CAST(1.3704 AS DOUBLE)),
      ('00000000000I6443', 'Books', 'accent', CAST(5090.28 AS DOUBLE), CAST(0.6463 AS DOUBLE)),
      ('00000000000I6896', 'Books', 'accent', CAST(12278.79 AS DOUBLE), CAST(1.5589 AS DOUBLE))
    ) AS t(i_item_id, i_category, i_class, itemrevenue, revenueratio)
    """,
)
def tpcds_q98_class_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q98 shape: 30-day item revenue with each item's share of
    its class revenue — a window aggregate OVER a hash aggregate. The
    window partitions by i_class (16-value domain), so its shuffle
    moves only the rolled-up rows, never the fact."""
    ss, dd, it = _star(spark)
    rolled = (
        ss.join(dd, ss.ss_sold_date_sk == dd.d_date_sk)
        .join(it, ss.ss_item_sk == it.i_item_sk)
        .where(
            F.col("i_category").isin("Sports", "Books", "Home")
            & F.col("d_date").between("1999-02-22", "1999-03-24")
        )
        .groupBy("i_item_id", "i_item_desc", "i_category", "i_class", "i_current_price")
        .agg(F.sum("ss_ext_sales_price").alias("itemrevenue"))
    )
    w = Window.partitionBy("i_class")
    return (
        rolled.select(
            "i_item_id",
            "i_category",
            "i_class",
            F.round("itemrevenue", 2).cast("double").alias("itemrevenue"),
            F.round(
                F.col("itemrevenue") * 100 / F.sum("itemrevenue").over(w), 4
            )
            .cast("double")
            .alias("revenueratio"),
        )
        .orderBy("i_category", "i_class", "i_item_id")
        .limit(20)
    )
