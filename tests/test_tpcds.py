"""TPC-DS tier tests: generator schema fidelity, partition-count
determinism, FK join domains, and the plan shapes the 100 TB design
depends on (dims broadcast by size, one fact shuffle, top-k pushdown).
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F
from pyspark.sql.types import CharType, StringType, VarcharType

from lakehouse_dba_tools_spark.datagen.generator import gen_store_sales
from lakehouse_dba_tools_spark.datagen.schemas import schema_for
from lakehouse_dba_tools_spark.datagen.tpcds import (
    CD_ROWS,
    gen_customer_demographics,
    gen_date_dim,
    gen_item,
    gen_promotion,
    gen_store,
)
from lakehouse_dba_tools_spark.registry import QUERIES, load_all

load_all()


def _generators(spark):
    return {
        "date_dim": gen_date_dim(spark, n_days=60),
        "item": gen_item(spark, 500),
        "store": gen_store(spark),
        "customer_demographics": gen_customer_demographics(spark),
        "promotion": gen_promotion(spark),
        "store_sales": gen_store_sales(spark, 1_000),
    }


def test_generators_match_spec_schemas(spark):
    """Every generator emits the FULL spec column list, in spec order,
    with spec types (char/varchar as string — see tpcds.py docstring)."""
    for table, df in _generators(spark).items():
        spec = schema_for(table).fields
        assert [f.name for f in df.schema.fields] == [f.name for f in spec], table
        for have, want in zip(df.schema.fields, spec):
            expected = (
                StringType()
                if isinstance(want.dataType, (CharType, VarcharType))
                else want.dataType
            )
            assert have.dataType == expected, f"{table}.{want.name}"


def test_store_sales_rollup_partition_invariant(spark):
    """The determinism claim behind every pinned VALUES oracle: data is
    a pure function of row id, so any partitioning gives the same rows."""
    a = (
        gen_store_sales(spark, 20_000, partitions=4)
        .groupBy("ss_store_sk")
        .agg(F.sum("ss_ext_sales_price").alias("s"), F.count("*").alias("n"))
    )
    b = (
        gen_store_sales(spark, 20_000, partitions=13)
        .groupBy("ss_store_sk")
        .agg(F.sum("ss_ext_sales_price").alias("s"), F.count("*").alias("n"))
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_date_dim_julian_convention(spark):
    row = gen_date_dim(spark, n_days=3).orderBy("d_date_sk").first()
    assert row.d_date_sk == 2450815
    assert str(row.d_date) == "1998-01-01"
    assert row.d_year == 1998 and row.d_moy == 1 and row.d_holiday == "Y"


def test_customer_demographics_exact_cross_product(spark):
    cd = gen_customer_demographics(spark)
    demo_cols = [c for c in cd.columns if c != "cd_demo_sk"]
    got = cd.agg(
        F.count("*").alias("n"),
        F.countDistinct(*demo_cols).alias("combos"),
        F.countDistinct("cd_demo_sk").alias("sks"),
    ).first()
    assert got.n == CD_ROWS
    assert got.combos == CD_ROWS  # every row a distinct combination
    assert got.sks == CD_ROWS


def test_store_sales_fk_domains(spark):
    """Fact keys land inside the dimension key domains (star joins
    resolve; money identities hold exactly in decimal)."""
    ss = gen_store_sales(spark, 5_000)
    bounds = ss.agg(
        F.min("ss_sold_date_sk"),
        F.max("ss_sold_date_sk"),
        F.min("ss_item_sk"),
        F.max("ss_item_sk"),
        F.min("ss_store_sk"),
        F.max("ss_store_sk"),
        F.min("ss_cdemo_sk"),
        F.max("ss_cdemo_sk"),
        F.min("ss_promo_sk"),
        F.max("ss_promo_sk"),
    ).first()
    assert 2450815 <= bounds[0] and bounds[1] < 2450815 + 730
    assert 1 <= bounds[2] and bounds[3] <= 18_000
    assert 1 <= bounds[4] and bounds[5] <= 8
    assert 1 <= bounds[6] and bounds[7] <= CD_ROWS
    assert 1 <= bounds[8] and bounds[9] <= 300
    violations = ss.where(
        (F.col("ss_ext_list_price") != F.round(F.col("ss_list_price") * F.col("ss_quantity"), 2))
        | (F.col("ss_net_paid") != F.col("ss_ext_sales_price") - F.col("ss_coupon_amt"))
        | (
            F.col("ss_ext_discount_amt")
            != F.col("ss_ext_list_price") - F.col("ss_ext_sales_price")
        )
    ).count()
    assert violations == 0


def _plan(spark, name, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_q3_plan_single_fact_shuffle(spark, sf_dir):
    """The rollup family's scale contract: dims broadcast from SIZE
    ESTIMATES (no F.broadcast hints anywhere in the tier), the fact is
    reduced by exactly one shuffle exchange (the hash-agg), and the
    top-k runs as TakeOrderedAndProject, never a global sort."""
    plan = _plan(spark, "tpcds_q3_brand_rollup", sf_dir)
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2
    shuffles = re.findall(r"\(\d+\) Exchange\b", plan)
    assert len(shuffles) == 1, f"expected 1 shuffle, saw {len(shuffles)}"
    assert "TakeOrderedAndProject" in plan
    assert re.search(r"partial_sum", plan), "no map-side partial aggregation"


def test_q98_window_over_rollup(spark, sf_dir):
    """q98's window must partition the ROLLED-UP rows, not the fact:
    the Window node sits above the final HashAggregate."""
    plan = _plan(spark, "tpcds_q98_class_revenue_ratio", sf_dir)
    assert "Window" in plan
    win_pos = plan.find("Window")
    agg_pos = plan.find("HashAggregate")
    assert win_pos != -1 and agg_pos != -1
    # formatted plans print the tree root-first: the Window (downstream
    # of the agg) must appear before HashAggregate in the tree text.
    assert win_pos < agg_pos
