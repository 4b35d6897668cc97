from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_dba_tools_spark.maintenance.catalog import (
    create_table_as,
    insert_into,
    register_external_table,
    show_partitions,
)
from lakehouse_dba_tools_spark.sources.tables import load_table


def test_ctas_and_insert_into(spark, sf_dir):
    nation = load_table(spark, sf_dir, "nation")
    try:
        create_table_as(spark, "ctas_nation", nation.filter(F.col("n_nationkey") < 10))
        assert spark.table("ctas_nation").count() == 10
        # insert with shuffled column order — by-name alignment must fix it
        rest = nation.filter(F.col("n_nationkey") >= 10).select(
            "n_regionkey", "n_name", "n_nationkey"
        )
        insert_into(spark, "ctas_nation", rest, by_name=True)
        out = spark.table("ctas_nation")
        assert out.count() == 25
        assert out.filter(F.col("n_nationkey") == 24).select("n_name").count() == 1
        # replace semantics
        create_table_as(spark, "ctas_nation", nation.limit(5))
        assert spark.table("ctas_nation").count() == 5
    finally:
        spark.sql("DROP TABLE IF EXISTS ctas_nation")


def test_external_table_msck_and_show_partitions(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    loc = str(tmp_path / "orders_part")
    orders.write.partitionBy("order_year").parquet(loc)
    try:
        register_external_table(
            spark,
            "ext_orders",
            loc,
            partitioned_by=["order_year"],
            ddl_columns=(
                "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
                "o_totalprice double, o_orderdate timestamp, o_orderpriority string, "
                "order_year int"
            ),
        )
        parts = {r[0] for r in show_partitions(spark, "ext_orders").collect()}
        years = {r[0] for r in orders.select("order_year").distinct().collect()}
        assert parts == {f"order_year={y}" for y in years}
        assert spark.table("ext_orders").count() == orders.count()
        # partition pruning through the catalog table
        plan = (
            spark.table("ext_orders")
            .filter(F.col("order_year") == 1995)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "PartitionFilters" in plan
    finally:
        spark.sql("DROP TABLE IF EXISTS ext_orders")
