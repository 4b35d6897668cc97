from __future__ import annotations

import glob

from pyspark.sql import functions as F

from lakehouse_dba_tools_spark.datagen.generator import (
    external_process_source,
    gen_customer,
    gen_lineitem,
    gen_orders,
    write_partitioned,
)
from lakehouse_dba_tools_spark.maintenance.catalog import (
    create_database,
    create_table_if_not_exists,
    describe_columns,
    drop_database,
    list_tables,
    table_exists,
)


def test_gen_lineitem_deterministic_across_partitioning(spark):
    """Determinism must be a pure function of row id, not of the
    partition layout (stronger than the reference's fixed-split seed)."""
    a = gen_lineitem(spark, 10_000, seed=100, partitions=4)
    b = gen_lineitem(spark, 10_000, seed=100, partitions=17)
    agg = lambda df: df.agg(  # noqa: E731
        F.round(F.sum("l_quantity"), 2), F.round(F.sum("l_extendedprice"), 2), F.count("*")
    ).collect()[0]
    assert agg(a) == agg(b)
    c = gen_lineitem(spark, 10_000, seed=7, partitions=4)
    assert agg(a) != agg(c)


def test_gen_value_ranges(spark):
    li = gen_lineitem(spark, 5_000, seed=100)
    row = li.agg(
        F.min("l_quantity"), F.max("l_quantity"),
        F.min("l_discount"), F.max("l_discount"),
        F.min("l_shipdate"), F.max("l_shipdate"),
    ).collect()[0]
    assert 1.0 <= row[0] and row[1] <= 50.0
    assert 0.0 <= row[2] and row[3] <= 0.1
    assert str(row[4]) >= "1992-01-01" and str(row[5]) <= "1998-12-31"
    orders = gen_orders(spark, 1000)
    assert orders.select("o_orderkey").distinct().count() == 1000
    cust = gen_customer(spark, 100)
    assert cust.filter(F.col("c_nationkey").between(0, 24)).count() == 100


def test_write_partitioned_layout(spark, tmp_path):
    li = gen_lineitem(spark, 2_000, seed=100).withColumn(
        "ship_year", F.year("l_shipdate")
    )
    out = str(tmp_path / "li")
    write_partitioned(li, out, partition_by=["ship_year"])
    dirs = sorted(glob.glob(out + "/ship_year=*"))
    assert len(dirs) >= 5
    back = spark.read.parquet(out)
    assert back.count() == 2000
    # partition pruning: a year filter must scan only that partition
    plan = back.filter(F.col("ship_year") == 1995)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or back.filter(F.col("ship_year") == 1995).count() < 2000


def test_external_process_source(spark):
    """S6: stdout of a per-partition shell command becomes a typed DF."""
    df = external_process_source(
        spark,
        command_for_part="python3 -c \"print('\\n'.join(f'{part}|{i}|row{i}' for i in range(100)))\"",
        n_parts=3,
        ddl_schema="part int, seq int, label string",
    )
    assert df.count() == 300
    assert df.filter(F.col("part") == 1).count() == 100
    assert dict(df.dtypes) == {"part": "int", "seq": "int", "label": "string"}


def test_catalog_wrappers(spark):
    create_database(spark, "eng_test_db")
    try:
        create_table_if_not_exists(
            spark, "eng_test_db.t1", "id bigint, name string"
        )
        assert table_exists(spark, "eng_test_db.t1")
        assert not table_exists(spark, "eng_test_db.nope")
        tables = list_tables(spark, "eng_test_db")
        assert "t1" in {r.table_name for r in tables.collect()}
        cols = {r.col_name: r.data_type for r in describe_columns(spark, "eng_test_db.t1").collect()}
        assert cols == {"id": "bigint", "name": "string"}
    finally:
        drop_database(spark, "eng_test_db", cascade=True)


def test_catalog_rejects_bad_identifiers(spark):
    import pytest

    with pytest.raises(ValueError):
        create_database(spark, "bad; DROP TABLE x")
