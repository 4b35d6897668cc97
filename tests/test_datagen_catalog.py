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


def test_gen_supplier_part_partsupp_shapes_and_determinism(spark):
    from lakehouse_dba_tools_spark.datagen.generator import (
        gen_part,
        gen_partsupp,
        gen_supplier,
    )

    supp = gen_supplier(spark, 500, seed=100)
    assert supp.select("s_suppkey").distinct().count() == 500
    assert [f.name for f in supp.schema.fields] == [
        "s_suppkey", "s_name", "s_address", "s_nationkey", "s_phone",
        "s_acctbal", "s_comment",
    ]
    assert dict(supp.dtypes)["s_acctbal"] == "decimal(18,2)"

    part = gen_part(spark, 500, seed=100)
    assert part.select("p_partkey").distinct().count() == 500
    sizes = part.agg(F.min("p_size"), F.max("p_size")).collect()[0]
    assert 1 <= sizes[0] and sizes[1] <= 50
    assert dict(part.dtypes)["p_retailprice"] == "decimal(18,2)"

    ps = gen_partsupp(spark, 500, n_suppliers=100, seed=100)
    assert ps.count() == 2000  # 4 suppliers per part
    # (partkey, suppkey) pairs unique — the TPC-H spread formula
    assert ps.select("ps_partkey", "ps_suppkey").distinct().count() == 2000
    assert ps.filter(~F.col("ps_suppkey").between(1, 100)).count() == 0

    # determinism independent of partition count, sensitive to seed
    agg = lambda df: df.agg(  # noqa: E731
        F.sum("ps_availqty"), F.sum("ps_supplycost"), F.count("*")
    ).collect()[0]
    a = gen_partsupp(spark, 500, n_suppliers=100, seed=100, partitions=3)
    b = gen_partsupp(spark, 500, n_suppliers=100, seed=100, partitions=13)
    assert agg(a) == agg(b)
    c = gen_partsupp(spark, 500, n_suppliers=100, seed=9)
    assert agg(a) != agg(c)


def test_gen_partsupp_pair_uniqueness_at_spec_ratio(spark):
    """dbgen's supplier-spread formula (integer division, per the spec)
    keeps every (partkey, suppkey) pair distinct at the spec's
    P ≈ 20·S table ratio — the property downstream joins rely on."""
    from lakehouse_dba_tools_spark.datagen.generator import gen_partsupp

    for n_parts, n_sup in ((2_000, 100), (10_000, 1_000), (20_000, 1_000)):
        d = gen_partsupp(spark, n_parts, n_suppliers=n_sup, seed=100)
        assert (
            d.select("ps_partkey", "ps_suppkey").distinct().count() == n_parts * 4
        ), (n_parts, n_sup)


def test_write_partitioned_orc_roundtrip(spark, tmp_path):
    from lakehouse_dba_tools_spark.datagen.generator import gen_supplier

    supp = gen_supplier(spark, 1_000, seed=100).withColumn(
        "nation_band", (F.col("s_nationkey") % 5).cast("int")
    )
    out = str(tmp_path / "supp_orc")
    conf_before = spark.conf.get("spark.sql.orc.compression.codec", None)
    write_partitioned(supp, out, partition_by=["nation_band"], fmt="orc")
    assert len(glob.glob(out + "/nation_band=*")) == 5
    # compression is a writer option, not a session conf: snappy files
    # appear and the session conf is untouched (no leak into later
    # queries in the same session)
    assert glob.glob(out + "/nation_band=*/*.snappy.orc")
    assert spark.conf.get("spark.sql.orc.compression.codec", None) == conf_before
    back = spark.read.orc(out)
    assert back.count() == 1_000
    # partition column comes back (as the partition dir value); data
    # columns keep their types — decimal survives the ORC roundtrip
    assert dict(back.dtypes)["s_acctbal"] == "decimal(18,2)"
    assert back.select("s_suppkey").distinct().count() == 1_000


def test_full_benchmark_schema_catalog(spark, tmp_path):
    from lakehouse_dba_tools_spark.datagen.schemas import (
        TPCDS_SCHEMAS,
        TPCH_SCHEMAS,
        create_all_tables,
        partition_keys_for,
        schema_for,
    )

    # every declared schema parses to a StructType with >1 field
    assert len(TPCDS_SCHEMAS) == 24 and len(TPCH_SCHEMAS) == 8
    for t in list(TPCDS_SCHEMAS) + list(TPCH_SCHEMAS):
        assert len(schema_for(t).fields) >= 3, t
    # spot-check exact reference types survive the DDL roundtrip
    ss = {f.name: f.dataType.simpleString() for f in schema_for("store_sales").fields}
    assert ss["ss_sold_date_sk"] == "int"
    assert ss["ss_ticket_number"] == "bigint"
    assert ss["ss_net_profit"] == "decimal(7,2)"
    li = {f.name: f.dataType.simpleString() for f in schema_for("lineitem").fields}
    assert li["l_quantity"] == "decimal(18,2)"
    assert li["l_comment"] == "varchar(44)"
    # fact tables partition on their date keys, dims don't
    assert partition_keys_for("store_sales", "TPCDS") == ["ss_sold_date_sk"]
    assert partition_keys_for("item", "TPCDS") == []
    assert partition_keys_for("lineitem", "TPCH") == ["l_shipdate"]

    created = create_all_tables(spark, "tpcds_full", benchmark="TPCDS")
    try:
        assert len(created) == 24
        tables = {r["tableName"] for r in spark.sql("SHOW TABLES IN tpcds_full").collect()}
        assert set(created) <= tables
        # declared catalog schema matches the spec map
        got = dict(spark.table("tpcds_full.catalog_sales").dtypes)
        assert got["cs_order_number"] == "bigint"
        assert got["cs_net_profit"] == "decimal(7,2)"
        # idempotent
        assert create_all_tables(spark, "tpcds_full", benchmark="TPCDS") == created
    finally:
        spark.sql("DROP DATABASE IF EXISTS tpcds_full CASCADE")


def test_gen_nation_region_spec_rows(spark):
    from lakehouse_dba_tools_spark.datagen.generator import gen_nation, gen_region

    region = gen_region(spark)
    nation = gen_nation(spark)
    assert region.count() == 5 and nation.count() == 25
    # spec mapping: every nation's region exists; FRANCE is in EUROPE
    joined = nation.join(region, nation.n_regionkey == region.r_regionkey)
    assert joined.count() == 25
    fr = joined.filter(F.col("n_name") == "FRANCE").collect()[0]
    assert fr["r_name"] == "EUROPE"


def test_gen_store_sales_spec_types_and_determinism(spark):
    from lakehouse_dba_tools_spark.datagen.generator import gen_store_sales
    from lakehouse_dba_tools_spark.datagen.schemas import schema_for

    ss = gen_store_sales(spark, 3_000, seed=100)
    spec = {f.name: f.dataType.simpleString() for f in schema_for("store_sales").fields}
    for name, typ in ss.dtypes:
        assert spec[name] == typ, (name, typ, spec[name])
    row = ss.agg(
        F.min("ss_quantity"), F.max("ss_quantity"), F.min("ss_sales_price")
    ).collect()[0]
    assert 1 <= row[0] and row[1] <= 100 and float(row[2]) >= 0
    agg = lambda df: df.agg(F.sum("ss_ext_sales_price"), F.count("*")).collect()[0]  # noqa: E731
    assert agg(gen_store_sales(spark, 3_000, seed=100, partitions=3)) == agg(
        gen_store_sales(spark, 3_000, seed=100, partitions=11)
    )


def test_gate_export_equals_generator_output(spark):
    """The whole independent-oracle edifice rests on one invariant:
    the parquet warehouse the DuckDB oracles read (datagen/export.py)
    contains EXACTLY the rows the gate-scale generators produce. Pin
    it with exact-decimal checksums over a fact and a dim, plus row
    counts — if an export ever goes stale against a generator change
    (EXPORT_VERSION not bumped), this fails before any oracle does."""
    from pyspark.sql import functions as F

    from lakehouse_dba_tools_spark.datagen.export import (
        ensure_gate_export,
        warehouse_tables,
    )

    wh = ensure_gate_export(spark)
    gen = warehouse_tables(spark, scale=1)

    def sig(df, money_col, key_col):
        row = df.agg(
            F.count("*").alias("n"),
            F.sum(F.col(money_col).cast("decimal(38,12)")).alias("s"),
            F.expr(f"bit_xor(xxhash64(cast({key_col} as string)))").alias("h"),
        ).collect()[0]
        return (row["n"], row["s"], row["h"])

    for table, money, key in [
        ("store_sales", "ss_ext_sales_price", "ss_ticket_number"),
        ("web_returns", "wr_return_amt", "wr_order_number"),
        ("item", "i_current_price", "i_item_id"),
    ]:
        exported = spark.read.parquet(f"{wh}/{table}")
        assert sig(exported, money, key) == sig(gen[table], money, key), table


def test_datagen_export_equals_generator_output(spark):
    """Round-7 twin of the gate-export invariant for the
    datagen-verification export (queries_datagen's read-back oracles):
    the exported lineitem/supplier/partsupp/store_sales parquet must
    contain EXACTLY the rows the seed-100 generators produce."""
    from pyspark.sql import functions as F

    from lakehouse_dba_tools_spark.datagen.export import (
        _datagen_tables,
        ensure_datagen_export,
    )

    root = ensure_datagen_export(spark)
    gen = _datagen_tables(spark)

    def sig(df, money_col, key_col):
        row = df.agg(
            F.count("*").alias("n"),
            F.sum(F.col(money_col).cast("decimal(38,12)")).alias("s"),
            F.expr(f"bit_xor(xxhash64(cast({key_col} as string)))").alias("h"),
        ).collect()[0]
        return (row["n"], row["s"], row["h"])

    for table, money, key in [
        ("lineitem", "l_extendedprice", "l_orderkey"),
        ("supplier", "s_acctbal", "s_suppkey"),
        ("partsupp", "ps_supplycost", "ps_partkey"),
        ("store_sales", "ss_ext_sales_price", "ss_ticket_number"),
    ]:
        exported = spark.read.parquet(f"{root}/{table}")
        assert sig(exported, money, key) == sig(gen[table], money, key), table
