"""Distributed deterministic TPC-H-style data generator.

The reference generates benchmark tables by piping external dbgen/
dsdgen binaries on every executor with a fixed RNGSEED=100
(`resources/TPC-datagen-notebook.scala:1549-1606,1648-1652`), then
parsing the pipe-delimited output. Two rebuilds here:

- ``gen_*``: the Spark-native path — ``spark.range(N)`` + pure column
  algebra, with per-row randomness derived from ``xxhash64(id, seed)``.
  Fully deterministic REGARDLESS of partitioning (the reference's
  determinism depends on fixed child/parallel splits; ours is a pure
  function of row id), embarrassingly parallel, no external binary, no
  text parsing, scales to any SF by changing N.
- ``external_process_source``: the S6 operator shape itself — run a
  shell command per partition and stream its stdout lines as rows —
  for when the generator must be an existing binary.

Uniform doubles come from the 53-bit mantissa trick on the 64-bit hash.
"""

from __future__ import annotations

import shlex
import subprocess
from collections.abc import Iterator

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_MASK53 = (1 << 53) - 1


def _u(seed_tag: str) -> Column:
    """Uniform [0,1) double derived from the row id — deterministic,
    partition-independent."""
    h = F.xxhash64(F.col("id"), F.lit(seed_tag))
    return (h.bitwiseAND(F.lit(_MASK53).cast("long"))).cast("double") / float(1 << 53)


def _choice(seed_tag: str, values: list[str]) -> Column:
    idx = (F.xxhash64(F.col("id"), F.lit(seed_tag)) % len(values) + len(values)) % len(values)
    arr = F.array(*[F.lit(v) for v in values])
    return arr[idx.cast("int")]


RETURN_FLAGS = ["A", "N", "R"]
LINE_STATUS = ["O", "F"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]


def gen_lineitem(spark: SparkSession, n_rows: int, seed: int = 100, partitions: int | None = None) -> DataFrame:
    """Synthetic lineitem at any scale — one projection over range()."""
    parts = partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, n_rows, 1, parts)
    days = (_u(f"ship{seed}") * 2520).cast("int")  # ~7 years of ship dates
    return base.select(
        (F.col("id") / 4 + 1).cast("long").alias("l_orderkey"),
        ((F.xxhash64("id", F.lit(f"pk{seed}")) % 20000 + 20000) % 20000 + 1).alias("l_partkey"),
        ((F.xxhash64("id", F.lit(f"sk{seed}")) % 1000 + 1000) % 1000 + 1).alias("l_suppkey"),
        (F.col("id") % 4 + 1).cast("int").alias("l_linenumber"),
        F.round(_u(f"qty{seed}") * 49 + 1, 2).alias("l_quantity"),
        F.round(_u(f"px{seed}") * 99000 + 1000, 2).alias("l_extendedprice"),
        F.round(_u(f"disc{seed}") * 0.1, 2).alias("l_discount"),
        F.round(_u(f"tax{seed}") * 0.08, 2).alias("l_tax"),
        _choice(f"rf{seed}", RETURN_FLAGS).alias("l_returnflag"),
        _choice(f"ls{seed}", LINE_STATUS).alias("l_linestatus"),
        F.date_add(F.lit("1992-01-01").cast("date"), days).alias("l_shipdate"),
    )


def gen_orders(spark: SparkSession, n_rows: int, seed: int = 100, partitions: int | None = None) -> DataFrame:
    parts = partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, n_rows, 1, parts)
    days = (_u(f"od{seed}") * 2400).cast("int")
    return base.select(
        (F.col("id") + 1).alias("o_orderkey"),
        ((F.xxhash64("id", F.lit(f"ck{seed}")) % 15000 + 15000) % 15000 + 1).alias("o_custkey"),
        _choice(f"st{seed}", ["O", "F", "P"]).alias("o_orderstatus"),
        F.round(_u(f"tp{seed}") * 450000 + 900, 2).alias("o_totalprice"),
        F.date_add(F.lit("1992-01-01").cast("date"), days).alias("o_orderdate"),
        _choice(f"pr{seed}", PRIORITIES).alias("o_orderpriority"),
    )


def gen_customer(spark: SparkSession, n_rows: int, seed: int = 100, partitions: int | None = None) -> DataFrame:
    parts = partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, n_rows, 1, parts)
    return base.select(
        (F.col("id") + 1).alias("c_custkey"),
        F.concat(F.lit("Customer#"), F.lpad((F.col("id") + 1).cast("string"), 9, "0")).alias("c_name"),
        (F.col("id") % 25).cast("int").alias("c_nationkey"),
        F.round(_u(f"bal{seed}") * 10999.98 - 999.99, 2).alias("c_acctbal"),
        _choice(f"seg{seed}", SEGMENTS).alias("c_mktsegment"),
    )


def gen_supplier(spark: SparkSession, n_rows: int, seed: int = 100, partitions: int | None = None) -> DataFrame:
    """Synthetic supplier with the reference's exact column types
    (`resources/TPC-datagen-notebook.scala:1482-1490`): BIGINT keys,
    DECIMAL(18,2) balances, fixed-width-ish strings."""
    parts = partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, n_rows, 1, parts)
    return base.select(
        (F.col("id") + 1).alias("s_suppkey"),
        F.concat(F.lit("Supplier#"), F.lpad((F.col("id") + 1).cast("string"), 9, "0")).alias("s_name"),
        F.concat(F.lit("addr-"), F.conv(F.abs(F.xxhash64("id", F.lit(f"sa{seed}"))).cast("string"), 10, 16)).alias("s_address"),
        (F.col("id") % 25).alias("s_nationkey"),
        F.concat(
            (F.col("id") % 25 + 10).cast("string"),
            F.lit("-"),
            F.lpad(((F.xxhash64("id", F.lit(f"sp{seed}")) % 1000 + 1000) % 1000).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad(((F.xxhash64("id", F.lit(f"sp2{seed}")) % 10000 + 10000) % 10000).cast("string"), 4, "0"),
        ).alias("s_phone"),
        F.round(_u(f"sbal{seed}") * 10999.98 - 999.99, 2).cast("decimal(18,2)").alias("s_acctbal"),
        _choice(f"scom{seed}", ["reliable", "prompt", "slow", "standard"]).alias("s_comment"),
    )


P_TYPES_1 = ["STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO"]
P_TYPES_2 = ["ANODIZED", "BURNISHED", "PLATED", "POLISHED", "BRUSHED"]
P_TYPES_3 = ["TIN", "NICKEL", "BRASS", "STEEL", "COPPER"]
P_CONTAINERS_1 = ["SM", "MED", "LG", "JUMBO", "WRAP"]
P_CONTAINERS_2 = ["CASE", "BOX", "BAG", "JAR", "PKG", "PACK", "CAN", "DRUM"]


def gen_part(spark: SparkSession, n_rows: int, seed: int = 100, partitions: int | None = None) -> DataFrame:
    """Synthetic part with the reference's exact column types
    (`resources/TPC-datagen-notebook.scala:1459-1469`). p_type/p_brand/
    p_container follow the TPC-H public-spec vocabulary shapes."""
    parts = partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, n_rows, 1, parts)
    mfgr = (F.xxhash64("id", F.lit(f"pm{seed}")) % 5 + 5) % 5 + 1
    brand = (F.xxhash64("id", F.lit(f"pb{seed}")) % 5 + 5) % 5 + 1
    return base.select(
        (F.col("id") + 1).alias("p_partkey"),
        F.concat(
            _choice(f"pn1{seed}", ["red", "blue", "green", "ivory", "azure"]),
            F.lit(" "),
            _choice(f"pn2{seed}", ["dim", "bright", "pale", "deep", "spotted"]),
            F.lit(" "),
            _choice(f"pn3{seed}", ["steel", "tin", "brass", "copper", "nickel"]),
        ).alias("p_name"),
        F.concat(F.lit("Manufacturer#"), mfgr.cast("string")).alias("p_mfgr"),
        F.concat(F.lit("Brand#"), mfgr.cast("string"), brand.cast("string")).alias("p_brand"),
        F.concat_ws(
            " ",
            _choice(f"pt1{seed}", P_TYPES_1),
            _choice(f"pt2{seed}", P_TYPES_2),
            _choice(f"pt3{seed}", P_TYPES_3),
        ).alias("p_type"),
        ((F.xxhash64("id", F.lit(f"psz{seed}")) % 50 + 50) % 50 + 1).cast("int").alias("p_size"),
        F.concat_ws(
            " ", _choice(f"pc1{seed}", P_CONTAINERS_1), _choice(f"pc2{seed}", P_CONTAINERS_2)
        ).alias("p_container"),
        F.round(_u(f"prp{seed}") * 1200 + 900, 2).cast("decimal(18,2)").alias("p_retailprice"),
        _choice(f"pcm{seed}", ["ironic", "bold", "final", "quick"]).alias("p_comment"),
    )


def gen_partsupp(
    spark: SparkSession,
    n_parts_rows: int,
    n_suppliers: int,
    seed: int = 100,
    partitions: int | None = None,
) -> DataFrame:
    """Synthetic partsupp (`resources/TPC-datagen-notebook.scala:
    1471-1477`): 4 supplier rows per part, supplier assignment spread
    deterministically by the dbgen formula. (partkey, suppkey)
    uniqueness is the spec's guarantee and holds at dbgen's P ≈ 20·S
    table ratio (pinned by test); arbitrary (n_parts, n_suppliers)
    ratios can make d·(S/4 + (p-1)/S) wrap to 0 mod S and collide —
    same as dbgen itself."""
    parts = partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, n_parts_rows * 4, 1, parts)
    partkey = (F.floor(F.col("id") / 4) + 1).cast("long")
    # TPC-H dbgen's supplier-spread formula, with the spec's INTEGER
    # division on both terms — (S/4 and (p-1)/S as floor) — which is
    # what guarantees the 4 suppliers of a part are pairwise distinct
    # for every (n_parts, n_suppliers); double division only kept that
    # property for particular configs.
    i = F.col("id") % 4
    spread = F.lit(n_suppliers // 4) + F.floor((partkey - 1) / F.lit(n_suppliers))
    suppkey = ((partkey + i * spread) % n_suppliers + 1).cast("long")
    return base.select(
        partkey.alias("ps_partkey"),
        suppkey.alias("ps_suppkey"),
        ((F.xxhash64("id", F.lit(f"aq{seed}")) % 9999 + 9999) % 9999 + 1).cast("int").alias("ps_availqty"),
        F.round(_u(f"sc{seed}") * 999 + 1, 2).cast("decimal(18,2)").alias("ps_supplycost"),
        _choice(f"psc{seed}", ["even", "careful", "pending", "express"]).alias("ps_comment"),
    )


# Public TPC-H spec fixed dimensions (25 nations → 5 regions); dbgen
# emits exactly these rows at every scale factor.
TPCH_REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
TPCH_NATIONS = [
    ("ALGERIA", 0), ("ARGENTINA", 1), ("BRAZIL", 1), ("CANADA", 1),
    ("EGYPT", 4), ("ETHIOPIA", 0), ("FRANCE", 3), ("GERMANY", 3),
    ("INDIA", 2), ("INDONESIA", 2), ("IRAN", 4), ("IRAQ", 4),
    ("JAPAN", 2), ("JORDAN", 4), ("KENYA", 0), ("MOROCCO", 0),
    ("MOZAMBIQUE", 0), ("PERU", 1), ("CHINA", 2), ("ROMANIA", 3),
    ("SAUDI ARABIA", 4), ("VIETNAM", 2), ("RUSSIA", 3),
    ("UNITED KINGDOM", 3), ("UNITED STATES", 1),
]


def gen_region(spark: SparkSession) -> DataFrame:
    """The 5 fixed TPC-H regions (scale-factor independent)."""
    return spark.createDataFrame(
        [(i, name, f"region {name.lower()}") for i, name in enumerate(TPCH_REGIONS)],
        "r_regionkey bigint, r_name string, r_comment string",
    )


def gen_nation(spark: SparkSession) -> DataFrame:
    """The 25 fixed TPC-H nations with their spec region mapping."""
    return spark.createDataFrame(
        [
            (i, name, rk, f"nation {name.lower()}")
            for i, (name, rk) in enumerate(TPCH_NATIONS)
        ],
        "n_nationkey bigint, n_name string, n_regionkey bigint, n_comment string",
    )


def gen_store_sales(
    spark: SparkSession, n_rows: int, seed: int = 100, partitions: int | None = None
) -> DataFrame:
    """Synthetic store_sales with the FULL TPC-DS spec schema
    (`resources/TPC-datagen-notebook.scala:1246-1272` — the widest
    TPC-DS fact, 23 columns): integer surrogate keys, bigint ticket
    number, decimal(7,2) money columns, conformed to
    schemas.TPCDS_SCHEMAS column order. Foreign keys land in the
    domains of the datagen.tpcds dimension generators (date_dim 2 years
    from 2450815, item 1..18000, store 1..8, customer_demographics
    1..1,920,800, promotion 1..300) so star joins resolve. Money
    columns satisfy the spec identities exactly in decimal arithmetic:
    ext_list = list*qty, ext_discount = ext_list - ext_sales,
    net_paid = ext_sales - coupon, net_profit = net_paid -
    ext_wholesale."""
    from lakehouse_dba_tools_spark.datagen.tpcds import CD_ROWS, conform

    parts = partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, n_rows, 1, parts)
    price = F.round(_u(f"lp{seed}") * 199 + 1, 2).cast("decimal(7,2)")
    qty = ((F.xxhash64("id", F.lit(f"q{seed}")) % 100 + 100) % 100 + 1).cast("int")
    discount = F.round(_u(f"dc{seed}") * 0.3, 2).cast("decimal(7,2)")
    wholesale = F.round(price * F.lit(0.6), 2).cast("decimal(7,2)")
    sales_price = F.round(price * (1 - discount), 2).cast("decimal(7,2)")
    ext_sales = F.round(price * (1 - discount) * qty, 2).cast("decimal(7,2)")
    ext_list = F.round(price * qty, 2).cast("decimal(7,2)")
    ext_wholesale = F.round(wholesale * qty, 2).cast("decimal(7,2)")
    ext_tax = F.round(ext_sales * F.lit(0.05), 2).cast("decimal(7,2)")
    coupon = (
        F.when(
            (F.xxhash64("id", F.lit(f"cp{seed}")) % 10 + 10) % 10 == 0,
            F.round(ext_sales * F.lit(0.1), 2),
        )
        .otherwise(F.lit(0))
        .cast("decimal(7,2)")
    )
    net_paid = (ext_sales - coupon).cast("decimal(7,2)")
    out = base.select(
        # ~2 years of date surrogate keys, TPC-DS style (days since epoch base)
        ((F.xxhash64("id", F.lit(f"d{seed}")) % 730 + 730) % 730 + 2450815)
        .cast("int")
        .alias("ss_sold_date_sk"),
        ((F.xxhash64("id", F.lit(f"t{seed}")) % 86400 + 86400) % 86400)
        .cast("int")
        .alias("ss_sold_time_sk"),
        ((F.xxhash64("id", F.lit(f"i{seed}")) % 18000 + 18000) % 18000 + 1)
        .cast("int")
        .alias("ss_item_sk"),
        ((F.xxhash64("id", F.lit(f"c{seed}")) % 50000 + 50000) % 50000 + 1)
        .cast("int")
        .alias("ss_customer_sk"),
        ((F.xxhash64("id", F.lit(f"cd{seed}")) % CD_ROWS + CD_ROWS) % CD_ROWS + 1)
        .cast("int")
        .alias("ss_cdemo_sk"),
        ((F.xxhash64("id", F.lit(f"hd{seed}")) % 7200 + 7200) % 7200 + 1)
        .cast("int")
        .alias("ss_hdemo_sk"),
        ((F.xxhash64("id", F.lit(f"ad{seed}")) % 50000 + 50000) % 50000 + 1)
        .cast("int")
        .alias("ss_addr_sk"),
        ((F.xxhash64("id", F.lit(f"st{seed}")) % 8 + 8) % 8 + 1)
        .cast("int")
        .alias("ss_store_sk"),
        ((F.xxhash64("id", F.lit(f"pm{seed}")) % 300 + 300) % 300 + 1)
        .cast("int")
        .alias("ss_promo_sk"),
        (F.col("id") / 3 + 1).cast("bigint").alias("ss_ticket_number"),
        qty.alias("ss_quantity"),
        wholesale.alias("ss_wholesale_cost"),
        price.alias("ss_list_price"),
        sales_price.alias("ss_sales_price"),
        (ext_list - ext_sales).cast("decimal(7,2)").alias("ss_ext_discount_amt"),
        ext_sales.alias("ss_ext_sales_price"),
        ext_wholesale.alias("ss_ext_wholesale_cost"),
        ext_list.alias("ss_ext_list_price"),
        ext_tax.alias("ss_ext_tax"),
        coupon.alias("ss_coupon_amt"),
        net_paid.alias("ss_net_paid"),
        (net_paid + ext_tax).cast("decimal(7,2)").alias("ss_net_paid_inc_tax"),
        (net_paid - ext_wholesale).cast("decimal(7,2)").alias("ss_net_profit"),
    )
    return conform(out, "store_sales")


ORC_CONFS = {
    # The reference's ORC write-path conf set
    # (`resources/TPC-datagen-notebook.scala:130-137`): native impl,
    # vectorized reads, filter pushdown, snappy.
    "spark.sql.orc.impl": "native",
    "spark.sql.orc.enableVectorizedReader": "true",
    "spark.sql.orc.filterPushdown": "true",
    "spark.sql.orc.compression.codec": "snappy",
}


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    fmt: str = "parquet",
    coalesce_to: int | None = None,
) -> None:
    """Partitioned table writer (reference S12/S13): repartition by the
    partition key first so each Hive partition is written by one task
    (avoids the many-small-files explosion), or coalesce unpartitioned
    output to bound file count. ``fmt`` accepts parquet/orc/csv/json."""
    writer = df
    if partition_by:
        writer = df.repartition(*[F.col(c) for c in partition_by])
    elif coalesce_to:
        writer = df.coalesce(coalesce_to)
    w = writer.write.mode("overwrite").format(fmt)
    if fmt == "orc":
        # Of the reference's ORC conf set (ORC_CONFS), impl=native /
        # vectorized reads / filter pushdown are Spark 4 defaults; the
        # one write-scoped knob (compression) rides the writer as an
        # option so nothing leaks into later queries' session state.
        w = w.option("compression", ORC_CONFS["spark.sql.orc.compression.codec"])
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def external_process_source(
    spark: SparkSession,
    command_for_part: str,
    n_parts: int,
    ddl_schema: str,
    delimiter: str = "|",
) -> DataFrame:
    """The S6 operator: run ``command_for_part.format(part=i)`` on one
    executor per partition, stream stdout lines, parse with a declared
    schema (reference BlockingLineStream + pipe-CSV parse,
    TPC:1549-1606,1705-1720).

    Backpressure comes from the iterator protocol itself: lines are
    consumed as Spark pulls them, with the pipe's OS buffer bounding
    producer run-ahead (the reference hand-rolled a bounded queue).
    """

    def run(part_iter: Iterator[int]) -> Iterator[tuple]:
        for part in part_iter:
            # targeted substitution — .format() would choke on other
            # brace literals in the command text
            cmd = command_for_part.replace("{part}", str(part))
            proc = subprocess.Popen(
                shlex.split(cmd), stdout=subprocess.PIPE, text=True, bufsize=1 << 16
            )
            assert proc.stdout is not None
            for line in proc.stdout:
                line = line.rstrip("\n")
                if line:
                    yield tuple(line.split(delimiter))
            if proc.wait() != 0:
                raise RuntimeError(f"generator exited {proc.returncode} for part {part}")

    rdd = spark.sparkContext.parallelize(range(n_parts), n_parts).mapPartitions(run)
    raw = spark.createDataFrame(rdd, schema=", ".join(f"{f.split()[0]} string" for f in ddl_schema.split(",")))
    # cast to the declared types
    casts = []
    for field in ddl_schema.split(","):
        name, typ = field.strip().split()
        casts.append(F.col(name).cast(typ).alias(name))
    return raw.select(*casts)
