"""The remaining TPC-H query shapes — full 22-query coverage.

`queries_tpch.py` carries q2/q4/q6/q12/q14/q15/q17/q18/q19/q20/q22 and
`queries.py` carries the q1 rollup (pricing_summary); this module adds
the other ten, adapted to the fixture star schema like the rest (the
reference's stress harness drives the full TPC corpus —
`evaluation_tools/dbstress__Current.py:93-103`). Fixture deltas: no
partsupp table (q9 prices cost off p_retailprice; q11/q16 use lineitem
as the part↔supplier bridge), no l_commitdate (q21 defines lateness as
l_shipdate > o_orderdate + 60 days), no p_mfgr (q8 filters p_type).
Every query keeps its canonical PLAN shape — that's what the engine
must execute well at 100 TB:

- q3/q10: fact-fact join → grouped rollup → deterministic top-k
  (TakeOrderedAndProject, never a full sort).
- q5/q7/q8/q9: star joins — fixed-cardinality dims (nation/region)
  carry explicit broadcast hints; SF-scaling tables (customer/part/
  supplier, which reach 150M+ rows at sf1000) are left unhinted so
  CBO/AQE broadcasts them at small scale and demotes to shuffle joins
  when they outgrow the threshold — an explicit hint would override
  that demotion and OOM the job. orders⋈lineitem shuffles on the join
  key with map-side partial aggregation after.
- q11/q22: scalar-subquery threshold — 1-row aggregate broadcast back
  via crossJoin, compared in exact decimal (never a double boundary).
- q13: left-outer fact join with an ON-clause residual predicate, then
  a two-level aggregation.
- q16: anti-join supplier exclusion + count(DISTINCT) per group.
- q21: the exists/not-exists double correlation, reformulated as ONE
  per-order aggregate joined back — two correlated semi/anti joins
  against lineitem would scan the big fact three times; the rollup
  form scans it once (the oracle keeps the literal EXISTS form, so the
  equivalence is hash-checked).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_dba_tools_spark.functions.stable import stable_sum, stable_sum_sql
from lakehouse_dba_tools_spark.registry import register
from lakehouse_dba_tools_spark.sources.tables import load_table

_REV = "l_extendedprice * (1 - l_discount)"


def _rev() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@register(
    "q3_shipping_priority",
    f"""
    SELECT * FROM (
      SELECT l_orderkey,
             {stable_sum_sql(_REV, 2)} AS revenue,
             strftime(o_orderdate, '%Y-%m-%d') AS orderdate
      FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < DATE '1996-06-01'
        AND l_shipdate  > DATE '1996-06-01'
      GROUP BY l_orderkey, o_orderdate
    )
    ORDER BY revenue DESC, orderdate, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3: segment filter → two-fact join → top-10 unshipped orders by
    revenue. customer scales with SF so it carries no broadcast hint
    (AQE broadcasts it while small); the orders⋈lineitem shuffle keys
    on orderkey; the final cut is TakeOrderedAndProject."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1996-06-01").cast("date")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-06-01").cast("date")
    )
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(stable_sum(_rev(), 2).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), "orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "q5_local_supplier_revenue",
    f"""
    SELECT n_name, {stable_sum_sql(_REV, 2)} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
    GROUP BY n_name
    """,
)
def q5_local_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5: the canonical star join — nation⋈region (fixed 25/5 rows)
    broadcasts by hint; supplier and customer scale with SF so sizing
    is left to CBO/AQE; the local-supplier condition (c_nationkey =
    s_nationkey) rides the lineitem join as a residual, never a second
    shuffle."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    sup = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    sup_nat = sup.join(
        F.broadcast(nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)),
        sup.s_nationkey == F.col("n_nationkey"),
    )
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .join(
            sup_nat,
            (li.l_suppkey == sup_nat.s_suppkey)
            & (F.col("c_nationkey") == sup_nat.s_nationkey),
        )
        .groupBy("n_name")
        .agg(stable_sum(_rev(), 2).alias("revenue"))
    )


@register(
    "q7_volume_shipping",
    f"""
    SELECT supp_nation, cust_nation, l_year, {stable_sum_sql("volume", 2)} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS BIGINT) AS l_year,
             {_REV} AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1998-01-01'
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7: bidirectional nation-pair trade volume by year. Both nation
    legs broadcast with the disjunctive pair predicate as a post-join
    residual; only orders⋈lineitem shuffles."""
    sup = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("date"))
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year")
        )
        .agg(stable_sum(_rev(), 2).alias("revenue"))
    )


@register(
    "q8_market_share",
    f"""
    SELECT o_year,
           CAST(round(CAST(sum(CASE WHEN supp_nation = 'NATION_5'
                                    THEN CAST(volume AS DECIMAL(38,12)) ELSE 0 END) AS DOUBLE)
                      / CAST(sum(CAST(volume AS DECIMAL(38,12))) AS DOUBLE), 6) AS DOUBLE)
             AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             {_REV} AS volume,
             n1.n_name AS supp_nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      JOIN region   ON n2.n_regionkey = r_regionkey
      WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
        AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1998-01-01'
    )
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8: national market share inside a region — ratio of conditional
    exact-decimal sums per year. nation/region broadcast by hint;
    part/supplier/customer are unhinted (AQE-sized); the only shuffles
    are orders⋈lineitem and the 2-key final agg."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    sup = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("date"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey).select(
        F.col("n_nationkey").alias("n2_key")
    )
    dec = F.col("volume").cast("decimal(38,12)")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            _rev().alias("volume"),
            "supp_nation",
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_5", dec).otherwise(0))
                .cast("double")
                / F.sum(dec).cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


@register(
    "q9_product_profit",
    f"""
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS BIGINT) AS o_year,
           {stable_sum_sql(
        "l_extendedprice * (1 - l_discount) - 0.5 * p_retailprice * l_quantity", 2
    )} AS sum_profit
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, o_year
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9: profit by supplier nation and order year for a part family.
    The fixture has no partsupp, so unit cost is priced off the part
    dim (0.5 × p_retailprice) — same join DAG, same agg shape."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    profit = _rev() - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(stable_sum(profit, 2).alias("sum_profit"))
    )


@register(
    "q10_returned_items",
    f"""
    SELECT * FROM (
      SELECT c_custkey, c_name, n_name,
             {stable_sum_sql(_REV, 2)} AS revenue
      FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-04-01'
      GROUP BY c_custkey, c_name, n_name
    )
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10: top-20 customers by returned-revenue in a quarter —
    broadcast customer+nation dims, orderkey shuffle, top-k cut."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("date"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(stable_sum(_rev(), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q11_important_stock",
    f"""
    WITH supval AS (
      SELECT l_partkey, CAST({_REV} AS DECIMAL(38,12)) AS val
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_7'
    ),
    tot AS (SELECT sum(val) AS total FROM supval)
    SELECT l_partkey,
           CAST(round(sum(val), 2) AS DOUBLE) AS part_value
    FROM supval, tot
    GROUP BY l_partkey, total
    HAVING sum(val) * 800 > total
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11: parts holding an outsized share of one nation's line value
    (fixture has no partsupp, so lineitem is the part↔supplier bridge).
    The threshold is a 1-row exact-decimal aggregate broadcast back via
    crossJoin and compared cross-multiplied (value × 800 > total) —
    never a double boundary, no driver collect."""
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    li = load_table(spark, sf_dir, "lineitem")
    supval = (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select("l_partkey", _rev().cast("decimal(38,12)").alias("val"))
    )
    tot = supval.agg(F.sum("val").alias("total"))
    return (
        supval.groupBy("l_partkey")
        .agg(F.sum("val").alias("part_val"))
        .crossJoin(F.broadcast(tot))
        .filter(F.col("part_val") * 800 > F.col("total"))
        .select("l_partkey", F.round("part_val", 2).cast("double").alias("part_value"))
    )


@register(
    "q13_customer_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13: order-count distribution over a left-outer join whose ON
    clause carries a residual predicate (the filter must NOT drop
    order-less customers — the zero bucket is the point)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    joined = cust.join(
        orders,
        (cust.c_custkey == orders.o_custkey)
        & (orders.o_orderpriority != "1-URGENT"),
        "left_outer",
    )
    return (
        joined.groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@register(
    "q16_supplier_relation_count",
    """
    SELECT p_brand, p_type, p_size, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#11' AND p_type <> 'PROMO'
      AND p_size IN (1, 9, 19, 23, 36, 45, 49, 3)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_supplier_relation_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16: distinct suppliers per part group, excluding a supplier
    denylist (fixture: negative balances stand in for the complaint
    regex; lineitem bridges part↔supplier absent partsupp). The
    denylist anti-join is AQE-sized (the negative-balance subset scales
    with SF); count(DISTINCT) shuffles only the group keys + suppkey."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#11")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 19, 23, 36, 45, 49, 3)
    )
    bad_sup = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(
            bad_sup.select("s_suppkey"),
            li.l_suppkey == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q21_waiting_suppliers",
    """
    SELECT * FROM (
      SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
      FROM supplier
      JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      JOIN orders ON o_orderkey = l1.l_orderkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE o_orderstatus = 'F' AND n_name = 'NATION_3'
        AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        AND EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
      GROUP BY s_name
    )
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21: suppliers who were the SOLE late supplier in a
    multi-supplier order (lateness = shipped >60 days after the order
    date; the fixture has no commit/receipt dates). The canonical
    exists/not-exists pair would scan lineitem three times; here one
    per-order aggregate (distinct suppliers, distinct LATE suppliers)
    joins back to the late lines — the oracle keeps the literal EXISTS
    form, so the reformulation is hash-checked equivalent."""
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")

    lines = li.join(
        orders.select("o_orderkey", "o_orderdate"),
        li.l_orderkey == F.col("o_orderkey"),
    ).withColumn(
        "is_late",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).cast(
            "int"
        ),
    )
    order_stats = lines.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("is_late") == 1, F.col("l_suppkey"))).alias(
            "n_late_supp"
        ),
    )
    late_lines = lines.filter(F.col("is_late") == 1)
    return (
        late_lines.join(order_stats.filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)), "l_orderkey")
        .join(sup, F.col("l_suppkey") == sup.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )
