"""Correlated/scalar subquery shapes (TPC Q2/Q15/Q17) + regexp battery."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_dba_tools_spark.registry import register
from lakehouse_dba_tools_spark.sources.tables import load_table


@register(
    "q17_small_quantity_revenue",
    """
    SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly
    FROM lineitem l
    WHERE l.l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
                          FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated per-group scalar subquery (Q17): rewritten as a
    window average over the same key — ONE scan + one shuffle instead
    of the naive scan-per-outer-row; Catalyst reaches the same shape
    when decorrelating, the window form just states it directly."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey")
    return (
        li.withColumn("part_avg_qty", F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < 0.5 * F.col("part_avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"))
    )


@register(
    "q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery-against-derived-view (Q15): the revenue view is
    computed once and reused for both the max and the join."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("date"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("m"))
    sup = load_table(spark, sf_dir, "supplier")
    return (
        sup.join(revenue, sup.s_suppkey == revenue.supplier_no)
        .join(F.broadcast(max_rev), F.col("total_revenue") == F.col("m"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q2_min_cost_supplier",
    """
    WITH costs AS (
      SELECT l_partkey, l_suppkey, floor(min(l_extendedprice / l_quantity) * 10000) / 10000 AS unit_cost
      FROM lineitem WHERE l_quantity > 0 GROUP BY l_partkey, l_suppkey
    )
    SELECT c.l_partkey, c.l_suppkey, c.unit_cost
    FROM costs c
    WHERE c.unit_cost = (SELECT min(c2.unit_cost) FROM costs c2
                         WHERE c2.l_partkey = c.l_partkey)
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated min-subquery (Q2 shape): cheapest supplier per part —
    window-min over the derived cost table."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    costs = li.groupBy("l_partkey", "l_suppkey").agg(
        (F.floor(F.min(F.col("l_extendedprice") / F.col("l_quantity")) * 10000) / 10000).alias("unit_cost")
    )
    w = Window.partitionBy("l_partkey")
    return (
        costs.withColumn("min_cost", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .select("l_partkey", "l_suppkey", "unit_cost")
    )


@register(
    "regexp_battery",
    """
    SELECT regexp_extract(p_type, '^([a-z]+)', 1)                  AS type_head,
           count(*)                                                 AS n,
           sum(CASE WHEN regexp_matches(p_name, '^(red|blue)')
                    THEN 1 ELSE 0 END)::BIGINT                      AS n_colored,
           sum(CAST(length(regexp_replace(p_name, '[aeiou]', '', 'g')) AS BIGINT))::BIGINT
                                                                    AS consonant_len_sum,
           min(regexp_extract(p_brand, '([0-9]+)$', 1))             AS min_brand_num
    FROM part GROUP BY type_head
    """,
)
def regexp_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract / rlike / global regexp_replace parity (Spark
    replaces all matches by default; DuckDB needs the 'g' flag)."""
    p = load_table(spark, sf_dir, "part")
    return p.groupBy(
        F.regexp_extract("p_type", r"^([a-z]+)", 1).alias("type_head")
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("p_name").rlike(r"^(red|blue)").cast("long")).alias("n_colored"),
        F.sum(F.length(F.regexp_replace("p_name", "[aeiou]", "")).cast("long")).alias(
            "consonant_len_sum"
        ),
        F.min(F.regexp_extract("p_brand", r"([0-9]+)$", 1)).alias("min_brand_num"),
    )
