"""Collection/date/null-semantics batteries (rounding out §2.8)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_dba_tools_spark.functions.stable import stable_avg, stable_sum
from lakehouse_dba_tools_spark.registry import register
from lakehouse_dba_tools_spark.sources.tables import load_table


@register(
    "array_function_battery",
    """
    WITH t AS (
      SELECT l_orderkey,
             list_sort(list(l_linenumber))                    AS lines,
             list_sort(list(round(l_quantity, 2)))            AS qtys
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT l_orderkey,
           len(lines)                                          AS n_lines,
           lines[1]                                            AS first_line,
           lines[-1]                                           AS last_line,
           round(list_sum(qtys), 2)                            AS qty_sum,
           round(list_max(qtys) - list_min(qtys), 2)           AS qty_spread,
           array_to_string(list_transform(lines, x -> CAST(x AS VARCHAR)), ',') AS line_csv,
           len(list_filter(qtys, q -> q > 25.0))               AS n_big
    FROM t
    """,
)
def array_function_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list/sort_array/element_at/aggregate/filter/concat_ws —
    the array algebra every nested-data pipeline leans on."""
    li = load_table(spark, sf_dir, "lineitem")
    grouped = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list("l_linenumber")).alias("lines"),
        F.sort_array(F.collect_list(F.round("l_quantity", 2))).alias("qtys"),
    )
    return grouped.select(
        "l_orderkey",
        F.size("lines").alias("n_lines"),
        F.element_at("lines", 1).alias("first_line"),
        F.element_at("lines", -1).alias("last_line"),
        F.round(F.aggregate("qtys", F.lit(0.0), lambda a, x: a + x), 2).alias("qty_sum"),
        F.round(F.array_max("qtys") - F.array_min("qtys"), 2).alias("qty_spread"),
        F.concat_ws(",", F.transform("lines", lambda x: x.cast("string"))).alias("line_csv"),
        F.size(F.filter("qtys", lambda q: q > 25.0)).alias("n_big"),
    )


@register(
    "explode_lineitem_quantities",
    """
    WITH t AS (SELECT l_orderkey, list_sort(list(round(l_quantity,2))) AS qtys
               FROM lineitem GROUP BY l_orderkey),
    e AS (SELECT l_orderkey, unnest(qtys) AS q FROM t)
    SELECT CAST(floor(q / 10) AS INT) AS qty_band, count(*) AS n
    FROM e GROUP BY qty_band
    """,
)
def explode_lineitem_quantities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect→explode roundtrip (array un-nesting at scale: explode is
    a generator, not a shuffle)."""
    li = load_table(spark, sf_dir, "lineitem")
    t = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list(F.round("l_quantity", 2))).alias("qtys")
    )
    return (
        t.select("l_orderkey", F.explode("qtys").alias("q"))
        .select(F.floor(F.col("q") / 10).cast("int").alias("qty_band"))
        .groupBy("qty_band")
        .agg(F.count("*").alias("n"))
    )


@register(
    "date_arithmetic_battery",
    """
    SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d')                  AS d,
           count(*)                                                         AS n,
           strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d')         AS month_end,
           CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
                                                                             AS days_since_epoch_start,
           CAST(EXTRACT(quarter FROM o_orderdate) AS INT)                    AS qtr,
           CAST(EXTRACT(doy FROM o_orderdate) AS INT)                        AS doy
    FROM orders
    GROUP BY d, plus30, month_end, days_since_epoch_start, qtr, doy
    """,
)
def date_arithmetic_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return (
        o.groupBy(
            F.date_format(d, "yyyy-MM-dd").alias("d"),
            F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("plus30"),
            F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
            F.datediff(d, F.lit("1992-01-01").cast("date")).cast("long").alias(
                "days_since_epoch_start"
            ),
            F.quarter(d).alias("qtr"),
            F.dayofyear(d).alias("doy"),
        )
        .agg(F.count("*").alias("n"))
        .select("d", "n", "plus30", "month_end", "days_since_epoch_start", "qtr", "doy")
    )


@register(
    "null_semantics_battery",
    """
    WITH t AS (
      SELECT c_custkey,
             CASE WHEN c_acctbal < 0 THEN NULL ELSE round(c_acctbal, 2) END AS bal,
             nullif(c_mktsegment, 'BUILDING') AS seg
      FROM customer
    )
    SELECT coalesce(seg, 'COALESCED')                 AS seg_c,
           count(*)                                   AS n_rows,
           count(bal)                                 AS n_bal,
           count(*) - count(bal)                      AS n_null_bal,
           CAST(round(sum(CAST(coalesce(bal, 0.0) AS DECIMAL(38,12))), 2) AS DOUBLE) AS bal_sum,
           round(CAST(sum(CAST(bal AS DECIMAL(38,12))) AS DOUBLE) / count(bal), 4) AS bal_avg_ignoring_nulls,
           sum(CASE WHEN bal IS NULL THEN 1 ELSE 0 END)::BIGINT AS isnull_count
    FROM t GROUP BY seg_c
    """,
)
def null_semantics_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL propagation parity: nullif/coalesce/count-ignores-null/
    avg-ignores-null (the semantics MERGE and reconcile depend on)."""
    c = load_table(spark, sf_dir, "customer")
    t = c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, None).otherwise(F.round("c_acctbal", 2)).alias("bal"),
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg"),
    )
    return t.groupBy(F.coalesce("seg", F.lit("COALESCED")).alias("seg_c")).agg(
        F.count("*").alias("n_rows"),
        F.count("bal").alias("n_bal"),
        (F.count("*") - F.count("bal")).alias("n_null_bal"),
        stable_sum(F.coalesce("bal", F.lit(0.0)), 2).alias("bal_sum"),
        stable_avg("bal", 4).alias("bal_avg_ignoring_nulls"),
        F.sum(F.col("bal").isNull().cast("long")).alias("isnull_count"),
    )


@register(
    "grouping_sets_events",
    """
    SELECT coalesce(event_type, 'ALL') AS et,
           coalesce(CAST(user_id % 10 AS VARCHAR), 'ALL') AS user_band,
           count(*) AS n, round(sum(value), 2) AS total
    FROM events
    GROUP BY GROUPING SETS ((event_type), (user_id % 10), ())
    """,
)
def grouping_sets_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (distinct from rollup/cube shapes)."""
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("_gs_events")
    return spark.sql(
        """
        SELECT coalesce(event_type, 'ALL') AS et,
               coalesce(CAST(user_id % 10 AS STRING), 'ALL') AS user_band,
               count(*) AS n, round(sum(value), 2) AS total
        FROM _gs_events
        GROUP BY GROUPING SETS ((event_type), (user_id % 10), ())
        """
    )
