"""Observability queries: executed-plan metrics as a queryable table
(the reference's pillar-1 product, Spark-native sources)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_dba_tools_spark.maintenance.metrics import capture_metrics, scan_summary
from lakehouse_dba_tools_spark.registry import register
from lakehouse_dba_tools_spark.sources.tables import load_table


@register(
    "observability_scan_metrics",
    """
    SELECT 'flag_rollup' AS query_name,
           (SELECT count(*) FROM lineitem) AS rows_read_count,
           (SELECT count(*) FROM (SELECT DISTINCT l_returnflag, l_linestatus
                                  FROM lineitem)) AS agg_output_rows
    """,
)
def observability_scan_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run a rollup, harvest its executed-plan SQLMetrics, and report
    the observability headline numbers — which the oracle can predict
    relationally (scan output rows == table count with no filter; final
    aggregate output == distinct group count). This is the reference's
    `rows_read_count` pipeline without any REST API."""
    li = load_table(spark, sf_dir, "lineitem")
    q = li.groupBy("l_returnflag", "l_linestatus").agg(F.count("*").alias("n"))
    m = capture_metrics(spark, q, "flag_rollup")
    m = m.cache()
    m.count()
    scan = scan_summary(m).select("query_name", "rows_read_count")
    agg_rows = (
        m.filter(
            (F.col("node_name") == "HashAggregate")
            & (F.col("metric_name") == "numOutputRows")
        )
        .groupBy("query_name")
        .agg(F.min("metric_value").alias("agg_output_rows"))
    )
    return scan.join(agg_rows, "query_name")


@register(
    "dq_constraint_report",
    """
    WITH unioned AS (
      SELECT 'orderkey_not_null' AS rule, 'not_null' AS kind,
             (SELECT count(*) FROM orders) AS n_rows,
             (SELECT count(*) FROM orders WHERE o_orderkey IS NULL) AS n_violations
      UNION ALL
      SELECT 'status_domain', 'accepted_values',
             (SELECT count(*) FROM orders),
             (SELECT count(*) FROM orders
              WHERE o_orderstatus IS NOT NULL
                AND o_orderstatus NOT IN ('O', 'F', 'P'))
      UNION ALL
      SELECT 'priority_format', 'regex',
             (SELECT count(*) FROM orders),
             (SELECT count(*) FROM orders
              WHERE o_orderpriority IS NOT NULL
                AND NOT regexp_matches(o_orderpriority, '^[1-5]-'))
      UNION ALL
      SELECT 'price_band', 'range',
             (SELECT count(*) FROM orders),
             (SELECT count(*) FROM orders
              WHERE o_totalprice IS NOT NULL
                AND (o_totalprice < 0 OR o_totalprice > 300000))
      UNION ALL
      SELECT 'orderkey_unique', 'unique',
             (SELECT count(*) FROM orders),
             (SELECT count(o_orderkey) - count(DISTINCT o_orderkey) FROM orders)
      UNION ALL
      SELECT 'custkey_fk', 'foreign_key',
             (SELECT count(*) FROM orders),
             (SELECT count(*) FROM orders
              WHERE o_custkey IS NOT NULL
                AND o_custkey NOT IN (SELECT c_custkey FROM customer))
    )
    SELECT rule, kind, n_rows, n_violations, n_violations = 0 AS passed
    FROM unioned
    """,
)
def dq_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative constraint suite over orders (maintenance/quality.py):
    5 row-level rules fold into ONE aggregate scan; uniqueness is a
    key-only hash agg; the customer FK probes a broadcast anti-join.
    price_band is deliberately tight (hi=300k < fixture max) so the
    report exercises a genuinely failing rule."""
    from lakehouse_dba_tools_spark.maintenance.quality import Rule, check_constraints

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    rules = [
        Rule("orderkey_not_null", "not_null", col="o_orderkey"),
        Rule("status_domain", "accepted_values", col="o_orderstatus", values=("O", "F", "P")),
        Rule("priority_format", "regex", col="o_orderpriority", pattern="^[1-5]-"),
        Rule("price_band", "range", col="o_totalprice", lo=0.0, hi=300000.0),
        Rule("orderkey_unique", "unique", col="o_orderkey"),
        Rule(
            "custkey_fk",
            "foreign_key",
            col="o_custkey",
            parent="customer",
            parent_keys=("c_custkey",),
        ),
    ]
    return check_constraints(orders, rules, parents={"customer": customer})


@register(
    "key_skew_report",
    """
    WITH f_cust AS (SELECT count(*) AS f FROM orders GROUP BY o_custkey),
         f_ord  AS (SELECT count(*) AS f FROM lineitem GROUP BY l_orderkey),
         f_user AS (SELECT count(*) AS f FROM events GROUP BY user_id)
    SELECT 'orders.o_custkey' AS key_col, sum(f)::BIGINT AS n_rows,
           count(*)::BIGINT AS n_keys, max(f)::BIGINT AS max_freq,
           round(sum(f)::DOUBLE / count(*), 4) AS avg_freq,
           round(max(f)::DOUBLE * count(*) / sum(f), 4) AS skew_ratio
    FROM f_cust
    UNION ALL
    SELECT 'lineitem.l_orderkey', sum(f)::BIGINT, count(*)::BIGINT, max(f)::BIGINT,
           round(sum(f)::DOUBLE / count(*), 4), round(max(f)::DOUBLE * count(*) / sum(f), 4)
    FROM f_ord
    UNION ALL
    SELECT 'events.user_id', sum(f)::BIGINT, count(*)::BIGINT, max(f)::BIGINT,
           round(sum(f)::DOUBLE / count(*), 4), round(max(f)::DOUBLE * count(*) / sum(f), 4)
    FROM f_user
    """,
)
def key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew pre-flight (maintenance/skew.py) over the three
    hottest join keys in the schema. Each profile is one keys-only
    exchange + a 1-row reduce; the report is what you consult before
    picking broadcast/salt/AQE-skew strategies for a 100 TB join."""
    from lakehouse_dba_tools_spark.maintenance.skew import key_skew_profile, skew_report

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    events = load_table(spark, sf_dir, "events")
    return skew_report(
        [
            key_skew_profile(orders, "o_custkey", "orders.o_custkey"),
            key_skew_profile(lineitem, "l_orderkey", "lineitem.l_orderkey"),
            key_skew_profile(events, "user_id", "events.user_id"),
        ]
    )
