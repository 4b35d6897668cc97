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
