"""Query-metrics observability — the reference's pillar-1 product,
rebuilt from Spark-native sources.

The reference harvests per-query metrics (`execution_time_ms`,
`read_bytes`, `pruned_files_count`, `rows_read_count`, …) from the
Databricks Query History REST API (`tasks/Query History API to
Delta_withmetrics.py:125-143`). Open-source Spark exposes the same
facts on the executed plan itself: every physical operator carries
SQLMetrics (output rows, scan bytes, files read, spill bytes, shuffle
bytes). ``capture_metrics`` walks the executed plan after an action
and lands them as a DataFrame — ready to append into the same kind of
metrics warehouse table the reference maintains.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

METRICS_SCHEMA = T.StructType(
    [
        T.StructField("query_name", T.StringType()),
        T.StructField("node_id", T.IntegerType()),
        T.StructField("node_name", T.StringType()),
        T.StructField("metric_name", T.StringType()),
        T.StructField("metric_value", T.LongType()),
        T.StructField("wall_ms", T.DoubleType()),
    ]
)


def _walk(node, out, counter):
    cls = node.getClass().getSimpleName()
    # Unwrap AQE containers: the real operators (and their metrics) live
    # inside the adaptive root / materialized query stages.
    if cls == "AdaptiveSparkPlanExec":
        _walk(node.executedPlan(), out, counter)
        return
    if cls.endswith("QueryStageExec"):
        _walk(node.plan(), out, counter)
        return
    nid = counter[0]
    counter[0] += 1
    name = node.nodeName()
    metrics = node.metrics()
    it = metrics.iterator()
    while it.hasNext():
        entry = it.next()
        metric = entry._2()
        out.append((nid, name, str(entry._1()), int(metric.value())))
    children = node.children()
    cit = children.iterator()
    while cit.hasNext():
        _walk(cit.next(), out, counter)


def capture_metrics(
    spark: SparkSession, df: DataFrame, query_name: str = "query"
) -> DataFrame:
    """Execute ``df``'s own query execution (JVM-side row count — full
    plan runs, nothing reaches the driver but a long) and return its
    per-operator SQLMetrics. A separate sink write would spawn a NEW
    QueryExecution and leave this plan's metrics empty.
    """
    t0 = time.time()
    df._jdf.queryExecution().toRdd().count()
    wall_ms = (time.time() - t0) * 1000
    plan = df._jdf.queryExecution().executedPlan()
    rows: list[tuple] = []
    _walk(plan, rows, [0])
    data = [
        (query_name, nid, name, metric, value, round(wall_ms, 3))
        for nid, name, metric, value in rows
    ]
    return spark.createDataFrame(data, METRICS_SCHEMA)


def scan_summary(metrics: DataFrame) -> DataFrame:
    """The reference's headline columns (rows read, files, bytes) from
    the raw metric rows."""
    from pyspark.sql import functions as F

    scans = metrics.filter(F.col("node_name").contains("Scan"))
    return scans.groupBy("query_name").agg(
        F.sum(F.when(F.col("metric_name") == "numOutputRows", F.col("metric_value"))).alias(
            "rows_read_count"
        ),
        F.sum(F.when(F.col("metric_name") == "numFiles", F.col("metric_value"))).alias(
            "read_files_count"
        ),
        F.sum(F.when(F.col("metric_name") == "filesSize", F.col("metric_value"))).alias(
            "read_bytes"
        ),
    )
