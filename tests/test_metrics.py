from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_dba_tools_spark.maintenance.metrics import capture_metrics, scan_summary
from lakehouse_dba_tools_spark.sources.tables import load_table


def test_capture_metrics_populates_real_values(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    q = li.filter(F.col("l_quantity") > 25).groupBy("l_returnflag").agg(
        F.count("*").alias("n")
    )
    m = capture_metrics(spark, q, "probe")
    rows = m.collect()
    assert rows and all(r.query_name == "probe" for r in rows)
    byname = {}
    for r in rows:
        byname.setdefault((r.node_name, r.metric_name), r.metric_value)
    # final aggregate emitted exactly the distinct flag count
    agg_outs = [
        v for (n, mname), v in byname.items() if n == "HashAggregate" and mname == "numOutputRows"
    ]
    expected = q.count()
    assert expected in agg_outs
    assert all(r.wall_ms > 0 for r in rows)


def test_scan_summary_matches_reality(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    m = capture_metrics(spark, li.groupBy().agg(F.count("*").alias("n")), "scan_q")
    s = scan_summary(m).collect()[0]
    assert s.rows_read_count == li.count()
    assert s.read_files_count >= 1
    assert s.read_bytes > 0


def test_hll_union_partition_invariant(spark, sf_dir):
    """Mergeable-sketch contract behind hll_mergeable_user_counts: the
    union of per-slice sketches gives the same estimate regardless of
    how the slices are cut (10 vs 3 partitions, day-sliced vs whole)."""
    from pyspark.sql import functions as F

    from lakehouse_dba_tools_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("user_id")
    est = lambda df: df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(14))).alias("e")
    ).first().e
    assert est(ev.repartition(10)) == est(ev.repartition(3))
    # two-level merge equals one-pass
    two_level = (
        ev.repartition(7)
        .withColumn("slice", F.spark_partition_id())
        .groupBy("slice")
        .agg(F.hll_sketch_agg("user_id", F.lit(14)).alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e"))
        .first()
        .e
    )
    assert two_level == est(ev)
