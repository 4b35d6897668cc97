"""End-to-end ETL pipeline queries — the reference's flagship trace
(SURVEY.md §3.1) composed from engine operators."""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_dba_tools_spark.functions.stable import stable_sum
from lakehouse_dba_tools_spark.operators.dedup import dedup_by_key
from lakehouse_dba_tools_spark.operators.flatten import compat_alias, splat_structs
from lakehouse_dba_tools_spark.registry import register
from lakehouse_dba_tools_spark.sources.json_records import paged_source
from lakehouse_dba_tools_spark.sources.tables import load_table

# REST-analog ingest bound: the driver-side payload is AT MOST
# MAX_PAGES × PAGE_SIZE records — the same bound a real paginated REST
# client has (reference QH pulls max_results-sized pages). Do not raise
# ETL_SLICE independently; it is derived so the driver-side collect can
# never exceed the page budget.
PAGE_SIZE = 100
MAX_PAGES = 5
ETL_SLICE = PAGE_SIZE * MAX_PAGES


@register(
    "query_history_etl_e2e",
    f"""
    WITH slice AS (SELECT * FROM events WHERE event_id < {ETL_SLICE}),
    deduped AS (
      SELECT * FROM slice
      QUALIFY row_number() OVER (PARTITION BY event_id
                                 ORDER BY epoch(ts), user_id) = 1
    )
    SELECT event_type, count(*) AS n_events,
           sum(CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT AS sum_k,
           CAST(round(sum(CAST(value AS DECIMAL(38,12))), 2) AS DOUBLE) AS sum_value,
           sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_final,
           MAX(event_id) AS max_queryid
    FROM deduped GROUP BY event_type
    """,
)
def query_history_etl_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The QH flagship pipeline end-to-end (reference §3.1):

    REST-paginated JSON (driver-side pages, the reference's S7 shape)
    → bool stringification (P12) → inferred nested schema (S1)
    → struct splat (P2) → epoch→timestamp (F1) → dedup-by-key (W1)
    → dup-column compat shim (P13 — the legacy `queryid` alias rides
    through the physical sink and feeds the rollup's max_queryid)
    → MERGE upsert into the warehouse table (S9/J3) → metrics rollup.

    The payload is derived from the events fixture so the DuckDB oracle
    can recompute the result relationally.

    Round-7: the warehouse merge is the PHYSICAL partition-pruned MERGE
    (`create_or_upsert_partitioned`) into a date-partitioned parquet
    table — the reference's hourly QH flow merges a 1-hour look-back
    into a table whose natural partition is the query-start date
    (QH:236-250), so each run rewrites only the day dirs the look-back
    touches. event_date = to_date(start_ts) is stable per event_id, as
    the pruning contract requires. First page plays the pre-existing
    table; the full slice then merges on top (updates + inserts), and
    the rollup reads the merged table back from disk.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < ETL_SLICE)
    # Build the "REST payload": nested records with a metrics struct and
    # a raw bool — exactly the shape the reference ingests.
    rows = ev.select(
        "event_id",
        (F.col("ts").cast("double")).alias("epoch"),
        "user_id",
        "event_type",
        "value",
        "props",
    ).collect()
    records = [
        {
            "event_id": r.event_id,
            "start_time_ms": int(round(r.epoch * 1000)),
            "user_id": r.user_id,
            "event_type": r.event_type,
            "is_final": bool(r.event_id % 2 == 0),
            "metrics": {"value": r.value, "k": int(json.loads(r.props)["k"])},
        }
        for r in rows
    ]
    pages = [records[i : i + PAGE_SIZE] for i in range(0, len(records), PAGE_SIZE)]

    df = paged_source(spark, iter(pages), stringify_bools=True)
    flat = splat_structs(df, ["metrics"])
    flat = flat.withColumn("start_ts", F.timestamp_millis(F.col("start_time_ms")))
    deduped = dedup_by_key(flat, ["event_id"], ["start_time_ms", "user_id"])
    deduped = deduped.withColumn("event_date", F.to_date("start_ts"))
    # P13 dup-column compat shim (operators/flatten.py): the reference
    # keeps the legacy `queryid` column as a live alias of the renamed
    # key for downstream readers of the warehouse table; the alias is
    # carried THROUGH the physical merge and read back for the rollup,
    # so the max_queryid output column is wrong unless the shim
    # projected the right source column into the sink.
    deduped = compat_alias(deduped, {"queryid": "event_id"})

    # warehouse upsert: first page plays the pre-existing table, the
    # full slice merges on top — a real partition-pruned parquet MERGE
    # (only touched event_date dirs rewrite; QH:236-250's hourly flow)
    import shutil
    import tempfile

    from lakehouse_dba_tools_spark.operators.upsert import (
        create_or_upsert_partitioned,
    )

    tmp = tempfile.mkdtemp(prefix="qh_etl_")
    wh_path = f"{tmp}/query_history"
    try:
        first_page = deduped.filter(F.col("event_id") < PAGE_SIZE)
        create_or_upsert_partitioned(
            spark, first_page, wh_path, ["event_id"], partition_col="event_date"
        )
        create_or_upsert_partitioned(
            spark, deduped, wh_path, ["event_id"], partition_col="event_date"
        )
        merged = spark.read.parquet(wh_path)
        out = merged.groupBy("event_type").agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("k").cast("bigint")).alias("sum_k"),
            stable_sum("value", 2).alias("sum_value"),
            F.sum((F.col("is_final") == "true").cast("bigint")).alias("n_final"),
            F.max("queryid").alias("max_queryid"),
        )
        # pin before the tempdir vanishes (cache blocks are evictable)
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "props_map_extract",
    """
    SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket,
           count(*) AS n
    FROM events GROUP BY k_bucket
    """,
)
def props_map_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json into MapType (schema-full parse — the F4 alternative to
    get_json_object string probing)."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.withColumn("props_map", F.from_json("props", "map<string,int>"))
    return (
        parsed.select((F.col("props_map")["k"] % 10).alias("k_bucket"))
        .groupBy("k_bucket")
        .agg(F.count("*").alias("n"))
    )


@register(
    "csv_roundtrip_ingest",
    """
    SELECT count(*) AS n,
           CAST(sum(n_nationkey) AS BIGINT) AS key_sum,
           count(DISTINCT n_regionkey) AS n_regions
    FROM nation
    """,
)
def csv_roundtrip_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2/S14 file-format roundtrip: nation → csv (header) → inferred
    re-read → checksum. The oracle recomputes the checksum straight off
    the parquet table — the roundtrip must be lossless for the three
    aggregates to agree."""
    import shutil
    import tempfile

    nation = load_table(spark, sf_dir, "nation")
    tmp = tempfile.mkdtemp(prefix="csv_roundtrip_")
    try:
        path = f"{tmp}/nation_csv"
        nation.coalesce(1).write.mode("overwrite").option("header", True).csv(path)
        back = spark.read.csv(path, header=True, inferSchema=True)
        out = back.agg(
            F.count("*").alias("n"),
            F.sum("n_nationkey").cast("long").alias("key_sum"),
            F.countDistinct("n_regionkey").alias("n_regions"),
        )
        # pin before the tempdir vanishes (cache blocks are evictable)
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
