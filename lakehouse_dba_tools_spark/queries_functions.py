"""Breadth batteries: scalar functions, full window-function set,
chunking, sampling/splits, range join — each oracle-checked."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_dba_tools_spark.functions.chunking import chunk_documents
from lakehouse_dba_tools_spark.functions.stable import stable_sum
from lakehouse_dba_tools_spark.operators.rangejoin import range_join
from lakehouse_dba_tools_spark.operators.sampling import (
    stratified_sample_topn,
    train_val_test_split,
)
from lakehouse_dba_tools_spark.registry import register
from lakehouse_dba_tools_spark.sources.tables import load_table

CHUNK, OVERLAP, STRIDE = 64, 16, 48


@register(
    "doc_chunking",
    f"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents
    ),
    n AS (
      SELECT doc_id, toks,
             greatest(CAST(ceil((len(toks) - {OVERLAP}) / {STRIDE}.0) AS INT), 1) AS n_chunks
      FROM t
    ),
    expanded AS (
      SELECT doc_id, toks, unnest(generate_series(0, n_chunks - 1)) AS i FROM n
    )
    SELECT doc_id, i AS chunk_idx,
           array_to_string(toks[i*{STRIDE}+1 : i*{STRIDE}+{CHUNK}], ' ') AS chunk_text,
           least(len(toks) - i*{STRIDE}, {CHUNK}) AS n_chunk_tokens
    FROM expanded
    """,
)
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-token-window chunking (64-token chunks, 16 overlap)."""
    docs = load_table(spark, sf_dir, "documents")
    out = chunk_documents(docs, chunk_tokens=CHUNK, overlap=OVERLAP)
    return out.select(
        "doc_id", "chunk_idx", "chunk_text", F.col("n_chunk_tokens").cast("long")
    )


@register(
    "train_val_test_split_counts",
    """
    WITH s AS (
      SELECT CASE
        WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'split-v1'), 1, 8)) AS BIGINT)
             / 4294967296.0 < 0.8 THEN 'train'
        WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'split-v1'), 1, 8)) AS BIGINT)
             / 4294967296.0 < 0.9 THEN 'val'
        ELSE 'test' END AS split,
        lang
      FROM documents
    )
    SELECT split, lang, count(*) AS n FROM s GROUP BY split, lang
    """,
)
def train_val_test_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash split (md5-derived uniform) — reproducible
    under any partitioning AND recomputable by the oracle engine."""
    docs = load_table(spark, sf_dir, "documents")
    split = train_val_test_split(docs, "doc_id", (0.8, 0.1, 0.1), salt="split-v1")
    return split.groupBy("split", "lang").agg(F.count("*").alias("n"))


@register(
    "stratified_sample_docs",
    """
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR) || 'sample-v1'),
                                         doc_id) AS rn
      FROM documents
    ) WHERE rn <= 20
    """,
)
def stratified_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-20-per-language deterministic sample (hash-ranked)."""
    docs = load_table(spark, sf_dir, "documents")
    return stratified_sample_topn(docs, ["lang"], 20, "doc_id").select("doc_id", "lang")


@register(
    "events_in_first_2h_per_user",
    """
    WITH iv AS (
      SELECT user_id AS iv_user, min(ts) AS win_start,
             min(ts) + INTERVAL 2 HOUR AS win_end
      FROM events GROUP BY user_id
    )
    SELECT e.user_id, count(*) AS n_in_window,
           round(sum(e.value), 2) AS window_value
    FROM events e JOIN iv ON e.user_id = iv.iv_user
     AND e.ts >= iv.win_start AND e.ts <= iv.win_end
    GROUP BY e.user_id
    """,
)
def events_in_first_2h_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketized range join (operators/rangejoin.py): events matched
    into each user's first-2-hours interval — equi-join on (user,
    time-bucket) + residual filter instead of a nested-loop join."""
    ev = load_table(spark, sf_dir, "events")
    intervals = ev.groupBy(F.col("user_id")).agg(
        F.min("ts").alias("win_start"),
        (F.min("ts") + F.expr("INTERVAL 2 HOURS")).alias("win_end"),
    )
    joined = range_join(
        ev.select("user_id", "ts", "value"),
        intervals,
        point_col="ts",
        start_col="win_start",
        end_col="win_end",
        by=["user_id"],
        bucket_width_sec=3600.0,
    )
    return joined.groupBy("user_id").agg(
        F.count("*").alias("n_in_window"), F.round(F.sum("value"), 2).alias("window_value")
    )


@register(
    "scalar_function_battery",
    """
    SELECT o_orderpriority,
           count(*) AS n,
           min(upper(substr(o_orderstatus, 1, 1)))               AS first_status,
           max(lower(o_orderpriority))                           AS lower_prio,
           min(lpad(CAST(o_orderkey AS VARCHAR), 10, '0'))       AS padded_min_key,
           max(reverse(CAST(o_custkey AS VARCHAR)))              AS rev_cust,
           sum(CAST(length(o_orderpriority) AS BIGINT))::BIGINT  AS len_sum,
           sum(CAST(strpos(o_orderpriority, '-') AS BIGINT))::BIGINT AS dash_pos_sum,
           CAST(round(sum(CAST(sqrt(abs(o_totalprice)) AS DECIMAL(38,12))), 4) AS DOUBLE) AS sqrt_sum,
           CAST(round(sum(CAST(ln(o_totalprice + 1) AS DECIMAL(38,12))), 4) AS DOUBLE)    AS ln_sum,
           round(sum(mod(o_orderkey, 7)), 1)::BIGINT             AS mod_sum,
           sum(CAST(year(o_orderdate) AS BIGINT))::BIGINT        AS year_sum,
           sum(CAST(month(o_orderdate) AS BIGINT))::BIGINT       AS month_sum,
           min(strftime(date_trunc('month', o_orderdate), '%Y-%m-%d')) AS first_month,
           min(CASE WHEN o_totalprice < 100000 THEN 'low' ELSE 'high' END
               || '_' || o_orderstatus)                          AS band_concat_min,
           sum(CASE WHEN nullif(o_orderstatus, 'O') IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_nulled,
           count(DISTINCT o_orderstatus)                         AS n_status
    FROM orders GROUP BY o_orderpriority
    """,
)
def scalar_function_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/date/math scalar parity battery (reference §2.8 + the
    functions the TPC corpus leans on), aggregated for hash-stability."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.min(F.upper(F.substring("o_orderstatus", 1, 1))).alias("first_status"),
        F.max(F.lower("o_orderpriority")).alias("lower_prio"),
        F.min(F.lpad(F.col("o_orderkey").cast("string"), 10, "0")).alias("padded_min_key"),
        F.max(F.reverse(F.col("o_custkey").cast("string"))).alias("rev_cust"),
        F.sum(F.length("o_orderpriority").cast("long")).alias("len_sum"),
        F.sum(F.instr(F.col("o_orderpriority"), "-").cast("long")).alias("dash_pos_sum"),
        stable_sum(F.sqrt(F.abs("o_totalprice")), 4).alias("sqrt_sum"),
        stable_sum(F.log(F.col("o_totalprice") + 1), 4).alias("ln_sum"),
        F.round(F.sum(F.col("o_orderkey") % 7), 1).alias("mod_sum"),
        F.sum(F.year("o_orderdate").cast("long")).alias("year_sum"),
        F.sum(F.month("o_orderdate").cast("long")).alias("month_sum"),
        F.min(F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd")).alias(
            "first_month"
        ),
        # P10/F5/F6/F7/A3 fold: conditional band + concat, nullif/isnull,
        # DISTINCT aggregate — the conditional_projection semantics kept
        # under the checked battery.
        F.min(
            F.concat(
                F.when(F.col("o_totalprice") < 100000, "low").otherwise("high"),
                F.lit("_"),
                F.col("o_orderstatus"),
            )
        ).alias("band_concat_min"),
        F.sum(F.nullif(F.col("o_orderstatus"), F.lit("O")).isNull().cast("bigint")).alias(
            "n_nulled"
        ),
        F.countDistinct("o_orderstatus").alias("n_status"),
    )


@register(
    "window_function_battery",
    """
    SELECT o_custkey, o_orderkey,
           lead(o_orderkey) OVER w                                   AS next_key,
           first_value(o_orderkey) OVER wf                           AS first_key,
           last_value(o_orderkey) OVER wf                            AS last_key,
           nth_value(o_orderkey, 2) OVER wf                          AS second_key,
           round(percent_rank() OVER w, 6)                           AS pct_rank,
           round(cume_dist() OVER w, 6)                              AS cdist
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
           wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_function_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead / first_value / last_value / nth_value / percent_rank /
    cume_dist with explicit frames (the rest of the §2.5 machinery)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lead("o_orderkey").over(w).alias("next_key"),
        F.first("o_orderkey").over(wf).alias("first_key"),
        F.last("o_orderkey").over(wf).alias("last_key"),
        F.nth_value("o_orderkey", 2).over(wf).alias("second_key"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    )
