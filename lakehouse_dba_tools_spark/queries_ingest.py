"""Ingest, schema-reconcile, as-of join, and remaining relational
operators (SURVEY.md §2.1-2.3, §2.7) as oracle-checked queries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_dba_tools_spark.operators.asof import asof_join
from lakehouse_dba_tools_spark.operators.flatten import flatten_all, splat_structs
from lakehouse_dba_tools_spark.operators.pivot import unpivot
from lakehouse_dba_tools_spark.operators.reconcile import append_with_reconcile
from lakehouse_dba_tools_spark.registry import register
from lakehouse_dba_tools_spark.sources.json_records import paged_source, records_to_df
from lakehouse_dba_tools_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# S1/S7/P2/P12: paginated JSON-records ingest → bool normalization →
# struct splat → rollup. Fixed payload (the REST API stand-in); oracle
# is the flattened literal table.
# ---------------------------------------------------------------------------
_PAGES = [
    [
        {"id": 1, "state": "RUNNING", "enabled": True,
         "size": {"cluster_size": "2X-Small", "warehouses": 1}},
        {"id": 2, "state": "STOPPED", "enabled": False,
         "size": {"cluster_size": "Small", "warehouses": 2}},
    ],
    [
        {"id": 3, "state": "RUNNING", "enabled": True,
         "size": {"cluster_size": "Large", "warehouses": 4}},
    ],
]


# VALUES justification (round-8 adjudication): the input is the inline
# driver-side JSON fixture above, not a parquet table — there is no
# relational source for DuckDB to derive from, so the oracle restates
# the fixture's expected flattening literally.
@register(
    "json_ingest_flatten",
    """
    SELECT * FROM (VALUES
      (1, 'RUNNING', 'true',  '2X-Small', 1),
      (2, 'STOPPED', 'false', 'Small',    2),
      (3, 'RUNNING', 'true',  'Large',    4)
    ) AS t(id, state, enabled, cluster_size, warehouses)
    """,
)
def json_ingest_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's endpoints-ingest path (QH:80-96): paged JSON →
    stringified bools → inferred nested schema → struct splat."""
    df = paged_source(spark, iter(_PAGES), stringify_bools=True)
    flat = splat_structs(df, ["size"])
    return flat.select(
        F.col("id").cast("int"),
        "state",
        "enabled",
        "cluster_size",
        F.col("warehouses").cast("int"),
    )


# VALUES justification: same class as json_ingest_flatten — the input
# is an inline nested document fixture with no relational source.
@register(
    "nested_flatten_deep",
    """
    SELECT * FROM (VALUES
      (1, 10, 'a', 99),
      (2, 20, 'b', NULL)
    ) AS t(id, m_x, m_y, m_inner_z)
    """,
)
def nested_flatten_deep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive flatten with parent-prefixing (collision-safe P2)."""
    recs = [
        {"id": 1, "m": {"x": 10, "y": "a", "inner": {"z": 99}}},
        {"id": 2, "m": {"x": 20, "y": "b", "inner": {}}},
    ]
    df = records_to_df(spark, recs)
    flat = flatten_all(df)
    return flat.select(
        F.col("id").cast("int"),
        F.col("m_x").cast("int"),
        F.col("m_y"),
        F.col("m_inner_z").cast("int"),
    )


# ---------------------------------------------------------------------------
# EP:157-183 schema reconcile as a query: dest(old layout) ∪ source(new
# layout) with NULL padding + evolution.
# ---------------------------------------------------------------------------
@register(
    "schema_reconcile_append",
    """
    WITH dest AS (
      SELECT o_orderkey, o_custkey, o_orderstatus FROM orders WHERE o_orderkey % 2 = 0
    ),
    src AS (
      SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
      FROM orders WHERE o_orderkey % 2 = 1
    )
    SELECT o_orderkey, o_custkey, o_orderstatus, CAST(NULL AS DOUBLE) AS o_totalprice FROM dest
    UNION ALL
    SELECT o_orderkey, o_custkey, CAST(NULL AS VARCHAR), o_totalprice FROM src
    """,
)
def schema_reconcile_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    dest = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )
    src = orders.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("o_totalprice")
    )
    return append_with_reconcile(dest, src, allow_new_columns=True)


# ---------------------------------------------------------------------------
# As-of join (north-star; DuckDB has native ASOF JOIN as the oracle):
# for each purchase event, the most recent preceding view's value.
# ---------------------------------------------------------------------------
@register(
    "asof_purchase_last_view",
    """
    WITH p AS (SELECT user_id, event_id, ts, round(value, 2) AS purchase_value
               FROM events WHERE event_type = 'purchase'),
    v AS (SELECT user_id, ts, round(value, 2) AS view_value
          FROM events WHERE event_type = 'view')
    SELECT p.user_id, p.event_id, p.purchase_value, v.view_value
    FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.ts <= p.ts
    """,
)
def asof_purchase_last_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", F.round("value", 2).alias("purchase_value")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.round("value", 2).alias("view_value")
    )
    joined = asof_join(purchases, views, on="ts", by=["user_id"], value_cols=["view_value"])
    return joined.select("user_id", "event_id", "purchase_value", "view_value")


# ---------------------------------------------------------------------------
# CUBE + grouping-id (TPC corpus surface).
# ---------------------------------------------------------------------------
@register(
    "lineitem_cube",
    """
    SELECT coalesce(l_returnflag, '∅') AS rf, coalesce(l_linestatus, '∅') AS ls,
           count(*) AS n, round(sum(l_quantity), 2) AS qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def lineitem_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("∅")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("∅")).alias("ls"),
            "n",
            "qty",
        )
    )


# ---------------------------------------------------------------------------
# INTERSECT / EXCEPT (§2.7 — absent in the reference, implied by the
# full-outer schema-diff; exposed first-class here).
# ---------------------------------------------------------------------------
@register(
    "segment_set_ops",
    """
    WITH evens AS (SELECT DISTINCT c_mktsegment FROM customer WHERE c_custkey % 2 = 0),
    negs AS (SELECT DISTINCT c_mktsegment FROM customer WHERE c_acctbal < 0)
    SELECT 'both' AS op, c_mktsegment FROM (SELECT * FROM evens INTERSECT SELECT * FROM negs)
    UNION ALL
    SELECT 'only_evens', c_mktsegment FROM (SELECT * FROM evens EXCEPT SELECT * FROM negs)
    """,
)
def segment_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    evens = cust.filter(F.col("c_custkey") % 2 == 0).select("c_mktsegment").distinct()
    negs = cust.filter(F.col("c_acctbal") < 0).select("c_mktsegment").distinct()
    both = evens.intersect(negs).select(F.lit("both").alias("op"), "c_mktsegment")
    only = evens.exceptAll(negs).select(F.lit("only_evens").alias("op"), "c_mktsegment")
    return both.unionByName(only)


# ---------------------------------------------------------------------------
# Unpivot via stack() (inverse of A4).
# ---------------------------------------------------------------------------
@register(
    "lineitem_unpivot_measures",
    """
    SELECT m AS measure, round(avg(v), 6) AS avg_value FROM (
      SELECT 'quantity' AS m, l_quantity AS v FROM lineitem
      UNION ALL SELECT 'discount', l_discount FROM lineitem
      UNION ALL SELECT 'tax', l_tax FROM lineitem
    ) GROUP BY m
    """,
)
def lineitem_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").alias("quantity"),
        F.col("l_discount").alias("discount"),
        F.col("l_tax").alias("tax"),
    )
    long = unpivot(li, [], ["quantity", "discount", "tax"], var_name="measure", value_name="v")
    return long.groupBy("measure").agg(F.round(F.avg("v"), 6).alias("avg_value"))


# ---------------------------------------------------------------------------
# rank / dense_rank / ntile window battery.
# ---------------------------------------------------------------------------
@register(
    "customer_balance_ranks",
    """
    SELECT c_custkey, c_mktsegment,
           rank()       OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4)     OVER w AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY round(c_acctbal, 2) DESC, c_custkey)
    """,
)
def customer_balance_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.round("c_acctbal", 2).desc(), F.col("c_custkey")
    )
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


# --------------------------------------------------------------------------
# F10: to_json(struct(...)) serialization — the inverse of the S1 JSON
# ingest path (reference TPC:2307-2309, its disabled streaming cell).
# --------------------------------------------------------------------------
@register(
    "nation_json_serialize",
    """
    SELECT n_nationkey,
           to_json(struct_pack(k := n_nationkey, name := n_name,
                               region := n_regionkey))::VARCHAR AS payload
    FROM nation
    """,
)
def nation_json_serialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_dba_tools_spark.operators.flatten import to_json_struct

    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey",
        F.col("n_nationkey").alias("k"),
        F.col("n_name").alias("name"),
        F.col("n_regionkey").alias("region"),
    )
    return to_json_struct(nation, ["k", "name", "region"], alias="payload").select(
        "n_nationkey", "payload"
    )


@register(
    "csv_exotic_declared_report",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT n_regionkey) AS BIGINT) AS n_regions,
           min(n_name) AS first_name,
           CAST(sum(n_nationkey) AS BIGINT) AS key_sum
    FROM nation
    """,
)
def csv_exotic_declared_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 end-to-end: emit nation as pipe-delimited lines WITH trailing
    delimiters (the TPC generator's output shape,
    `resources/TPC-datagen-notebook.scala:1705-1720`), write via the
    text sink, read back through read_csv_declared's exotic option set
    (declared schema, '|' delimiter, iso-8859-1, trailing-column shim),
    and aggregate. The oracle reads the ORIGINAL parquet — hash
    equality proves the declared-CSV parse is lossless."""
    import shutil
    import tempfile

    from lakehouse_dba_tools_spark.sources.files import read_csv_declared, write_text

    nation = load_table(spark, sf_dir, "nation")
    lines = nation.select(
        F.concat_ws(
            "|",
            F.col("n_nationkey").cast("string"),
            "n_name",
            F.col("n_regionkey").cast("string"),
            F.lit(""),  # trailing delimiter, dbgen-style
        ).alias("value")
    )
    tmp = tempfile.mkdtemp(prefix="csv_exotic_")
    try:
        loc = f"{tmp}/nation_pipe"
        write_text(lines, loc)
        back = read_csv_declared(
            spark,
            loc,
            "n_nationkey bigint, n_name string, n_regionkey bigint",
            delimiter="|",
            trailing_delimiter=True,
        )
        out = back.agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("n_regionkey").alias("n_regions"),
            F.min("n_name").alias("first_name"),
            F.sum("n_nationkey").alias("key_sum"),
        )
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "small_file_write_audit",
    """
    SELECT 'compact_files_after' AS metric, CAST(1 AS BIGINT) AS value
    UNION ALL
    SELECT 'compact_files_before', CAST(8 AS BIGINT)
    UNION ALL
    SELECT 'csv_inferred_int_cols', CAST(2 AS BIGINT)
    UNION ALL
    SELECT 'csv_inferred_rows_matching', (SELECT count(*) FROM nation)
    UNION ALL
    SELECT 'maxrecords_restored_files', CAST(1 AS BIGINT)
    UNION ALL
    SELECT 'maxrecords_scoped_files',
           CAST(CEIL((SELECT count(*) FROM nation) / 7.0) AS BIGINT)
    UNION ALL
    SELECT 'text_gzip_lines', (SELECT count(*) FROM nation)
    ORDER BY metric
    """,
)
def small_file_write_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13 + S14 + S2 + D15 end-to-end (round-6 promotion of the last
    unit-only sink rows; D15's session-conf leg added round 10):
    deliberately fragment nation into 8 parquet files, bin-pack with
    optimize_compact (S13 — 128 MB target folds 25 rows into ONE file;
    `maintenance/compact.py:43`), write the gzip-compressed text sink
    and read it back (S14, `sources/files.py:59`), round-trip nation
    through a header+INFERRED-schema CSV (S2, `sources/files.py:19`)
    re-joined to the original on every column, and — D15
    (`session.scoped_confs`; the reference sets ``maxRecordsPerFile``
    and codec confs per session, `resources/TPC-datagen-notebook.scala
    :110-137`) — write a single-task parquet sink under a SCOPED
    ``spark.sql.files.maxRecordsPerFile=7``, whose file count
    ceil(|nation|/7) is observable ONLY if ``spark.conf.set`` took
    effect, then write again after the scope exits, whose 1-file count
    is observable only if the conf was RESTORED. The oracle derives the
    row-level values from the nation fixture; the file-count rows pin
    the operators' structural contracts (8-way fragment, 1-file
    compact, 2 integer-inferred key columns, conf-driven 4-way split +
    post-scope single file)."""
    import glob
    import os
    import shutil
    import tempfile

    from lakehouse_dba_tools_spark.maintenance.compact import optimize_compact
    from lakehouse_dba_tools_spark.sources.files import (
        read_csv_inferred,
        write_text,
    )

    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    tmp = tempfile.mkdtemp(prefix="write_audit_")
    try:
        # S13: fragment → compact
        frag_path = f"{tmp}/nation_frag"
        nation.repartition(8).write.parquet(frag_path)
        n_before = len(glob.glob(os.path.join(frag_path, "*.parquet")))
        optimize_compact(spark, frag_path)
        n_after = len(glob.glob(os.path.join(frag_path, "*.parquet")))
        # S14: compressed text sink round-trip
        text_path = f"{tmp}/nation_txt"
        lines = nation.select(
            F.concat_ws(
                "|",
                F.col("n_nationkey").cast("string"),
                "n_name",
                F.col("n_regionkey").cast("string"),
            ).alias("value")
        )
        write_text(lines.coalesce(1), text_path, compression="gzip")
        assert glob.glob(os.path.join(text_path, "*.gz")), "gzip sink"
        n_lines = spark.read.text(text_path).count()
        # S2: header CSV, schema INFERRED on read
        csv_path = f"{tmp}/nation_csv"
        nation.write.option("header", True).csv(csv_path)
        inferred = read_csv_inferred(spark, csv_path)
        n_int_cols = sum(1 for _, t in inferred.dtypes if t in ("int", "bigint"))
        n_match = inferred.join(
            nation, ["n_nationkey", "n_name", "n_regionkey"]
        ).count()
        # D15: conf-scoped sink sizing — maxRecordsPerFile caps rows
        # per file WITHIN one write task, so a coalesce(1) write under
        # the scope splits into ceil(n/7) files; the write after the
        # scope (conf restored to the session default, unlimited)
        # produces exactly one
        from lakehouse_dba_tools_spark.session import scoped_confs

        scoped_path = f"{tmp}/nation_scoped"
        restored_path = f"{tmp}/nation_restored"
        with scoped_confs(spark, {"spark.sql.files.maxRecordsPerFile": "7"}):
            nation.coalesce(1).write.parquet(scoped_path)
        nation.coalesce(1).write.parquet(restored_path)
        n_scoped = len(glob.glob(os.path.join(scoped_path, "*.parquet")))
        n_restored = len(glob.glob(os.path.join(restored_path, "*.parquet")))
        rows = [
            ("compact_files_after", n_after),
            ("compact_files_before", n_before),
            ("csv_inferred_int_cols", n_int_cols),
            ("csv_inferred_rows_matching", n_match),
            ("maxrecords_restored_files", n_restored),
            ("maxrecords_scoped_files", n_scoped),
            ("text_gzip_lines", n_lines),
        ]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(rows, "metric string, value bigint")
