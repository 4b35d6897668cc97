"""Maintenance-audit, workload-harness, and multimodal queries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_dba_tools_spark.maintenance.audit import column_stats_report, file_detail_report
from lakehouse_dba_tools_spark.multimodal.binary_ops import attach_fake_media, extract_features, sample_frames
from lakehouse_dba_tools_spark.registry import register
from lakehouse_dba_tools_spark.sources.tables import TABLE_NAMES, load_table, register_views
from lakehouse_dba_tools_spark.workload.harness import SqlUnit, latency_summary, run_workload

_PROFILE_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]


def _profile_oracle() -> str:
    parts = [
        f"""SELECT '{c}' AS column_name,
                   CAST(min({c}) AS VARCHAR) AS min_value,
                   CAST(max({c}) AS VARCHAR) AS max_value,
                   count(*) - count({c}) AS num_nulls,
                   count(DISTINCT {c}) AS num_distinct
            FROM orders"""
        for c in _PROFILE_COLS
    ]
    return " UNION ALL ".join(parts)


@register("column_stats_profile", _profile_oracle())
def column_stats_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE/DESCRIBE EXTENDED analog (reference TPC:2121-2151): one
    aggregation pass over the table, transposed to a per-column report.
    Exact distinct here for oracle parity; approx (HLL) is the scale
    default in maintenance/audit.py."""
    orders = load_table(spark, sf_dir, "orders").select(*_PROFILE_COLS)
    return column_stats_report(orders, approx_distinct=False).drop("data_type")


@register(
    "file_detail_audit",
    " UNION ALL ".join(
        f"SELECT '{t}' AS table_name, 1 AS num_files, "
        f"(SELECT count(*) FROM {t}) AS num_rows"
        for t in (
            "region", "nation", "customer", "supplier", "part",
            "orders", "lineitem", "events", "documents", "embeddings",
        )
    ),
)
def file_detail_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DESCRIBE DETAIL analog (TPC:1855-1883): parquet footer metadata,
    no data scan. The oracle cross-checks footer num_rows against the
    actual table counts (a real footer-vs-data consistency audit);
    size_bytes is filesystem metadata with no relational twin — it
    stays on the operator (maintenance/audit.py) and is unit-tested."""
    import os

    paths = {
        t: os.path.join(sf_dir, f"{t}.parquet")
        for t in TABLE_NAMES
        if os.path.exists(os.path.join(sf_dir, f"{t}.parquet"))
    }
    return file_detail_report(spark, paths).select("table_name", "num_files", "num_rows")


@register(
    "workload_stress_summary",
    """
    SELECT 'count_lineitem' AS unit_name, 4 AS n_runs, 4 AS n_ok,
           1 AS min_rows, 1 AS max_rows
    UNION ALL
    SELECT 'flag_rollup', 4, 4,
           (SELECT count(*) FROM (SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem)),
           (SELECT count(*) FROM (SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem))
    UNION ALL
    SELECT 'top_orders', 4, 4, 10, 10
    """,
)
def workload_stress_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dbstress analog (reference DBS:93-175): units × parallel
    connections × repeats through a thread pool; deterministic summary
    columns exported (latencies analyzed separately via
    latency_summary's p50/p95)."""
    register_views(spark, sf_dir, ("lineitem", "orders"))
    units = [
        SqlUnit("count_lineitem", "SELECT count(*) AS n FROM lineitem", parallel=2, repeats=2),
        SqlUnit(
            "flag_rollup",
            "SELECT l_returnflag, l_linestatus, sum(l_quantity) AS q "
            "FROM lineitem GROUP BY 1, 2",
            parallel=2,
            repeats=2,
        ),
        SqlUnit(
            "top_orders",
            "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",
            parallel=2,
            repeats=2,
        ),
    ]
    results = run_workload(spark, units)
    return latency_summary(results).select(
        "unit_name", "n_runs", "n_ok", "min_rows", "max_rows"
    )


@register(
    "multimodal_features",
    """
    SELECT doc_id,
           CASE CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 3 WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav'
                        ELSE 'video/mp4' END AS media_type,
           sha256(text) AS content_sha,
           1.0 AS feature_l1,
           32 AS feature_dim
    FROM documents
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload feature extraction via mapInPandas (fake decode
    kernel — deterministic byte histogram; real codec is the stub)."""
    docs = load_table(spark, sf_dir, "documents")
    media = attach_fake_media(docs)
    feats = extract_features(media, mode="fake")
    return feats.select(
        "doc_id",
        "media_type",
        "content_sha",
        F.round(F.aggregate("feature", F.lit(0.0), lambda a, x: a + x), 6).alias("feature_l1"),
        F.size("feature").alias("feature_dim"),
    )


@register(
    "multimodal_frame_sample",
    """
    WITH m AS (
      SELECT doc_id, CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) AS h FROM documents
      WHERE CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 3 = 2
    ),
    n AS (SELECT doc_id, CAST(h % 300 + 1 AS INT) AS n_frames FROM m),
    e AS (SELECT doc_id, unnest(generate_series(0, n_frames - 1, 30)) AS frame_idx FROM n)
    SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx, 32 AS dim FROM e
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = attach_fake_media(docs)
    frames = sample_frames(media, every_n=30, mode="fake")
    return frames.select("doc_id", "frame_idx", F.size("frame_feature").alias("dim"))


# --------------------------------------------------------------------------
# P5/F2: poll-stamp append snapshot (reference Endpoint_Poller EP:158 —
# `current_timestamp() AS polled_timestamp` on every poll). Stamped with
# an injected literal so the oracle can recompute it; production uses
# at=None → current_timestamp().
# --------------------------------------------------------------------------
POLL_TS = "2024-06-01 12:00:00"


@register(
    "endpoint_poll_snapshot",
    f"""
    SELECT n_nationkey AS endpoint_id,
           CASE WHEN n_regionkey % 2 = 0 THEN 'RUNNING' ELSE 'STOPPED' END AS state,
           CAST(epoch(TIMESTAMP '{POLL_TS}') AS BIGINT) AS polled_epoch
    FROM nation
    """,
)
def endpoint_poll_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_dba_tools_spark.operators.lifecycle import with_poll_stamp

    states = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("endpoint_id"),
        F.when(F.col("n_regionkey") % 2 == 0, "RUNNING").otherwise("STOPPED").alias("state"),
    )
    stamped = with_poll_stamp(states, at=POLL_TS)
    return stamped.select(
        "endpoint_id", "state", F.col("polled_timestamp").cast("long").alias("polled_epoch")
    )


# --------------------------------------------------------------------------
# Endpoint lifecycle REST control (reference Endpoint_Starter.py:47-57 /
# Endpoint_Stopper.py): issue start/stop against an injectable transport,
# then poll-until-state with backoff. The carrier drives the REAL
# controller (operators/lifecycle.py ensure_endpoint_state/wait_until,
# injected deterministic clock+state machine: start reaches RUNNING on
# the 4th probe, stop reaches STOPPED on the 3rd, a second start is the
# already-running fast path — one probe, NO request). The oracle
# re-derives the whole transcript relationally from those state-machine
# thresholds; the Spark side earns equality only if the request gating,
# backoff arithmetic, history capture, and fast path all behave.
# --------------------------------------------------------------------------
_EP_START_POLLS = 4  # probes until RUNNING after a start request
_EP_STOP_POLLS = 3   # probes until STOPPED after a stop request
_EP_INTERVAL = 5.0   # injected poll interval (deterministic clock)


@register(
    "endpoint_lifecycle_control",
    f"""
    SELECT 'a_start' AS phase, poll::INT AS poll,
           ((poll - 1) * {int(_EP_INTERVAL)})::DOUBLE AS elapsed_sec,
           CASE WHEN poll < {_EP_START_POLLS} THEN 'STARTING'
                ELSE 'RUNNING' END AS state,
           TRUE AS requested
    FROM (SELECT unnest(generate_series(1, {_EP_START_POLLS})) AS poll)
    UNION ALL
    SELECT 'b_noop_start', 1, 0.0::DOUBLE, 'RUNNING', FALSE
    UNION ALL
    SELECT 'c_stop', poll::INT, ((poll - 1) * {int(_EP_INTERVAL)})::DOUBLE,
           CASE WHEN poll < {_EP_STOP_POLLS} THEN 'STOPPING'
                ELSE 'STOPPED' END,
           TRUE
    FROM (SELECT unnest(generate_series(1, {_EP_STOP_POLLS})) AS poll)
    ORDER BY phase, poll
    """,
)
def endpoint_lifecycle_control(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Endpoint start/stop control loop end-to-end: start (poll until
    RUNNING), an idempotent second start (fast path: one probe, no
    request issued), stop (poll until STOPPED) — each phase's full
    probe transcript as (phase, poll, elapsed_sec, state, requested).
    Driver-side control plane by design (a handful of states, nothing
    touches executors); the transport and clock are injected, which is
    exactly how the production REST calls slot in."""
    from lakehouse_dba_tools_spark.operators.lifecycle import (
        start_endpoint,
        stop_endpoint,
    )

    class _Endpoint:
        """Deterministic state machine standing in for the REST API."""

        def __init__(self):
            self.state = "STOPPED"
            self.polls_left = 0
            self.pending = None
            self.requests = []

        def request(self, action: str) -> None:
            self.requests.append(action)
            if action == "start":
                self.state, self.pending = "STARTING", "RUNNING"
                self.polls_left = _EP_START_POLLS
            else:
                self.state, self.pending = "STOPPING", "STOPPED"
                self.polls_left = _EP_STOP_POLLS

        def get_state(self) -> str:
            if self.pending is not None:
                self.polls_left -= 1
                if self.polls_left <= 0:
                    self.state, self.pending = self.pending, None
            return self.state

    class _Clock:
        """Deterministic time: sleep() advances it, nothing else does."""

        def __init__(self):
            self.t = 0.0

        def now(self) -> float:
            return self.t

        def sleep(self, d: float) -> None:
            self.t += d

    ep = _Endpoint()
    rows = []

    def run(phase, verb):
        clock = _Clock()
        res, requested = verb(
            ep.get_state,
            ep.request,
            poll_interval_sec=_EP_INTERVAL,
            timeout_sec=600.0,
            clock=clock.now,
            sleeper=clock.sleep,
        )
        assert res.reached, (phase, res.final_state)
        for i, (elapsed, state) in enumerate(res.history, start=1):
            rows.append((phase, i, float(elapsed), str(state), requested))

    run("a_start", start_endpoint)
    run("b_noop_start", start_endpoint)  # already RUNNING: 1 probe, no request
    run("c_stop", stop_endpoint)
    # request gating is part of the contract the transcript proves
    assert ep.requests == ["start", "stop"], ep.requests
    return spark.createDataFrame(
        rows,
        "phase string, poll int, elapsed_sec double, state string, requested boolean",
    ).orderBy("phase", "poll")
