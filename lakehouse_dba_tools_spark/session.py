"""SparkSession factory with scale-aware defaults.

The reference tunes its sessions by hand (shuffle partitions = cores ×
workers × 2, `resources/TPC-datagen-notebook.scala:110`; parquet/ORC
vectorization `:130-137`; Delta autoMerge `tasks/Query History API to
Delta_withmetrics.py:35`). We centralize the open-source equivalents:
AQE (supersedes manual shuffle sizing at runtime), Arrow for the
pandas-UDF path, UTC session time zone (oracle comparability), and a
shuffle-partition default matched to local cores but overridable for
cluster deployments.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import SparkSession


def get_session(
    app_name: str = "lakehouse_dba_tools_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    On a real cluster, pass ``master=None`` with an external conf and a
    ``shuffle_partitions`` sized to ~2-3× total executor cores; AQE will
    coalesce/split at runtime so the static number only needs the right
    order of magnitude.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 4)
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Local mode: the driver JVM hosts every executor thread — give
        # it real memory (default 1g OOMs shuffles + Arrow batches).
        # Only effective for the process's first session; harmless after.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # AQE: runtime partition coalescing, skew-join splitting, and
        # dynamic join-strategy switching — the scale path for 100 TB.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for pandas UDF / toPandas boundaries.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Deterministic timestamp semantics vs the DuckDB oracle.
        .config("spark.sql.session.timeZone", "UTC")
        # CBO: the reference ANALYZEs tables for stats (QH:260); make
        # Catalyst actually consume them.
        .config("spark.sql.cbo.enabled", "true")
        # Parquet TIMESTAMP(NANOS) is rejected by the vectorized reader;
        # read as long (ns since epoch) and convert in the loader
        # (sources/tables.py) — lossless for µs-aligned data.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


_UNSET = object()


@contextmanager
def scoped_confs(spark: SparkSession, confs: dict[str, str]):
    """D15 session-conf set, scoped: apply ``spark.conf.set`` pairs for
    one workload and RESTORE the prior session state on exit (reset
    values that had one, unset keys that were unset) — exception-safe.

    The reference sets runtime confs per task script and leaves them
    for the session's remainder (`tasks/Query History API to
    Delta_withmetrics.py:35` autoMerge;
    `resources/TPC-datagen-notebook.scala:110-137` shuffle partitions,
    ``maxRecordsPerFile``, parquet/ORC codecs). In a multi-tenant
    engine session a leaked conf silently re-plans every later query,
    so the engine's form is a scope: workload-sized knobs (shuffle
    partitions for a small-query corpus, ``maxRecordsPerFile`` for a
    sink's file-size contract) apply exactly as long as the workload
    runs. Restore prefers ``unset`` so the session genuinely falls
    back to its builder/cluster default rather than a frozen copy of
    it: on exit every key is unset first, and the snapshotted prior
    value is re-``set`` only if the post-unset read differs — i.e.
    only when the prior value was a real explicit override.
    ``conf.get`` cannot distinguish "explicitly set to X" from
    "defaulting to X", so a key that was explicitly set to exactly
    its registered default is restored as defaulted — every reader
    sees the same value either way.
    """
    prior: dict[str, object] = {}
    for k in confs:
        try:
            prior[k] = spark.conf.get(k)
        except Exception:  # no value and no default registered
            prior[k] = _UNSET
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        yield spark
    finally:
        for k, old in prior.items():
            try:
                spark.conf.unset(k)
            except Exception:
                if old is _UNSET:
                    # no compensating set follows — the scoped value
                    # would silently survive the scope, the exact leak
                    # this context manager exists to prevent; be loud
                    import warnings

                    warnings.warn(
                        f"scoped_confs could not unset {k!r} on exit; "
                        f"the scoped value remains active for the "
                        f"session",
                        UserWarning,
                        stacklevel=3,
                    )
            if old is _UNSET:
                continue
            try:
                cur: object = spark.conf.get(k)
            except Exception:
                cur = _UNSET
            if cur != old:
                spark.conf.set(k, old)
