"""Benchmark harness: run the registered queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "queries_total_sec", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1}

Each query is forced end-to-end with the noop sink (full plan executes,
nothing collected to the driver — the honest way to time a distributed
plan). Mirrors the reference's timing-map harness
(`resources/TPC-datagen-notebook.scala:170-180`).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    if os.environ.get("SPARK_GRAFT_SEAL"):
        # Builder seal runs only (SPARK_GRAFT_SEAL=1): refuse to produce
        # numbers destined for SCALE.md/BENCH seals while PLANS.md is
        # stale (tools/seal_check.py — round-9 VERDICT #4). The driver's
        # plain `python bench.py` never takes this branch; its JSON line
        # must always print.
        from tools.seal_check import check_plans_current

        ok, reason = check_plans_current(os.path.dirname(os.path.abspath(__file__)))
        if not ok:
            print(f"SEAL REFUSED — {reason}", file=sys.stderr)
            raise SystemExit(2)
        print(f"seal gate: {reason}", file=sys.stderr)

    # Noise telemetry (round-14 VERDICT #2): the host is shared and its
    # external load bursts 5-20, which round 13 proved can inflate every
    # query 0.6-0.9x on UNTOUCHED code — record loadavg around the run
    # so a round-over-round comparison is attributable after the fact.
    loadavg_before = [round(v, 2) for v in os.getloadavg()]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    from lakehouse_dba_tools_spark import get_session, registry

    registry.load_all()
    # Headline set = the curated CHECKED_FIRST queries (the driver's
    # differential gate covers exactly these). Benching only the
    # headline set also keeps the output line compact — round 1's
    # driver record shows the full-registry line was truncated before
    # parsing (BENCH_r01.json: "parsed": null).
    names = [n for n in registry.CHECKED_FIRST if n in registry.QUERIES] or list(
        registry.QUERIES
    )
    QUERIES = {n: registry.QUERIES[n] for n in names}

    spark = get_session(app_name="bench")

    # Warm the JVM/codegen path once so per-query timings measure the
    # plan, not session startup.
    spark.range(1000).selectExpr("sum(id)").collect()

    def run_once(name: str) -> float:
        """One timed end-to-end run; a failing query must cost its slot,
        not the whole bench (the JSON line must ALWAYS print)."""
        t0 = time.time()
        try:
            df = QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
        except Exception:
            return -1.0
        return time.time() - t0

    def best(a: float, b: float) -> float:
        good = [t for t in (a, b) if t >= 0]
        return min(good) if good else -1.0

    # Two passes, keep the per-query min: pass 1 pays one-time Catalyst
    # analysis + codegen; pass 2 measures the plan. Min also trims the
    # descheduling spikes of a shared host (observed 10-50× inflation).
    # Queries still >2s after two passes get a third — the expensive
    # tail is exactly where one descheduled executor thread distorts a
    # round-over-round comparison the most.
    timings: dict[str, float] = {}
    passes: dict[str, list[float]] = {n: [] for n in QUERIES}
    for name in QUERIES:
        t = run_once(name)
        passes[name].append(round(t, 2))
        timings[name] = t
    for name in QUERIES:
        t = run_once(name)
        passes[name].append(round(t, 2))
        timings[name] = best(timings[name], t)
    for name, t in list(timings.items()):
        if t > 2.0:
            t3 = run_once(name)
            passes[name].append(round(t3, 2))
            timings[name] = best(t, t3)

    timings = {n: round(v, 2) for n, v in timings.items()}
    total = sum(v for v in timings.values() if v >= 0)
    loadavg_after = [round(v, 2) for v in os.getloadavg()]

    # The JSON line MUST be the last bytes on stdout: the driver parses a
    # 2000-char tail. Streaming queries leave state-store maintenance
    # threads that print ERROR stack traces at JVM teardown (r3's bench
    # tail was literally a StateStoreCoordinator trace → parsed: null).
    # Stop streams, silence logging, stop Spark — THEN print and flush.
    for q in spark.streams.active:
        try:
            q.stop()
        except Exception:
            pass
    spark.sparkContext.setLogLevel("OFF")
    spark.stop()

    # Full per-pass detail goes to STDERR (one JSON line): the stdout
    # contract stays one compact line — the driver parses a bounded
    # ~2000-char stdout tail, and the measured full-telemetry line is
    # 2002 chars at 53 queries, so stdout carries only the two scalar
    # 1-minute loadavg fields (45 chars; the attributability signal)
    # while per-pass times, the 3-tuple loadavgs, and per-query sample
    # counts ride the stderr line.
    print(
        json.dumps({"bench_passes_sec": passes,
                    "loadavg_before": loadavg_before,
                    "loadavg_after": loadavg_after}),
        file=sys.stderr,
        flush=True,
    )
    print(
        json.dumps(
            {
                "metric": "queries_total_sec",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "load1_before": loadavg_before[0],
                "load1_after": loadavg_after[0],
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
