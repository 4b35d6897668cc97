"""Attribute the r5->r6 streaming bench drift (VERDICT r6 "What's
wrong" #2 / directive #4): streaming_sliding_rollup 1.20->1.97s,
streaming_upsert_pipeline 0.98->1.46s, streaming_session_windows
1.30->1.73s with code unchanged.

Hypothesis: battery composition, not regression — the r6 rotation put
14 new queries (incl. the 21s sqltext stress and 6s pagerank) BEFORE
the streaming slots, so by the time the triad runs the session carries
more state-store maintenance threads, codegen cache, and GC pressure.

Method: same timing kernel as bench.py (noop sink, min-of-N) in a
fresh session, two conditions:
  A) isolated: triad only, min-of-3 per query
  B) post-prefix: run the full checked battery once (bench pass-1
     order), then triad min-of-3
If B >> A and B matches BENCH, the drift is battery composition ->
commit the numbers to SCALE.md. If A is also high, it's a real
regression -> profile.

Usage: python tools/streaming_drift_triage.py [A|B]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRIAD = [
    "streaming_sliding_rollup",
    "streaming_session_windows",
    "streaming_upsert_pipeline",
]


def main() -> None:
    cond = sys.argv[1] if len(sys.argv) > 1 else "A"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from lakehouse_dba_tools_spark import get_session, registry

    registry.load_all()
    spark = get_session(app_name=f"drift_triage_{cond}")
    spark.range(1000).selectExpr("sum(id)").collect()

    def run_once(name: str) -> float:
        t0 = time.time()
        df = registry.QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    if cond == "B":
        names = [n for n in registry.CHECKED_FIRST if n in registry.QUERIES]
        t0 = time.time()
        for name in names:
            try:
                run_once(name)
            except Exception as exc:  # cost its slot, keep going
                print(f"prefix {name} failed: {exc}", file=sys.stderr)
        print(f"prefix battery pass: {time.time() - t0:.1f}s", flush=True)

    out = {}
    for name in TRIAD:
        best = min(run_once(name) for _ in range(3))
        out[name] = round(best, 2)
        print(f"{cond} {name}: {best:.2f}s", flush=True)

    for q in spark.streams.active:
        try:
            q.stop()
        except Exception:
            pass
    spark.sparkContext.setLogLevel("OFF")
    spark.stop()
    print(json.dumps({"condition": cond, "triad": out}), flush=True)


if __name__ == "__main__":
    main()
