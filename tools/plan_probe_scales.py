"""Plan-shape probe across scales (VERDICT r6 directive #2, 'no plan
flips' leg): for each checked TPC-DS star, count the join/exchange
operators in the physical plan at scale 1 (sf0.01 gate) and scale 100
(sf1). Planning only — nothing executes — so this is cheap even at
100x fact sizes. Dims must stay broadcast and the exchange budget must
not grow with scale.

Usage: python tools/plan_probe_scales.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STARS = [
    "tpcds_q3_brand_rollup",
    "tpcds_q7_demographics_star",
    "tpcds_q16_catalog_order_spread",
    "tpcds_q62_web_ship_latency",
]
SCALES = [("/root/testdata/sf0.01", 1), ("/root/testdata/sf1", 100)]


def main() -> None:
    from lakehouse_dba_tools_spark import get_session, registry

    registry.load_all()
    spark = get_session(app_name="plan_probe_scales")
    out: dict = {}
    for name in STARS:
        out[name] = {}
        for sf_dir, scale in SCALES:
            plan = (
                registry.QUERIES[name](spark, sf_dir)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
            out[name][f"scale_{scale}"] = {
                "broadcast_joins": plan.count("BroadcastHashJoin"),
                "sort_merge_joins": plan.count("SortMergeJoin"),
                "exchanges": plan.count("Exchange"),
            }
        a, b = out[name]["scale_1"], out[name]["scale_100"]
        flip = "FLIP" if a != b else "stable"
        print(f"{name}: {a} -> {b} [{flip}]", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
