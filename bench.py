"""Headline benchmark: runs the flagship queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed end-to-end (plan + execute + collect). Results are
small (aggregated/limited), so collect is the honest sink. A warmup query
first pays the one-time session/codegen cost so per-query numbers reflect
steady-state throughput.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sec_xbrl_finwarehouse_spark.plans import star_queries as sq
from sec_xbrl_finwarehouse_spark.session import get_spark

BENCH_QUERIES = [
    "statements_annual",
    "ratios_annual",
    "screener",
    "window_dedup_latest",
    "pivot_wide",
    "flow_stock_union",
    "annual_period_filter",
    "natural_key_dedup",
    "upsert_latest_wins",
    "top_k_orders",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")

    import __spark_entry__ as entrymod

    qmap = entrymod.queries()
    names = [n for n in BENCH_QUERIES if n in qmap]
    # warmup: JVM + codegen + parquet footer reads
    qmap["top_k_orders"](spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.time()
        qmap[name](spark, sf_dir).collect()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))


if __name__ == "__main__":
    main()
