"""Headline benchmark: runs the flagship queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Measurement protocol (BASELINE.md): each query is executed once as
warmup (pays per-plan whole-stage-codegen JIT compilation, parquet
footer reads, and broadcast builds), then timed end-to-end (plan +
execute + materialize) THREE times and the MINIMUM is reported --
steady-state throughput. Caches are cleared between executions so no
run reuses another's work.

Why min-of-3: this host throttles in bursts under full-width load.
Measured (r2): a 32-process busy-spin sees 5-8% hypervisor steal and
per-core throughput drop from 5.0M ops/s (single core) to 2.3-4.7M
ops/s; identical statements_annual plans in one session ranged
2.1s-16.6s across runs while GC logs showed only ~6 young pauses of
<=11ms per run (GC ruled out). The noise hits whole 32-task stages
(every task crawls), so a single timed run can over-report by 5-10x;
the minimum over three runs is the faithful engine number.

Sink = Arrow ``toPandas()``: every result row reaches the driver fully
materialized (same data volume as the DuckDB comparator's fetchall),
but via Arrow batches -- the production-faithful transfer path. Plain
``collect()`` builds a Python object per field and was measured 8x
slower than the ENTIRE engine execution on 600k-row results; that
overhead is a pyspark client artifact, not engine throughput.
"""

from __future__ import annotations

import json
import os
import sys
import time

# Driver heap for the benchmark JVM: must be set BEFORE pyspark launches
# the gateway (builder-time spark.driver.memory cannot resize a running
# JVM). The launcher owns this knob; the session factory deliberately
# does not touch it.
os.environ.setdefault(
    "PYSPARK_SUBMIT_ARGS",
    f"--driver-memory {os.environ.get('SPARK_DRIVER_MEMORY', '48g')} pyspark-shell",
)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sec_xbrl_finwarehouse_spark.session import get_spark

BENCH_QUERIES = [
    # reference-parity pipeline + operators
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
    # beyond-reference: events / text / embeddings
    "event_window_agg",
    "event_sessionize",
    "event_asof_join",
    "event_interval_join",
    "doc_quality",
    "doc_minhash_lsh_dedup",
    "emb_ann_topk",
    "emb_ivf_ann_topk",
    "emb_lsh_ann_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")

    import __spark_entry__ as entrymod

    qmap = entrymod.queries()
    names = [n for n in BENCH_QUERIES if n in qmap]

    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")

    timings: dict[str, float] = {}
    for name in names:
        qmap[name](spark, sf_dir).toPandas()  # warmup: codegen + footers
        spark.catalog.clearCache()
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            qmap[name](spark, sf_dir).toPandas()
            best = min(best, time.time() - t0)
            spark.catalog.clearCache()
        timings[name] = round(best, 3)

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
