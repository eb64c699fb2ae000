"""Time the DuckDB oracle SQL for the bench queries at a given SF.

This produces the performance comparator from BASELINE.md: the bench
gate is "Spark query time <= 2x the DuckDB runtime on identical
parquet at the same scale factor". Protocol mirrors bench.py: one
warmup execution, then min of 2 timed runs.

Queries are capped at PER_QUERY_CAP_SEC each (watchdog thread calls
``con.interrupt()``); a capped query is reported as the cap value with
a ``"capped"`` marker -- the honest reading is "DuckDB needs at least
this long".

Usage: python tools/bench_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

PER_QUERY_CAP_SEC = 120.0

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb

import __spark_entry__ as entrymod
from bench import BENCH_QUERIES
from sec_xbrl_finwarehouse_spark.schemas import STAR_TABLES


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else \
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    con = duckdb.connect()
    con.sql(f"SET threads TO {os.cpu_count()}")
    for t in STAR_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    def timed_run(sql: str) -> float | None:
        """One execution; returns elapsed sec or None if interrupted."""
        done = threading.Event()

        def watchdog():
            if not done.wait(PER_QUERY_CAP_SEC):
                con.interrupt()

        t = threading.Thread(target=watchdog, daemon=True)
        t.start()
        t0 = time.time()
        try:
            con.sql(sql).fetchall()
            return time.time() - t0
        except duckdb.InterruptException:
            return None
        finally:
            done.set()

    osql = entrymod.oracle_sql()
    only = [a for a in sys.argv[2:]]
    timings: dict[str, float] = {}
    capped: list[str] = []
    for name in BENCH_QUERIES:
        if name not in osql or (only and name not in only):
            continue
        sql = osql[name]
        first = timed_run(sql)  # warmup
        if first is None:
            timings[name] = PER_QUERY_CAP_SEC
            capped.append(name)
            print(json.dumps({"query": name, "sec": PER_QUERY_CAP_SEC,
                              "capped": True}), file=sys.stderr)
            continue
        best = float("inf")
        for _ in range(2):
            got = timed_run(sql)
            best = min(best, got if got is not None else PER_QUERY_CAP_SEC)
        timings[name] = round(best, 3)
        print(json.dumps({"query": name, "sec": timings[name]}), file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "duckdb_oracle_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "capped": capped,
        "sf": float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0),
    }))


if __name__ == "__main__":
    main()
