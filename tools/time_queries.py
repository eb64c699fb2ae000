"""Time a subset of declared queries with the bench protocol (warmup +
min-of-N toPandas, cache cleared between reps) -- the per-query probe
used during optimization rounds so a full bench.py run is not needed
for every iteration.

Usage: python tools/time_queries.py [-n REPS] <query> [query ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault(
    "PYSPARK_SUBMIT_ARGS",
    f"--driver-memory {os.environ.get('SPARK_DRIVER_MEMORY', '48g')} pyspark-shell",
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from sec_xbrl_finwarehouse_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    if args and args[0] == "-n":
        reps = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("time-queries")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")

    import __spark_entry__ as entrymod

    qmap = entrymod.queries()
    out = {}
    for name in args:
        spark.sparkContext.setJobDescription(f"warmup: {name}")
        qmap[name](spark, sf_dir).toPandas()
        spark.catalog.clearCache()
        best = float("inf")
        for i in range(reps):
            spark.sparkContext.setJobDescription(f"timed {i}: {name}")
            t0 = time.time()
            qmap[name](spark, sf_dir).toPandas()
            best = min(best, time.time() - t0)
            spark.catalog.clearCache()
        out[name] = round(best, 3)
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"total": round(sum(out.values()), 3), "queries": out}))


if __name__ == "__main__":
    main()
