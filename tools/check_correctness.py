"""Local stand-in for the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column
names, and values (column-name-sorted, row-sorted, floats both exactly
and with relative tolerance so float-sensitive queries are flagged
early).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb

import __spark_entry__ as entrymod
from sec_xbrl_finwarehouse_spark.schemas import STAR_TABLES
from sec_xbrl_finwarehouse_spark.session import get_spark


def normalize(rows: list[tuple], cols: list[str]) -> list[tuple]:
    """Sort columns by name, then rows; stringify for stable ordering."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]
    return sorted(out, key=lambda r: tuple(str(x) for x in r))


def values_equal(a, b, rel=1e-9) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) or math.isnan(fb):
            return math.isnan(fa) and math.isnan(fb)
        return fa == fb or abs(fa - fb) <= rel * max(abs(fa), abs(fb))
    return str(a) == str(b)


def compare(name: str, spark_df, con, pandas_fetch: bool = False) -> dict:
    t0 = time.time()
    if pandas_fetch:
        # Driver-faithful mode: both sides fetched through pandas/Arrow,
        # the path the driver's value-hash uses.  This is where DuckDB
        # HUGEINT (e.g. an uncast sum(BIGINT) window) degrades to
        # float64/object and hash-mismatches Spark's BIGINT even though a
        # tuple-level fetchall() compare looks identical — the
        # doc_seq_packing r5 failure class.  Values are compared as their
        # post-pandas repr strings, no float tolerance.
        spdf = spark_df.toPandas()
        srows = [tuple(r) for r in spdf.itertuples(index=False, name=None)]
        scols = list(spdf.columns)
    else:
        srows = spark_df.collect()
        scols = spark_df.columns
    t_spark = time.time() - t0

    sql = entrymod.oracle_sql().get(name)
    if sql is None:
        return {"name": name, "status": "NO_ORACLE", "rows": len(srows),
                "t_spark": round(t_spark, 2)}
    t0 = time.time()
    res = con.sql(sql)
    ocols = [d[0] for d in res.description]
    if pandas_fetch:
        # Arrow fetch with date_as_object: DuckDB DATE stays
        # datetime.date, matching Spark's toPandas rendering.  The
        # ``res.df()`` path upcasts DATE to datetime64 (midnight
        # Timestamp), whose str() repr spuriously mismatches every
        # date-emitting query (seen on the 5 day-keyed event queries);
        # HUGEINT still degrades to float64 through Arrow, so the
        # doc_seq_packing r5 failure class this mode exists to catch
        # is still caught.
        odf = res.fetch_arrow_table().to_pandas(date_as_object=True)
        ocols = list(odf.columns)
        orows = [tuple(r) for r in odf.itertuples(index=False, name=None)]
    else:
        orows = res.fetchall()
    t_duck = time.time() - t0

    out = {"name": name, "rows": len(srows), "oracle_rows": len(orows),
           "t_spark": round(t_spark, 2), "t_duck": round(t_duck, 2)}
    if sorted(scols) != sorted(ocols):
        out["status"] = "SCHEMA_MISMATCH"
        out["spark_cols"] = sorted(scols)
        out["oracle_cols"] = sorted(ocols)
        return out
    if len(srows) != len(orows):
        out["status"] = "ROWCOUNT_MISMATCH"
        return out

    sn = normalize([tuple(r) for r in srows], scols)
    on = normalize(orows, ocols)
    if pandas_fetch:
        # hash-faithful: a value survives only if its post-pandas string
        # repr matches exactly (int64 "100" vs HUGEINT->float64 "100.0"
        # must FAIL here, as it does in the driver's value hash)
        sn = [tuple(str(x) for x in r) for r in sn]
        on = [tuple(str(x) for x in r) for r in on]
    exact = sn == on
    n_bad = 0
    first_bad = None
    for i, (sr, orow) in enumerate(zip(sn, on)):
        for j, (sv, ov) in enumerate(zip(sr, orow)):
            if not values_equal(sv, ov):
                n_bad += 1
                if first_bad is None:
                    first_bad = (i, j, sv, ov)
    if n_bad == 0:
        out["status"] = "OK_EXACT" if exact else "OK_TOL"
        if not exact:
            # find a representative diff for reporting
            for sr, orow in zip(sn, on):
                if sr != orow:
                    out["example_float_diff"] = next(
                        (f"{sv!r} vs {ov!r}" for sv, ov in zip(sr, orow) if sv != ov),
                        None,
                    )
                    break
    else:
        out["status"] = "VALUE_MISMATCH"
        out["bad_cells"] = n_bad
        out["first_bad"] = repr(first_bad)
    return out


def main() -> None:
    args = sys.argv[1:]
    # --bare: use a default-config SparkSession (ANSI on, no engine confs)
    # exactly like the driver's external verify harness, to catch any
    # query that silently depends on get_spark's settings
    bare = "--bare" in args
    # --pandas-fetch: fetch both sides through pandas/Arrow and compare
    # post-pandas string reprs strictly — reproduces the driver's
    # value-hash behavior (DuckDB HUGEINT degradation etc.) locally
    pandas_fetch = "--pandas-fetch" in args
    args = [a for a in args if a not in ("--bare", "--pandas-fetch")]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    wanted = args[1:] if args and os.path.isdir(args[0]) else args

    con = duckdb.connect()
    for t in STAR_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    if bare:
        from pyspark.sql import SparkSession

        spark = (SparkSession.builder.master("local[*]")
                 .appName("correctness-check-bare")
                 .config("spark.ui.enabled", "false").getOrCreate())
    else:
        spark = get_spark("correctness-check")
    qmap = entrymod.queries()
    names = [n for n in qmap if not wanted or n in wanted]
    failures = 0
    for name in names:
        try:
            r = compare(name, qmap[name](spark, sf_dir), con,
                        pandas_fetch=pandas_fetch)
        except Exception as e:  # noqa: BLE001
            r = {"name": name, "status": "ERROR", "error": str(e)[:500]}
        if r["status"] not in ("OK_EXACT", "OK_TOL", "NO_ORACLE"):
            failures += 1
        print(r, flush=True)
    print(f"\n{len(names) - failures}/{len(names)} passing", flush=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
