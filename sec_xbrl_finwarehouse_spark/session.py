"""SparkSession factory tuned for this engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (single JVM); the
settings below are chosen so the same logical plans scale to a real
multi-executor cluster:

* AQE on (runtime coalescing, skew-join splitting) -- at 100 TB the
  static shuffle-partition count is always wrong; AQE re-plans it.
* ``spark.sql.shuffle.partitions`` sized to cores locally; on a cluster
  this would be ~2-3x total cores and AQE coalesces down.
* UTC session timezone, pinned so timestamp semantics match the DuckDB
  oracle (duckdb timestamps are naive-UTC).
* ANSI off: the reference's semantics are Python/Postgres-guarded
  (``safe_div`` returns NULL rather than erroring, casts are lenient);
  every division in this engine is still explicitly zero/NULL-guarded
  so behavior is identical with ANSI on.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if cpus and cpus.isdigit():
        return int(cpus)
    return os.cpu_count() or 8


def get_spark(
    app_name: str = "sec-xbrl-finwarehouse-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    nshuffle = shuffle_partitions or default_parallelism()

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(nshuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.ansi.enabled", "false")
        # dims (region/nation/customer/supplier/part) stay far below this
        # at any SF that matters for the dim side; fact-fact joins never
        # broadcast.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # NOTE deliberately NO spark.driver.memory here: in-process
        # SparkSession creation cannot resize an already-launched JVM, so
        # setting it in the factory silently does nothing. Heap size
        # belongs to the launcher -- bench.py seeds PYSPARK_SUBMIT_ARGS
        # (which DOES apply, it is read before JVM launch), spark-submit
        # users pass --driver-memory.
        .config("spark.ui.enabled", "false")
        # The driver test parquet stores events.ts as TIMESTAMP(NANOS),
        # which Spark's vectorized reader rejects outright; this legacy
        # flag reads the raw int64 instead (queries then reconstruct
        # micros via timestamp_micros(ts div 1000), matching DuckDB's
        # coercion). Scoping it per-read is impossible (no
        # DataFrameReader option exists), so it is a session default here
        # AND set idempotently inside plans/events_queries._events --
        # callers routinely hand the query builders an externally-built
        # session (the driver's verify harness does), and without the
        # conf every events read crashes (ADVICE r2).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Wide-schema codegen: whole-stage codegen silently disables when
        # a plan node carries more than spark.sql.codegen.maxFields
        # (default 100) fields. The MinHash signature aggregation holds
        # 128 min() buffers and the statements pivot ~12 wide columns x
        # struct fields -- measured 27% faster on the signature stage
        # with the limit raised (3.38 s -> 2.47 s at sf0.1; the default
        # plan showed ZERO WholeStageCodegen spans). 400 covers every
        # plan in this engine while still guarding against pathological
        # thousand-column codegen blowups.
        .config("spark.sql.codegen.maxFields", "400")
    )
    # Shuffle/spill files on tmpfs when available: this host's disk is
    # intermittently IO-throttled (load spikes with 97% idle CPU), which
    # made shuffle-bound queries 5-10x slower run-to-run. RAM-backed
    # local dirs are also the standard production choice (NVMe/ramdisk
    # shuffle volumes) and change no query semantics.
    if os.path.isdir("/dev/shm"):
        shuffle_dir = "/dev/shm/spark-local"
        os.makedirs(shuffle_dir, exist_ok=True)
        builder = builder.config("spark.local.dir", shuffle_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)

    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
