"""Persistence layer: stored parquet tables with upsert / insert-if-
absent / replace semantics (SURVEY.md §2.1 S5/S6 as WRITES, plus the F12
``now()`` audit columns).

The reference materializes every mart into Postgres with
``INSERT ... ON CONFLICT`` (build_statements_annual_v3.py:156-176,
compute_ratios.py:47-64, seed_companies.py:52-61, ingest_facts.py:119-143)
and stamps rows with ``created_at``/``updated_at`` defaults refreshed on
upsert (db/schema.sql:11,22,61; v3.py:175). Spark file tables have no
in-place conflict resolution, so each write mode here maps onto the
idiom that actually scales on an object store / distributed FS:

* ``write_replace``  -- full-table write-then-swap: the new version is
  written to a temp directory, then atomically renamed over the old one.
  Readers never observe a half-written table, and a query that READS the
  table it is rebuilding (the self-overwrite trap Spark errors on or,
  worse, truncates with) is safe because the scan's file list points at
  the old directory until the swap.
* ``upsert`` (S5) -- ON CONFLICT DO UPDATE: merge incoming over stored
  with :func:`~.operators.upsert.upsert_latest_wins`, preserving
  ``created_at`` for keys that already existed and refreshing
  ``updated_at`` for upserted keys (v3.py:164-175), then write-then-swap
  the merged table. At 100 TB this is the compaction-style merge every
  copy-on-write table format (Delta/Iceberg/Hudi COW) performs; the
  shuffle is one exchange on the PK. Partition the stored table on a
  key prefix so the rewrite touches only affected partitions.
* ``append_if_absent`` (S6) -- ON CONFLICT DO NOTHING: anti-join
  incoming against stored keys, then commit ONLY the new rows as new
  files moved in from a staging directory. The stored data is never
  rewritten -- the append-only fast path (ingest_facts.py:119-143) --
  and re-running the same batch is a byte-identical no-op (second run
  appends zero rows, leaving even timestamps untouched).

Audit columns (F12): ``created_at`` is assigned once when a key first
enters the table; ``updated_at`` refreshes whenever an upsert overwrites
the key. Both are ``current_timestamp()`` -- evaluated once per query,
so every row of a batch gets the same timestamp, like the reference's
single-transaction ``now()``.

Local-FS renames here are ``os.rename`` (atomic on POSIX). On HDFS the
same protocol uses ``FileSystem.rename``; on S3 you'd point the swap at
a manifest/table-format commit instead -- the sink's contract (stage,
validate, atomically publish) is unchanged.
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.upsert import upsert_latest_wins

CREATED_AT = "created_at"
UPDATED_AT = "updated_at"
_AUDIT_COLS = (CREATED_AT, UPDATED_AT)


def read_table(spark: SparkSession, path: str) -> DataFrame | None:
    """Stored table or None if it does not exist yet."""
    if not os.path.exists(path):
        return None
    return spark.read.parquet(path)


def with_audit_cols(df: DataFrame) -> DataFrame:
    """F12: stamp created_at/updated_at = current_timestamp() (one value
    per query, like the reference's single-transaction now())."""
    now = F.current_timestamp()
    return df.withColumn(CREATED_AT, now).withColumn(UPDATED_AT, now)


def _data_cols(df: DataFrame) -> list[str]:
    return [c for c in df.columns if c not in _AUDIT_COLS]


def write_replace(df: DataFrame, path: str) -> None:
    """Write-then-swap full-table publish (atomic on POSIX/HDFS).

    Staging/old directories are siblings of ``path`` (same parent, so
    same filesystem -- a cross-device rename would raise EXDEV and break
    atomicity). If the swap-in of the new version fails after the old
    version was already renamed away, the old version is renamed BACK
    before re-raising, so a failed publish never leaves the table
    missing: readers see either the old or the new version, never a gap.
    """
    tmp = f"{path}.__staging__{uuid.uuid4().hex}"
    df.write.mode("overwrite").parquet(tmp)
    old = f"{path}.__old__{uuid.uuid4().hex}"
    moved_old = False
    try:
        if os.path.exists(path):
            os.rename(path, old)
            moved_old = True
        os.rename(tmp, path)
    except OSError:
        if moved_old and not os.path.exists(path):
            os.rename(old, path)
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    shutil.rmtree(old, ignore_errors=True)


def upsert(
    spark: SparkSession,
    path: str,
    incoming: DataFrame,
    keys: Sequence[str],
    audit: bool = True,
) -> None:
    """S5 as a stored-table write: ON CONFLICT (keys) DO UPDATE.

    Incoming rows overwrite stored rows on key collision; non-colliding
    rows of both survive. With ``audit``, surviving stored rows keep
    their timestamps, overwritten/new keys get ``updated_at = now`` and
    ``created_at`` carried over from the stored row when the key existed
    (db/schema.sql:61 + v3.py:175 semantics). Publishes via
    write-then-swap, so the read-modify-write of the SAME table is safe.
    """
    existing = read_table(spark, path)
    if not audit:
        merged = incoming if existing is None else upsert_latest_wins(
            existing, incoming, keys
        )
        write_replace(merged, path)
        return

    now = F.current_timestamp()
    if existing is None:
        write_replace(with_audit_cols(incoming), path)
        return
    prior = existing.select(*keys, F.col(CREATED_AT).alias("__prior_created"))
    stamped = (
        incoming.join(prior, list(keys), "left")
        .withColumn(CREATED_AT, F.coalesce(F.col("__prior_created"), now))
        .withColumn(UPDATED_AT, now)
        .drop("__prior_created")
    )
    merged = upsert_latest_wins(existing, stamped.select(*existing.columns), keys)
    write_replace(merged, path)


def append_if_absent(
    spark: SparkSession,
    path: str,
    incoming: DataFrame,
    keys: Sequence[str],
    audit: bool = True,
) -> int:
    """S6 as a stored-table write: ON CONFLICT (keys) DO NOTHING.

    Only rows whose key is absent from the stored table are committed,
    as NEW files -- existing data is never rewritten (the append-only
    fast path of ingest_facts.py:119-143). The fresh rows are staged to
    a side directory and their part-files moved in afterwards, so the
    job never writes into a directory it is scanning. Returns the number
    of part-files committed (0 => the batch was a pure duplicate and the
    table is byte-identical, the S6 idempotence contract).
    """
    existing = read_table(spark, path)
    fresh = incoming.dropDuplicates(list(keys))
    if audit:
        fresh = with_audit_cols(fresh)
    if existing is None:
        write_replace(fresh, path)
        return 1
    fresh = fresh.select(*existing.columns).join(
        existing.select(*keys), list(keys), "left_anti"
    )
    staging = f"{path}.__staging__{uuid.uuid4().hex}"
    fresh.write.mode("overwrite").parquet(staging)
    moved = 0
    try:
        for name in os.listdir(staging):
            if not name.startswith("part-") or name.endswith(".crc"):
                continue
            staged = os.path.join(staging, name)
            if _parquet_num_rows(staged) == 0:
                continue  # Spark emits empty part files for empty frames
            os.rename(staged, os.path.join(path, f"append-{uuid.uuid4().hex}-{name}"))
            moved += 1
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    return moved


def _parquet_num_rows(part_path: str) -> int:
    """Row count from the parquet footer (driver-side metadata read)."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(part_path).metadata.num_rows


def table_bytes(path: str) -> int:
    """On-disk bytes of a stored table (driver-side directory walk)."""
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    return total


def compact(
    spark: SparkSession, path: str, target_file_bytes: int = 128 << 20
) -> int:
    """Small-files compaction: rewrite a stored table into
    ``ceil(table_bytes / target_file_bytes)`` files via write-then-swap;
    returns the new file count.

    Streaming appends (``append_if_absent``) and frequent small-batch
    ingests accumulate many tiny part files; at scale each file costs a
    namenode/listing entry, a scan task, and a parquet footer read, so
    periodic compaction to ~128 MB files is routine table maintenance
    (the OPTIMIZE of Delta/Iceberg, expressed on plain parquet). Sizing
    comes from the actual on-disk bytes -- a pure metadata read, no job.
    Data content is unchanged (same rows, no dedup or ordering
    guarantee); the swap keeps readers on the old version until the
    compacted one is fully published."""
    n_files = max(1, -(-table_bytes(path) // target_file_bytes))
    df = spark.read.parquet(path)
    # localCheckpoint pins the input rows BEFORE the swap invalidates
    # the file list the plan points at (self-overwrite trap)
    compacted = df.repartition(n_files).localCheckpoint(eager=True)
    write_replace(compacted, path)
    return n_files


def read_evolving(spark: SparkSession, *paths: str) -> DataFrame:
    """Schema-evolution read: union batches written over time with
    DIFFERENT (additive) schemas into the superset schema, missing
    columns NULL-filled.

    ``mergeSchema`` makes the parquet source reconcile footers across
    all inputs instead of trusting the first file -- the standard knob
    for long-lived ingest directories where new columns appear in later
    batches. Reconciliation is footer-metadata-only (no data job); reads
    of old files project the absent columns as NULL at scan time. Column
    REMOVALS and type changes are not handled here -- those are breaking
    changes a real pipeline routes through a table format with schema
    enforcement."""
    return spark.read.option("mergeSchema", "true").parquet(*paths)
