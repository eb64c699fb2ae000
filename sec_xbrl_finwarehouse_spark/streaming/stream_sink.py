"""Exactly-once streaming ingest into the stored-table sinks.

Structured Streaming's ``foreachBatch`` hands each micro-batch to
arbitrary batch code, but the engine's delivery guarantee stops at
AT-LEAST-ONCE: after a failure the same micro-batch is REPLAYED with
the same ``batch_id``. Idempotence is the sink's job (the documented
contract of ``DataStreamWriter.foreachBatch``). The reference ingests
incrementally into Postgres where ``INSERT ... ON CONFLICT`` inside a
transaction gives this for free (ingest_facts.py:119-143); on a file
table the equivalent is transactional-write-by-manifest:

* the committed ``(app_id, batch_id)`` watermark is written INSIDE the
  new version directory (``manifest_extra``) before the pointer swap,
  so data and watermark commit in the SAME atomic publish — there is
  no state in which the data landed but the watermark did not, or
  vice versa;
* a replayed batch compares its ``batch_id`` against the committed one
  FOR ITS ``app_id`` and becomes a no-op, so the net effect of any
  crash/retry sequence equals exactly-once;
* ``batch_id`` is only monotonic WITHIN one checkpoint, so the
  watermark is scoped by a caller-supplied ``app_id`` — a new logical
  stream (fresh checkpoint) supplies a new ``app_id`` and is never
  mistaken for a replay. This is exactly Delta's ``txnAppId`` /
  ``txnVersion`` contract for idempotent foreachBatch writes;
* a crash BEFORE the pointer swap leaves the previous version live
  (the failed batch simply re-runs); orphaned ``__staging__`` siblings
  from a killed process are inert (never referenced by any pointer)
  and reclaimed by routine cleanup.

At 100 TB the merge inside each batch is the ordinary upsert plan (one
exchange on the PK; partition-pruned via
:func:`~..sinks.upsert_partitioned` when the table is stored
hive-partitioned), so ingest cost scales with batch size + touched
partitions, not table size.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame

from .. import sinks

TXN_META = "_COMMITTED_TXN"


def last_committed_txn(path: str) -> tuple[str, int] | None:
    """The ``(app_id, batch_id)`` committed with the table's current
    version, or None if the table was never written by a streaming
    sink."""
    raw = sinks.read_version_meta(path, TXN_META)
    if raw is None:
        return None
    app_id, _, batch = raw.strip().rpartition("\n")
    return app_id, int(batch)


def _already_committed(path: str, app_id: str, batch_id: int) -> bool:
    last = last_committed_txn(path)
    return (
        last is not None and last[0] == app_id and batch_id <= last[1]
    )


def _txn_meta(app_id: str, batch_id: int) -> dict[str, str]:
    if "\n" in app_id:
        raise ValueError("app_id must not contain newlines")
    return {TXN_META: f"{app_id}\n{batch_id}"}


def foreach_batch_upsert(
    path: str,
    keys: Sequence[str],
    app_id: str,
    audit: bool = True,
    transform: Callable[[DataFrame], DataFrame] | None = None,
) -> Callable[[DataFrame, int], None]:
    """Build a ``foreachBatch`` function that upserts each micro-batch
    into the stored table at ``path`` (S5 semantics: last-wins on
    ``keys``, audit timestamps preserved across overwrites) with
    ``(app_id, batch_id)`` idempotence.

    ``app_id`` names the logical stream and must be stable across
    restarts of the SAME checkpoint (and fresh for a NEW checkpoint) —
    the caller-owned half of the Delta ``txnAppId`` contract.
    ``transform`` (optional) runs on the micro-batch frame before the
    merge — the place for per-batch shaping (column derivations,
    filtering) so the stored table holds query-ready rows.

    Usage::

        (events.writeStream
            .foreachBatch(foreach_batch_upsert(table, ["event_id"],
                                               app_id="events-ingest-v1"))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start())
    """
    key_list = list(keys)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if _already_committed(path, app_id, batch_id):
            return  # replay of an already-committed batch: no-op
        if transform is not None:
            batch_df = transform(batch_df)
        existing = sinks.read_table(batch_df.sparkSession, path)
        merged = sinks._merge_with_audit(existing, batch_df, key_list, audit)
        sinks.write_replace(
            merged, path, manifest_extra=_txn_meta(app_id, batch_id)
        )

    return _sink


def foreach_batch_upsert_partitioned(
    path: str,
    keys: Sequence[str],
    partition_col: str,
    app_id: str,
    audit: bool = True,
) -> Callable[[DataFrame, int], None]:
    """Partition-pruned variant of :func:`foreach_batch_upsert`: each
    micro-batch rewrites ONLY the hive partitions it touches (untouched
    partitions hard-linked — :func:`~..sinks.upsert_partitioned`), with
    the same ``(app_id, batch_id)`` exactly-once watermark. This is the
    100 TB streaming-ingest shape: per-batch cost scales with the
    batch's partition footprint (for event streams partitioned by day,
    a steady-state batch touches one or two partitions), never with
    table size. ``partition_col`` must be one of ``keys``."""
    key_list = list(keys)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if _already_committed(path, app_id, batch_id):
            return
        sinks.upsert_partitioned(
            batch_df.sparkSession, path, batch_df, key_list,
            partition_col, audit=audit,
            manifest_extra=_txn_meta(app_id, batch_id),
        )

    return _sink


def foreach_batch_append_if_absent(
    path: str,
    keys: Sequence[str],
    app_id: str,
    audit: bool = True,
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` variant with S6 semantics (ON CONFLICT DO
    NOTHING): each micro-batch's new-key rows are committed as new
    files, existing data never rewritten — the append-only streaming
    fast path. Idempotence is structural even WITHOUT the txn check (a
    replayed batch's keys already exist, so zero rows land); the check
    still short-circuits the anti-join on replay. A batch contributing
    zero fresh rows publishes no new version, so the recorded watermark
    can lag the stream — safe: a lagging watermark only causes a
    redundant (and empty) anti-join re-run on replay.
    """
    key_list = list(keys)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if _already_committed(path, app_id, batch_id):
            return
        sinks.append_if_absent(
            batch_df.sparkSession, path, batch_df, key_list, audit=audit,
            manifest_extra=_txn_meta(app_id, batch_id),
        )

    return _sink
