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

* ``write_replace``  -- full-table write + manifest-pointer commit: the
  new version is written to its own immutable directory under the table
  root, then published by atomically replacing the ``_CURRENT`` pointer
  file. Readers resolve the pointer once at read time and scan ONE
  version directory, so a reader overlapping a publish sees the old
  version or the new one, never a half-swapped mix -- and because the
  previous version's files are retained until the NEXT publish, a
  reader that resolved just before the swap still finds every file it
  listed (the window a bare directory-rename swap leaves open). A query
  that READS the table it is rebuilding (the self-overwrite trap Spark
  errors on or, worse, truncates with) is safe for the same reason: the
  scan's file list points at the old version directory throughout.
* ``upsert`` (S5) -- ON CONFLICT DO UPDATE: merge incoming over stored
  with :func:`~.operators.upsert.upsert_latest_wins`, preserving
  ``created_at`` for keys that already existed and refreshing
  ``updated_at`` for upserted keys (v3.py:164-175), then write-then-swap
  the merged table. At 100 TB this is the compaction-style merge every
  copy-on-write table format (Delta/Iceberg/Hudi COW) performs; the
  shuffle is one exchange on the PK. Partition the stored table on a
  key prefix so the rewrite touches only affected partitions.
* ``append_if_absent`` (S6) -- ON CONFLICT DO NOTHING: anti-join
  incoming against stored keys, then commit ONLY the new rows: a new
  version directory hard-links every existing part-file (zero data
  copy) plus the staged new files, and the pointer swap publishes both
  together. Existing data is never rewritten -- the append-only fast
  path (ingest_facts.py:119-143) -- and re-running the same batch is a
  byte-identical no-op (zero fresh rows publishes no new version,
  leaving even timestamps untouched).

Audit columns (F12): ``created_at`` is assigned once when a key first
enters the table; ``updated_at`` refreshes whenever an upsert overwrites
the key. Both are ``current_timestamp()`` -- evaluated once per query,
so every row of a batch gets the same timestamp, like the reference's
single-transaction ``now()``.

Pointer replacement is ``os.replace`` (atomic on POSIX); version
directories are immutable once published. This is the minimal form of
the manifest commit every table format (Delta/Iceberg/Hudi) performs --
on S3 the same pointer lives in a conditional-PUT object or a catalog
entry; the sink's contract (stage, validate, atomically publish,
retain the prior version for in-flight readers) is unchanged.
"""

from __future__ import annotations

import functools
import os
import shutil
import time
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.upsert import upsert_latest_wins

CREATED_AT = "created_at"
UPDATED_AT = "updated_at"
_AUDIT_COLS = (CREATED_AT, UPDATED_AT)


_POINTER = "_CURRENT"


def current_data_dir(path: str) -> str | None:
    """Resolve the manifest pointer to the active version directory.

    Returns None if the table does not exist. A pre-manifest flat
    parquet directory (no ``_CURRENT`` inside) resolves to itself, so
    tables written by older versions of this sink stay readable.
    """
    pointer = os.path.join(path, _POINTER)
    if os.path.exists(pointer):
        with open(pointer, encoding="ascii") as f:
            version = f.read().strip()
        return os.path.join(path, version)
    if os.path.exists(path):
        return path  # legacy flat layout
    return None


class ConcurrentWriteError(RuntimeError):
    """Another writer published between this writer's read snapshot and
    its commit attempt. The table is untouched by the failed commit;
    re-read and retry (optimistic concurrency, the Delta/Iceberg commit
    protocol)."""


# sentinel for "I expect the table not to exist yet"
EXPECT_ABSENT = ""

# per-version commit-sequence file: the CONTENT-ADDRESSED version order.
# Directory mtime is only creation order while nothing outside the
# writer touches the tree -- restore()/clone() hard-link trees, and an
# external cp/rsync of a table directory rewrites every mtime, silently
# reordering history (retain-prune would then count the wrong versions).
# Every publish writes a monotonic sequence number (max existing + 1,
# assigned INSIDE the commit lock) into the version directory instead;
# mtime remains only the legacy fallback for pre-_SEQ versions.
_SEQ_FILE = "_SEQ"
# grace window before an UNSTAMPED v_ dir may be reclaimed by the
# post-commit prune: long enough that no live commit (bounded by the
# commit-lock timeout) can still be between its move-in and its _SEQ
# stamp; old enough unstamped dirs are pre-_SEQ legacy debris
_STAGE_GRACE_SEC = 300.0

# meta files a DATA-CHANGING publish must never copy from the previous
# version: _SEQ is re-stamped inside the commit lock, and a stale
# _FILE_STATS manifest on a version whose files changed would make
# read_table_pruned silently drop the unlisted files (the invariant
# commit_meta_only documents — stats only survive link-identical
# publishes). STATS_META (defined with the stats writer below) asserts
# its membership here so the two constants cannot drift apart.
_NO_CARRY_META = {_SEQ_FILE, "_FILE_STATS"}


def _carry_meta_forward(src_dir: str, version_dir: str) -> None:
    """Copy the previous version's commit-metadata (``_``-prefixed)
    files — stream txn markers, ingest watermarks, index cell maps —
    into an unpublished version directory, minus :data:`_NO_CARRY_META`.
    Callers write their own ``manifest_extra`` AFTER this, so
    caller-supplied values overlay the carried ones."""
    for name in os.listdir(src_dir):
        src = os.path.join(src_dir, name)
        if (name.startswith("_") and name not in _NO_CARRY_META
                and os.path.isfile(src)):
            shutil.copy2(src, os.path.join(version_dir, name))


def _version_seq(path: str, name: str) -> int | None:
    """The commit sequence persisted in a version's manifest, or None
    for a pre-_SEQ (legacy) version."""
    try:
        with open(os.path.join(path, name, _SEQ_FILE),
                  encoding="ascii") as f:
            return int(f.read().strip())
    except (OSError, ValueError):
        return None


def _pointer_value(path: str) -> str | None:
    pointer = os.path.join(path, _POINTER)
    if not os.path.exists(pointer):
        return None
    with open(pointer, encoding="ascii") as f:
        return f.read().strip()


class _commit_lock:
    """Tiny mutual-exclusion window around check-pointer + swap-pointer
    (POSIX has no file CAS). O_CREAT|O_EXCL lock file, bounded retry;
    a lock older than ``stale_s`` is from a dead writer and is broken.
    The critical section is microseconds (one read + one rename), so
    contention is resolved in the first few retries."""

    def __init__(self, path: str, timeout_s: float = 5.0,
                 stale_s: float = 60.0):
        self.lock = os.path.join(path, "._COMMIT_LOCK")
        self.timeout_s = timeout_s
        self.stale_s = stale_s

    def __enter__(self):
        import time
        deadline = time.monotonic() + self.timeout_s
        while True:
            try:
                fd = os.open(self.lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.close(fd)
                return self
            except FileExistsError:
                try:
                    import time as _t
                    if _t.time() - os.path.getmtime(self.lock) > self.stale_s:
                        os.unlink(self.lock)  # dead writer
                        continue
                except OSError:
                    continue
                if time.monotonic() > deadline:
                    raise ConcurrentWriteError(
                        f"commit lock {self.lock} held past {self.timeout_s}s"
                    ) from None
                time.sleep(0.05)

    def __exit__(self, *exc):
        try:
            os.unlink(self.lock)
        except OSError:
            pass
        return False


def _publish_version(
    path: str,
    version_dir: str,
    retain: int = 2,
    expect_version: str | None = None,
    cleanup_staged_on_fail: bool = True,
) -> None:
    """Atomically repoint ``_CURRENT`` at ``version_dir`` (already moved
    inside ``path``), then prune all but the newest ``retain`` versions
    (current included). The default keeps current + previous: a reader
    that resolved the pointer an instant before the swap still finds
    every file it is scanning; ``vacuum`` reclaims superseded versions
    once no readers can be in flight. A larger ``retain`` keeps a
    time-travel history (:func:`list_versions` / ``read_table(...,
    version=...)``) at the cost of storing the superseded copies —
    bounded and predictable, like a Delta/Iceberg retention window.

    ``expect_version`` enables optimistic concurrency: the commit goes
    through only if the pointer still names that version
    (:data:`EXPECT_ABSENT` = "the table must not exist yet"); on a
    mismatch the staged version directory is removed and
    :class:`ConcurrentWriteError` raised — the table keeps the other
    writer's commit. ``None`` preserves last-write-wins."""
    version = os.path.basename(version_dir)
    pointer = os.path.join(path, _POINTER)
    tmp_pointer = os.path.join(path, f".{_POINTER}.{uuid.uuid4().hex}")
    with open(tmp_pointer, "w", encoding="ascii") as f:
        f.write(version)
        f.flush()
        os.fsync(f.fileno())
    try:
        with _commit_lock(path):
            if expect_version is not None:
                now = _pointer_value(path)
                expected = None if expect_version == EXPECT_ABSENT \
                    else expect_version
                if now != expected:
                    raise ConcurrentWriteError(
                        f"{path}: expected current version "
                        f"{expected!r}, found {now!r}"
                    )
            # stamp the commit sequence INSIDE the lock: max over every
            # retained version (the staged dir itself may carry a stale
            # _SEQ copied forward by a linked publish -- it is <= max
            # and gets overwritten here), so the order is decided by
            # the serialized commits, never by filesystem timestamps
            seqs = [
                s for s in (
                    _version_seq(path, n)
                    for n in os.listdir(path)
                    if n.startswith("v_")
                    and os.path.isdir(os.path.join(path, n))
                )
                if s is not None
            ]
            seq_path = os.path.join(version_dir, _SEQ_FILE)
            with open(seq_path, "w", encoding="ascii") as f:
                f.write(str((max(seqs) if seqs else 0) + 1))
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp_pointer, pointer)  # THE commit point (atomic on POSIX)
    except ConcurrentWriteError:
        # the commit did NOT happen (lock timeout or OCC mismatch):
        # remove the staged pointer AND the already-moved-in version
        # directory, or version enumeration would treat the orphan as
        # the newest version and the next publish's retain-prune could
        # delete the genuine previous version under in-flight readers.
        # ``cleanup_staged_on_fail=False`` is for callers whose
        # version_dir holds the ONLY copy of pre-existing data (the
        # legacy-flat migration) -- they restore it themselves
        try:
            os.unlink(tmp_pointer)
        except OSError:
            pass
        if cleanup_staged_on_fail:
            shutil.rmtree(version_dir, ignore_errors=True)
        raise
    # post-commit retain-prune is best-effort: the pointer swap above
    # already committed, so a prune failure must never propagate into a
    # caller's cleanup path (which would remove the committed version)
    try:
        keep = set(_versions_newest_first(path)[: max(retain, 1)])
        keep.add(version)
        now = time.time()
        for name in os.listdir(path):
            if not name.startswith("v_") or name in keep:
                continue
            if _version_seq(path, name) is None:
                # an UNSTAMPED v_ dir is either a concurrent writer's
                # staged version (it moves in and stamps its _SEQ while
                # holding the commit lock; this prune deliberately runs
                # outside it) or pre-_SEQ legacy debris. Under the _SEQ
                # ordering an unstamped dir sorts OLDEST, so pruning it
                # here would destroy an in-flight last-write-wins
                # publish mid-commit -- leave young unstamped dirs
                # alone and reclaim only ones old enough that no live
                # commit can still be stamping them.
                try:
                    age = now - os.path.getmtime(os.path.join(path, name))
                except OSError:
                    continue
                if age < _STAGE_GRACE_SEC:
                    continue
            shutil.rmtree(os.path.join(path, name), ignore_errors=True)
    except OSError:
        pass


def _versions_newest_first(path: str) -> list[str]:
    """Version directory names under ``path``, newest first, ordered by
    the persisted ``_SEQ`` commit sequence -- content-addressed, so a
    cp/rsync of the table tree (which rewrites every mtime) cannot
    reorder history. Pre-_SEQ legacy versions sort BELOW every stamped
    version (they are older by construction: once a stamped publish
    exists, all later publishes stamp too) and amongst themselves by
    mtime, the best signal available for them."""
    if not os.path.exists(path):
        return []
    vs = [n for n in os.listdir(path) if n.startswith("v_")
          and os.path.isdir(os.path.join(path, n))]

    def key(n: str) -> tuple:
        seq = _version_seq(path, n)
        if seq is None:
            return (0, os.path.getmtime(os.path.join(path, n)))
        return (1, seq)

    return sorted(vs, key=key, reverse=True)


def list_versions(path: str) -> list[dict]:
    """Time-travel catalog: every retained version of a stored table,
    newest first, with its commit time and whether it is current."""
    cur = current_data_dir(path)
    cur_name = os.path.basename(cur) if cur else None
    return [
        {
            "version": name,
            "committed_at": os.path.getmtime(os.path.join(path, name)),
            "seq": _version_seq(path, name),
            "is_current": name == cur_name,
        }
        for name in _versions_newest_first(path)
    ]


def _write_manifest_extra(
    version_dir: str, manifest_extra: dict[str, str] | None
) -> None:
    """Write commit metadata files into an (unpublished) version
    directory. Names must start with ``_`` so parquet scans skip
    them."""
    for name, content in (manifest_extra or {}).items():
        if not name.startswith("_"):
            raise ValueError(f"manifest_extra name {name!r} must start with '_'")
        with open(os.path.join(version_dir, name), "w",
                  encoding="utf-8") as f:
            f.write(content)


def vacuum(path: str) -> int:
    """Drop every retained version except the current one; returns the
    number of directories removed. Run when no readers are in flight
    (the table-format VACUUM contract)."""
    cur = current_data_dir(path)
    if cur is None or cur == path:
        return 0
    keep = os.path.basename(cur)
    removed = 0
    for name in os.listdir(path):
        if name.startswith("v_") and name != keep:
            shutil.rmtree(os.path.join(path, name), ignore_errors=True)
            removed += 1
    return removed


def read_table(
    spark: SparkSession, path: str, version: str | None = None
) -> DataFrame | None:
    """Stored table or None if it does not exist yet. The pointer is
    resolved HERE, once -- the returned frame is pinned to one immutable
    version directory, unaffected by concurrent publishes.

    ``version`` (a name from :func:`list_versions`) time-travels to a
    retained superseded version -- the audit/debug read every table
    format offers. Raises if the named version is no longer retained."""
    if version is not None:
        vdir = os.path.join(path, version)
        if not os.path.isdir(vdir):
            raise FileNotFoundError(
                f"version {version!r} not retained under {path}"
            )
        return spark.read.parquet(vdir)
    data_dir = current_data_dir(path)
    if data_dir is None:
        return None
    return spark.read.parquet(data_dir)


def with_audit_cols(df: DataFrame) -> DataFrame:
    """F12: stamp created_at/updated_at = current_timestamp() (one value
    per query, like the reference's single-transaction now())."""
    now = F.current_timestamp()
    return df.withColumn(CREATED_AT, now).withColumn(UPDATED_AT, now)


def _data_cols(df: DataFrame) -> list[str]:
    return [c for c in df.columns if c not in _AUDIT_COLS]


class ConstraintViolation(ValueError):
    """A staged publish failed its data-quality checks. The table was
    NOT modified: the previous version stays current and the staged
    files are removed. ``.counts`` maps check name -> violating rows."""

    def __init__(self, path: str, counts: dict[str, int]):
        self.counts = counts
        super().__init__(f"publish to {path} rejected: {counts}")


def _check_staged(
    spark: SparkSession,
    staged_dir: str,
    checks: Sequence[tuple[str, str]] | None,
    unique_key: Sequence[str] | None,
) -> dict[str, int]:
    """Validate a staged version from its own files (the data is
    already on disk — no recompute of the writer's plan). Row checks
    run as ONE aggregation pass; the unique-key check is one groupBy.
    Returns {check_name: n_violations} for failing checks only."""
    staged = spark.read.parquet(staged_dir)
    counts: dict[str, int] = {}
    if checks:
        aggs = [
            F.sum(F.when(~F.expr(cond), 1).otherwise(0)).alias(name)
            for name, cond in checks
        ]
        row = staged.agg(*aggs).first()
        for name, _ in checks:
            n = row[name]
            if n:
                counts[name] = int(n)
    if unique_key:
        dupes = (
            staged.groupBy(*unique_key).count()
            .filter(F.col("count") > 1)
            .agg(F.sum(F.col("count") - 1).alias("extra"))
            .first()["extra"]
        )
        if dupes:
            counts[f"unique({', '.join(unique_key)})"] = int(dupes)
    return counts


def write_replace(
    df: DataFrame,
    path: str,
    manifest_extra: dict[str, str] | None = None,
    retain: int = 2,
    expect_version: str | None = None,
    checks: Sequence[tuple[str, str]] | None = None,
    unique_key: Sequence[str] | None = None,
    stats_cols: Sequence[str] | None = None,
) -> None:
    """Full-table publish via manifest-pointer commit.

    The frame is written to a staging sibling (same filesystem, so the
    move into the table root cannot cross devices), moved in as an
    immutable ``v_<hex>`` version directory, and published by atomically
    replacing the ``_CURRENT`` pointer. A failure before the pointer
    swap leaves the previous version live and intact -- a failed publish
    never leaves the table missing or half-written. Readers overlapping
    the publish see the old version or the new one, never a mix; the
    superseded version's files are retained until the next publish (or
    :func:`vacuum`) so in-flight scans keep resolving.

    ``manifest_extra`` maps filenames (must start with ``_`` so parquet
    scans ignore them) to string contents written INSIDE the version
    directory before the pointer swap -- metadata that commits
    atomically with the data it describes (e.g. the streaming sink's
    committed-batch id). A version published without a given file simply
    has no such metadata.

    ``checks`` (Delta-constraint semantics: ``[(name, sql_condition)]``,
    every row must satisfy every condition) and ``unique_key`` gate the
    publish: validation runs on the STAGED files (one aggregation pass,
    no recompute of the writer's plan), and any violation removes the
    staging and raises :class:`ConstraintViolation` — bad data can
    never become the current version, readers keep the last good one.
    """
    tmp = f"{path}.__staging__{uuid.uuid4().hex}"
    df.write.mode("overwrite").parquet(tmp)
    if checks or unique_key:
        bad = _check_staged(df.sparkSession, tmp, checks, unique_key)
        if bad:
            shutil.rmtree(tmp, ignore_errors=True)
            raise ConstraintViolation(path, bad)
    extra = dict(manifest_extra or {})
    if stats_cols:
        import json as _json

        extra[STATS_META] = _json.dumps(
            _collect_file_stats(tmp, list(stats_cols))
        )
    _write_manifest_extra(tmp, extra)
    legacy_flat = os.path.exists(path) and not os.path.exists(
        os.path.join(path, _POINTER)
    )
    version_dir = os.path.join(path, f"v_{uuid.uuid4().hex}")
    try:
        if legacy_flat:
            # one-time migration: tuck the flat files into a version dir
            # so the pre-swap layout stays readable as "previous". The
            # moved files are the ONLY copy of the pre-migration table,
            # so a failed publish (commit-lock timeout, stale lock from
            # a crashed writer) must move them BACK, never delete them
            legacy_v = os.path.join(path, f"v_legacy_{uuid.uuid4().hex}")
            os.mkdir(legacy_v)
            moved = []
            for name in os.listdir(path):
                if not name.startswith(("v_", ".")):
                    os.rename(os.path.join(path, name),
                              os.path.join(legacy_v, name))
                    moved.append(name)
            try:
                _publish_version(path, legacy_v,
                                 cleanup_staged_on_fail=False)
            except Exception:
                for name in moved:
                    os.rename(os.path.join(legacy_v, name),
                              os.path.join(path, name))
                os.rmdir(legacy_v)
                raise
        os.makedirs(path, exist_ok=True)
        os.rename(tmp, version_dir)
        _publish_version(path, version_dir, retain=retain,
                         expect_version=expect_version)
    except Exception:
        # any pre-commit failure (OSError, ConcurrentWriteError, ...):
        # neither the staging dir nor the staged version dir may
        # survive — an orphaned v_<hex> would be enumerated as a real
        # version by retain-pruning and time travel
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(version_dir, ignore_errors=True)
        raise


def read_version_meta(
    path: str, name: str, version: str | None = None
) -> str | None:
    """Read a ``manifest_extra`` file committed with the CURRENT version
    (or with a retained ``version``, matching :func:`read_table`'s time
    travel); None if the table or the file does not exist. Because the
    file lives inside the version directory, the value observed is
    always the one committed atomically with the data being read."""
    if version is not None:
        data_dir = os.path.join(path, version)
        if not os.path.isdir(data_dir):
            raise FileNotFoundError(
                f"version {version!r} not retained under {path}"
            )
    else:
        data_dir = current_data_dir(path)
    if data_dir is None:
        return None
    meta = os.path.join(data_dir, name)
    if not os.path.exists(meta):
        return None
    with open(meta, encoding="utf-8") as f:
        return f.read()


def upsert(
    spark: SparkSession,
    path: str,
    incoming: DataFrame,
    keys: Sequence[str],
    audit: bool = True,
    retain: int = 2,
    occ: bool = False,
    manifest_extra: dict[str, str] | None = None,
) -> None:
    """S5 as a stored-table write: ON CONFLICT (keys) DO UPDATE.

    Incoming rows overwrite stored rows on key collision; non-colliding
    rows of both survive. With ``audit``, surviving stored rows keep
    their timestamps, overwritten/new keys get ``updated_at = now`` and
    ``created_at`` carried over from the stored row when the key existed
    (db/schema.sql:61 + v3.py:175 semantics). Publishes via
    write-then-swap, so the read-modify-write of the SAME table is safe.
    """
    expect: str | None = None
    if occ:
        # resolve the snapshot ONCE: the merge reads this version and
        # the commit requires the pointer to still name it (read-
        # modify-write without lost updates; ConcurrentWriteError on
        # interleave -> caller re-reads and retries)
        data_dir = current_data_dir(path)
        if data_dir is None:
            expect = EXPECT_ABSENT
        elif data_dir != path:  # legacy flat layout has no version name
            expect = os.path.basename(data_dir)
        existing = (
            None if data_dir is None else spark.read.parquet(data_dir)
        )
    else:
        existing = read_table(spark, path)
    write_replace(
        _merge_with_audit(existing, incoming, keys, audit), path,
        retain=retain, expect_version=expect,
        manifest_extra=manifest_extra,
    )


def _merge_with_audit(
    existing: DataFrame | None,
    incoming: DataFrame,
    keys: Sequence[str],
    audit: bool,
) -> DataFrame:
    """The upsert merge (latest wins on ``keys``) with the reference's
    audit semantics: created_at survives an overwrite, updated_at
    refreshes for upserted keys (db/schema.sql:61, v3.py:175)."""
    if not audit:
        return incoming if existing is None else upsert_latest_wins(
            existing, incoming, keys
        )
    now = F.current_timestamp()
    if existing is None:
        return with_audit_cols(incoming)
    # NULL-safe equi-join: the merge groups NULL keys together
    # (upsert_latest_wins windows NULL as a value), so the audit
    # carry-over must match them too -- a plain equi-join would reset
    # created_at on every upsert of a NULL-keyed row
    prior = existing.select(
        *[F.col(k).alias(f"__pk_{k}") for k in keys],
        F.col(CREATED_AT).alias("__prior_created"),
    )
    cond = functools.reduce(
        lambda a, b: a & b,
        [incoming[k].eqNullSafe(prior[f"__pk_{k}"]) for k in keys],
    )
    stamped = (
        incoming.join(prior, cond, "left")
        .withColumn(CREATED_AT, F.coalesce(F.col("__prior_created"), now))
        .withColumn(UPDATED_AT, now)
        .drop("__prior_created", *[f"__pk_{k}" for k in keys])
    )
    return upsert_latest_wins(existing, stamped.select(*existing.columns), keys)


def upsert_partitioned(
    spark: SparkSession,
    path: str,
    incoming: DataFrame,
    keys: Sequence[str],
    partition_col: str,
    audit: bool = True,
    manifest_extra: dict[str, str] | None = None,
    occ: bool | str = False,
) -> int:
    """Partition-pruned copy-on-write upsert: the table is stored
    hive-partitioned on ``partition_col`` (which must be a key prefix --
    every key's rows live in exactly one partition), and an upsert
    REWRITES ONLY THE PARTITIONS THE BATCH TOUCHES. Untouched
    partitions are HARD-LINKED into the new version (zero data copy,
    zero read), so the cost of an incremental upsert scales with the
    batch's partition footprint, not the table -- the Delta/Iceberg/
    Hudi COW behavior, on plain parquet + the manifest pointer. This is
    how the daily mart refresh stays cheap at 100 TB: the stored scan
    is partition-pruned to the touched values (only those directories
    are listed or read), the merge shuffles only touched-partition
    rows, and the pointer swap publishes the whole new version
    atomically. Returns the number of partitions rewritten.

    ``partition_col`` must be one of ``keys`` (otherwise a key could
    move between partitions and the untouched-partition reuse would
    leave a stale copy behind).

    ``occ=True`` turns the read-merge-publish into an optimistic
    read-modify-write (same contract as :func:`upsert`): the publish
    goes through only if the pointer still names the version this call
    read its stored side from, else :class:`ConcurrentWriteError`.
    Passing a version NAME instead of True pins the expectation to a
    version the CALLER already resolved -- the guard a caller needs
    when its merge DECISIONS (not just the merged rows) depend on what
    it read earlier, e.g. the IVF appender's split-aware dedup against
    the version's cell map: any publish racing in after the caller's
    read fails this commit instead of tearing it.
    """
    if partition_col not in keys:
        raise ValueError(
            f"partition_col {partition_col!r} must be one of keys {list(keys)}"
        )
    cur = current_data_dir(path)
    if isinstance(occ, str):
        expect = occ
    elif occ:
        expect = EXPECT_ABSENT if cur is None else os.path.basename(cur)
    else:
        expect = None
    if cur is None:
        tmp = f"{path}.__staging__{uuid.uuid4().hex}"
        _merge_with_audit(None, incoming, keys, audit).write.mode(
            "overwrite"
        ).partitionBy(partition_col).parquet(tmp)
        version_dir = os.path.join(path, f"v_{uuid.uuid4().hex}")
        os.makedirs(path, exist_ok=True)
        try:
            os.rename(tmp, version_dir)
            _write_manifest_extra(version_dir, manifest_extra)
            _publish_version(path, version_dir, expect_version=expect)
        except Exception:
            # same no-orphan contract as write_replace: a failed publish
            # (OSError, manifest write, OCC) must not leave a v_<hex>
            # visible to retain-pruning/time travel; everything here is
            # staged output, recomputable
            shutil.rmtree(tmp, ignore_errors=True)
            shutil.rmtree(version_dir, ignore_errors=True)
            raise
        return len([n for n in os.listdir(version_dir)
                    if n.startswith(f"{partition_col}=")])
    # the untouched-partition hard-link pass below only preserves
    # `partition_col=` directories; a current version that is NOT laid
    # out hive-partitioned (e.g. written flat by write_replace) would
    # silently lose every stored row, so refuse it up front
    cur_names = [n for n in os.listdir(cur) if not n.startswith((".", "_"))]
    if cur_names and not any(
        n.startswith(f"{partition_col}=") for n in cur_names
    ):
        raise ValueError(
            f"{path}: current version is not hive-partitioned on "
            f"{partition_col!r} (no {partition_col}= directories); "
            "rewrite it with upsert_partitioned/partitionBy first"
        )
    # touched partition values: a partition-count-sized driver list,
    # the same metadata any table-format commit materializes
    touched = [
        r[0] for r in incoming.select(partition_col).distinct().collect()
    ]
    # NULL-safe membership: isin() never matches NULL (three-valued
    # logic), but a NULL partition value is stored under
    # __HIVE_DEFAULT_PARTITION__ and the staged rewrite DOES replace
    # that directory — without the isNull() arm the stored NULL rows
    # would be silently dropped
    non_null = [t for t in touched if t is not None]
    member = (
        F.col(partition_col).isin(non_null) if non_null else F.lit(False)
    )
    if any(t is None for t in touched):
        member = member | F.col(partition_col).isNull()
    stored_touched = read_table(spark, path).filter(member)
    merged = _merge_with_audit(stored_touched, incoming, keys, audit)
    staging = f"{path}.__staging__{uuid.uuid4().hex}"
    merged.write.mode("overwrite").partitionBy(partition_col).parquet(staging)
    try:
        rewritten = [n for n in os.listdir(staging)
                     if n.startswith(f"{partition_col}=")]
        version_dir = os.path.join(path, f"v_{uuid.uuid4().hex}")
        try:
            os.mkdir(version_dir)
            for name in os.listdir(cur):   # untouched partitions: link
                if name.startswith(f"{partition_col}=") \
                        and name not in rewritten:
                    src = os.path.join(cur, name)
                    dst = os.path.join(version_dir, name)
                    os.mkdir(dst)
                    for f in os.listdir(src):
                        if not f.startswith("."):
                            os.link(os.path.join(src, f),
                                    os.path.join(dst, f))
            for name in rewritten:         # touched partitions: move in
                os.rename(os.path.join(staging, name),
                          os.path.join(version_dir, name))
            _write_manifest_extra(version_dir, manifest_extra)
            _publish_version(path, version_dir, expect_version=expect)
        except Exception:
            # no-orphan contract (see write_replace): version_dir holds
            # only hard links + staged copies, safe to drop on ANY
            # publish failure, not just ConcurrentWriteError
            shutil.rmtree(version_dir, ignore_errors=True)
            raise
        return len(rewritten)
    finally:
        shutil.rmtree(staging, ignore_errors=True)


def replace_where(
    spark: SparkSession,
    path: str,
    partition_col: str,
    values: Sequence,
    incoming: DataFrame,
    manifest_extra: dict[str, str] | None = None,
    expect_version: str | None = None,
) -> int:
    """Delta-style ``replaceWhere`` on the versioned store: publish a
    version in which the partitions whose ``partition_col`` is in
    ``values`` are DROPPED and ``incoming``'s rows (written
    hive-partitioned on ``partition_col``) stand in their place, with
    every other partition hard-linked (zero copy, zero read). Unlike
    :func:`upsert_partitioned` this can REMOVE a partition value and
    MOVE rows to new partition values -- the primitive a storage
    reorganization (cell split, re-bucketing) needs, where a key's
    partition assignment itself changes. ``incoming`` may target
    partition values outside ``values``; any such existing partition
    is replaced as well (it is part of the rewrite footprint).

    Atomic publish; ``expect_version`` enables the same OCC contract as
    every versioned writer — a reorganizer computes ``incoming`` from a
    snapshot read, so it MUST pass the snapshot's version or a writer
    committing in between is silently erased from the rewritten
    partitions (the torn-merge class). ``None`` is last-write-wins,
    acceptable only for single-writer maintenance windows.

    The previous version's ``_`` commit-metadata files (stream txn
    markers, ingest watermarks, index cell maps) are carried forward
    and overlaid by ``manifest_extra`` — a partition reorganization
    must not erase a stream's idempotence marker. ``_FILE_STATS`` is
    deliberately dropped (data changed; see :data:`_NO_CARRY_META`).
    Returns the number of partitions written."""
    cur = current_data_dir(path)
    if cur is None:
        raise FileNotFoundError(f"{path}: no current version to reorganize")
    cur_names = [n for n in os.listdir(cur) if not n.startswith((".", "_"))]
    if cur_names and not any(
        n.startswith(f"{partition_col}=") for n in cur_names
    ):
        raise ValueError(
            f"{path}: current version is not hive-partitioned on "
            f"{partition_col!r}"
        )
    dropped = {f"{partition_col}={v}" for v in values}
    staging = f"{path}.__staging__{uuid.uuid4().hex}"
    incoming.write.mode("overwrite").partitionBy(partition_col).parquet(
        staging
    )
    try:
        rewritten = [n for n in os.listdir(staging)
                     if n.startswith(f"{partition_col}=")]
        if not rewritten and dropped:
            # an empty incoming under non-empty `values` would publish
            # a version that silently DELETES those partitions -- a
            # reorganization must re-insert the rows it displaces, so
            # treat this as caller error (deletion is sinks.merge's
            # explicit tombstone clause, never an accident here)
            raise ValueError(
                f"{path}: replace_where got an empty incoming frame "
                f"while dropping {sorted(dropped)} -- refusing to "
                "publish a silent partition deletion"
            )
        version_dir = os.path.join(path, f"v_{uuid.uuid4().hex}")
        try:
            os.mkdir(version_dir)
            for name in os.listdir(cur):   # kept partitions: hard-link
                if (name.startswith(f"{partition_col}=")
                        and name not in dropped and name not in rewritten):
                    src = os.path.join(cur, name)
                    dst = os.path.join(version_dir, name)
                    os.mkdir(dst)
                    for f in os.listdir(src):
                        if not f.startswith("."):
                            os.link(os.path.join(src, f),
                                    os.path.join(dst, f))
            for name in rewritten:         # rewritten partitions: move in
                os.rename(os.path.join(staging, name),
                          os.path.join(version_dir, name))
            _carry_meta_forward(cur, version_dir)
            _write_manifest_extra(version_dir, manifest_extra)
            _publish_version(path, version_dir,
                             expect_version=expect_version)
        except Exception:
            # no-orphan contract (see write_replace)
            shutil.rmtree(version_dir, ignore_errors=True)
            raise
        return len(rewritten)
    finally:
        shutil.rmtree(staging, ignore_errors=True)


def commit_meta_only(path: str, manifest_extra: dict[str, str]) -> None:
    """Publish a new version with IDENTICAL data (hard links to the
    current part-files) and updated ``manifest_extra`` — the
    watermark-advance commit for incremental ingest: a run that found
    work to record but no new rows (e.g. a re-listed source chunk whose
    samples were all duplicates) must still move its watermark, or it
    re-scans the same chunk forever. Same atomicity as every publish:
    readers see the old version or the new one, never a mix; a failure
    removes the version directory (links only — data is never at
    risk).

    Both flat and hive-partitioned (``col=value/`` subdirectory)
    layouts are linked recursively — a partitioned table must not
    silently publish an empty version (the mirror image of
    upsert_partitioned's layout guard).

    Prior ``_`` metadata files (stats, stream txn markers) are COPIED
    forward, then overlaid with ``manifest_extra``. That carry-forward
    is safe precisely BECAUSE the data is identical: per-file stats
    remain exact for every linked file. Data-changing publishes
    (append_if_absent, upsert) deliberately do NOT carry stats forward
    — :func:`read_table_pruned` reads ONLY files listed in the stats
    manifest, so stale stats on a version with new files would
    silently drop them from pruned reads; dropping the manifest
    degrades to the full-scan fallback instead."""
    cur = current_data_dir(path)
    if cur is None:
        raise FileNotFoundError(f"no table at {path}: nothing to commit")
    _publish_linked_version(path, cur, manifest_extra)


def _link_parquet_tree(src: str, dst: str) -> None:
    """Hard-link every part-file (flat or hive-partitioned layout)
    from ``src`` into ``dst`` -- the zero-copy data share behind
    meta-only commits and restores."""
    for name in os.listdir(src):
        sp = os.path.join(src, name)
        if os.path.isdir(sp):
            dp = os.path.join(dst, name)
            os.makedirs(dp, exist_ok=True)
            _link_parquet_tree(sp, dp)
        elif name.endswith(".parquet") and not name.startswith("."):
            os.link(sp, os.path.join(dst, name))


def _publish_linked_version(
    path: str, src_dir: str, manifest_extra: dict[str, str],
    retain: int = 2,
) -> str:
    """Publish a new version whose data is hard links to ``src_dir``'s
    part-files, carrying ``src_dir``'s ``_`` metadata forward and
    overlaying ``manifest_extra``. Returns the new version name."""
    version_dir = os.path.join(path, f"v_{uuid.uuid4().hex}")
    try:
        os.mkdir(version_dir)
        _link_parquet_tree(src_dir, version_dir)
        for name in os.listdir(src_dir):
            if name.startswith("_") and os.path.isfile(
                os.path.join(src_dir, name)
            ):
                # COPIED, not linked: the overlay below must never
                # write through a shared inode into the old version
                shutil.copyfile(os.path.join(src_dir, name),
                                os.path.join(version_dir, name))
        _write_manifest_extra(version_dir, manifest_extra)
        _publish_version(path, version_dir, retain=retain)
        return os.path.basename(version_dir)
    except Exception:
        # no-orphan contract (see write_replace): links + copies only,
        # safe to drop on ANY publish failure
        shutil.rmtree(version_dir, ignore_errors=True)
        raise


def clone(src_path: str, dst_path: str, version: str | None = None) -> str:
    """SHALLOW CLONE: materialize a table (or one retained version of
    it) at a NEW path by hard-linking its part-files -- the Delta
    ``SHALLOW CLONE`` analogue for dev/test forks and snapshot
    hand-offs: zero bytes copied, the clone is immediately a
    first-class versioned table (its own ``_CURRENT``, its own
    publishes, its own retention), and writes to either table never
    affect the other (every publish creates NEW files; linked inodes
    are only ever deleted, never mutated, under the immutable-version
    contract). ``_`` metadata is carried from the source version (its
    stats describe exactly the linked files) plus a ``_cloned_from``
    provenance marker. Returns the clone's version name."""
    # same guard as restore(): only v_ version directories are
    # cloneable -- a staging dir or arbitrary subpath must never be
    # publishable as a table
    if version is not None and not version.startswith("v_"):
        raise FileNotFoundError(
            f"version {version!r} is not a retained version name"
        )
    src = (
        os.path.join(src_path, version)
        if version is not None
        else current_data_dir(src_path)
    )
    if src is None or not os.path.isdir(src):
        raise FileNotFoundError(
            f"nothing to clone at {src_path} (version={version!r})"
        )
    if os.path.exists(os.path.join(dst_path, _POINTER)):
        raise FileExistsError(f"table already exists at {dst_path}")
    os.makedirs(dst_path, exist_ok=True)
    return _publish_linked_version(
        dst_path, src,
        {"_cloned_from": f"{src_path}@{os.path.basename(src)}"},
    )


def restore(path: str, version: str) -> str:
    """RESTORE a retained superseded version as the new CURRENT table
    -- the table-format rollback (Delta ``RESTORE`` / Iceberg
    rollback): the bad publish stays in history (auditable), and the
    restore is itself a NEW version whose data is hard links to the
    restored version's part-files -- zero bytes copied, zero mutated,
    and the usual atomic pointer swap (readers see the pre-restore or
    post-restore table, never a mix). Returns the new version name.

    ``_`` metadata is carried forward from the RESTORED version (its
    stats describe exactly the linked files), then a ``_restored_from``
    marker records provenance. Restoring the current version is
    rejected -- there is nothing to roll back.

    Retention: a restore NEVER prunes -- every currently retained
    version (including the one being rolled back, the audit evidence)
    survives; later data publishes re-apply their own ``retain``
    windows, and ``vacuum`` reclaims on demand."""
    vdir = os.path.join(path, version)
    if not os.path.isdir(vdir) or not version.startswith("v_"):
        raise FileNotFoundError(
            f"version {version!r} not retained at {path}; "
            f"available: {[v['version'] for v in list_versions(path)]}"
        )
    cur = current_data_dir(path)
    if cur is not None and os.path.basename(cur) == version:
        raise ValueError(f"{version!r} is already current: nothing to restore")
    return _publish_linked_version(
        path, vdir, {"_restored_from": version},
        retain=len(_versions_newest_first(path)) + 1,
    )


def append_if_absent(
    spark: SparkSession,
    path: str,
    incoming: DataFrame,
    keys: Sequence[str],
    audit: bool = True,
    manifest_extra: dict[str, str] | None = None,
) -> int:
    """S6 as a stored-table write: ON CONFLICT (keys) DO NOTHING.

    Only rows whose key is absent from the stored table are committed,
    as NEW files -- existing data is never rewritten (the append-only
    fast path of ingest_facts.py:119-143). The fresh rows are staged to
    a side directory; the commit hard-links every current part-file
    (zero data copy, same filesystem) plus the staged new files into a
    new version directory and swaps the pointer, so the append is
    atomic too: overlapping readers see the table with or without the
    whole batch, never a partial batch. Returns the number of new
    part-files committed (0 => the batch was a pure duplicate, no new
    version is published, and the table is byte-identical -- the S6
    idempotence contract).

    Key comparison is NULL-SAFE -- a deliberate deviation from the
    reference's plain-UNIQUE Postgres constraint (db/schema.sql:39),
    under which NULLs compare distinct and a re-run of ingest_facts.py
    re-inserts every NULL-period_start stock fact forever. Delta/
    Iceberg MERGE key matching is null-safe for the same reason; the
    operator-level ``operators.upsert.insert_if_absent`` keeps plain
    equality for exact oracle parity with NOT EXISTS.
    """
    existing = read_table(spark, path)
    fresh = incoming.dropDuplicates(list(keys))
    if audit:
        fresh = with_audit_cols(fresh)
    if existing is None:
        write_replace(fresh, path, manifest_extra=manifest_extra)
        return 1
    # NULL-SAFE anti-join: a nullable key column (e.g. period_start on
    # stock facts) under plain equality NEVER matches its stored twin
    # (NULL = NULL is NULL), so every re-ingest would re-append those
    # rows forever -- breaking the idempotence contract above.
    # dropDuplicates is already null-safe (groupBy semantics); the
    # absence probe must be too.
    f = fresh.select(*existing.columns).alias("f")
    e = existing.select(*keys).alias("e")
    cond = None
    for k in keys:
        c = F.col(f"f.{k}").eqNullSafe(F.col(f"e.{k}"))
        cond = c if cond is None else (cond & c)
    fresh = f.join(e, cond, "left_anti")
    staging = f"{path}.__staging__{uuid.uuid4().hex}"
    fresh.write.mode("overwrite").parquet(staging)
    try:
        new_parts = [
            name
            for name in os.listdir(staging)
            if name.startswith("part-")
            and not name.endswith(".crc")
            and _parquet_num_rows(os.path.join(staging, name)) > 0
        ]
        if not new_parts:
            return 0  # pure duplicate: publish nothing
        cur = current_data_dir(path)
        version_dir = os.path.join(path, f"v_{uuid.uuid4().hex}")
        try:
            os.mkdir(version_dir)
            for name in os.listdir(cur):
                if name.endswith(".parquet") and not name.startswith("."):
                    os.link(os.path.join(cur, name),
                            os.path.join(version_dir, name))
            for name in new_parts:
                os.rename(
                    os.path.join(staging, name),
                    os.path.join(version_dir,
                                 f"append-{uuid.uuid4().hex}-{name}"),
                )
            _write_manifest_extra(version_dir, manifest_extra)
            _publish_version(path, version_dir)
        except Exception:
            # no-orphan contract (see write_replace): hard links +
            # staged copies only, safe to drop on ANY publish failure
            shutil.rmtree(version_dir, ignore_errors=True)
            raise
        return len(new_parts)
    finally:
        shutil.rmtree(staging, ignore_errors=True)


def _parquet_num_rows(part_path: str) -> int:
    """Row count from the parquet footer (driver-side metadata read)."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(part_path).metadata.num_rows


def table_bytes(path: str) -> int:
    """On-disk bytes of the CURRENT version of a stored table
    (driver-side directory walk; retained prior versions not counted)."""
    data_dir = current_data_dir(path)
    if data_dir is None:
        return 0
    total = 0
    for root, _dirs, files in os.walk(data_dir):
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
    df = read_table(spark, path)
    # no checkpoint needed: the scan is pinned to the current version
    # directory, which write_replace retains (as "previous") through and
    # beyond the pointer swap -- the staging write reads the old files,
    # and they outlive the publish.
    write_replace(df.repartition(n_files), path)
    return n_files


def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    keys: Sequence[str],
    buckets: int = 32,
) -> None:
    """Persist ``df`` hash-bucketed (and per-bucket sorted) on ``keys``
    so recurring joins and aggregations on those keys run with ZERO
    shuffle.

    Bucketing trades one layout-time shuffle for every future one: the
    writer hash-partitions rows into ``buckets`` files per partition
    and records the layout in the catalog; a later equi-join between
    two tables bucketed the same way (same keys, same count) is planned
    as a SortMergeJoin with NO Exchange on either side, and a
    ``groupBy`` on the bucket keys aggregates in place. At 100 TB this
    is the difference between re-shuffling the fact table on every
    nightly mart build and never shuffling it again — the same reason
    the reference keys its Postgres facts table on (cik, fy, tag)
    (db/schema.sql:30-38): the storage layout IS the join strategy.

    Equality filters on the first bucket key also prune at the FILE
    level (the scan reads only the one matching bucket —
    ``SelectedBucketsCount`` in the plan), independent of parquet
    row-group stats.

    Sizing: pick ``buckets`` so one bucket of the LARGEST co-bucketed
    table fits an executor core's working set (~128-512 MB compressed);
    all tables joined together must share the same count. The table is
    registered in the session catalog as ``name`` with files at
    ``path`` (query via ``spark.table(name)`` — a plain
    ``read.parquet`` sees the same rows but not the bucket metadata,
    so it plans shuffles again).
    """
    key_list = list(keys)
    (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(buckets, key_list[0], *key_list[1:])
        .sortBy(key_list[0], *key_list[1:])
        .saveAsTable(name)
    )


def table_changes(
    spark: SparkSession,
    path: str,
    keys: Sequence[str],
    version: str | None = None,
) -> DataFrame | None:
    """Change data feed: the row-level diff that turns a versioned
    table into an incremental source (Delta CDF semantics on the
    manifest sink). Compares the CURRENT version against a retained
    prior one (default: the immediately previous) and emits each
    changed row with a ``_change_type`` column:

    * ``insert``           -- key exists now, not before
    * ``update_postimage`` -- key in both, any data column changed
    * ``delete``           -- key existed before, gone now (the row is
      the OLD image -- there is no new one)

    Unchanged keys are not emitted, so a downstream consumer applies
    exactly the delta. Audit columns are excluded from the comparison
    (an upsert refreshes ``updated_at`` even for no-op merges).

    Returns None when no prior version is retained (nothing to diff).
    Plan shape: one full-outer join on the PK -- both sides shuffle
    once on the same key, or not at all when the table is stored
    bucketed on it; cost scales with table size, not history depth,
    and only the two compared snapshots are read."""
    versions = [v["version"] for v in list_versions(path)]
    if version is None:
        if len(versions) < 2:
            return None
        version = versions[1]
    cur = read_table(spark, path)
    prev = read_table(spark, path, version=version)
    key_list = list(keys)
    data_cols = [c for c in cur.columns
                 if c not in key_list and c not in _AUDIT_COLS]
    # presence markers, not key-NULL checks: a legitimately NULL key
    # column must not read as "absent" on either side
    c = cur.withColumn("__c_present", F.lit(True)).alias("c")
    p = prev.withColumn("__p_present", F.lit(True)).alias("p")
    cond = [c[k].eqNullSafe(p[k]) for k in key_list]
    joined = c.join(p, cond, "full_outer")
    c_struct = F.struct(*[c[x] for x in data_cols])
    p_struct = F.struct(*[p[x] for x in data_cols])
    in_cur = c["__c_present"].isNotNull()
    in_prev = p["__p_present"].isNotNull()
    change = (
        F.when(~in_prev, F.lit("insert"))
        .when(~in_cur, F.lit("delete"))
        .when(~c_struct.eqNullSafe(p_struct), F.lit("update_postimage"))
    )
    out_cols = [
        F.when(in_cur, c[k]).otherwise(p[k]).alias(k) for k in key_list
    ] + [
        F.when(in_cur, c[x]).otherwise(p[x]).alias(x) for x in data_cols
    ]
    return (
        joined.withColumn("_change_type", change)
        .filter(F.col("_change_type").isNotNull())
        .select(*out_cols, "_change_type")
    )


def _zorder_guard(n_cols: int, bits: int) -> None:
    if bits * n_cols > 63:
        raise ValueError(
            f"bits*len(cols) = {bits * n_cols} exceeds the 63 usable "
            "bits of a long; lower bits (e.g. 63 // len(cols))"
        )


def _interleave(q, bits: int, n_cols: int, col_idx: int):
    """Place bit b of the quantized rank ``q`` at position
    ``b * n_cols + col_idx`` (the Morton interleave)."""
    spread = F.lit(0).cast("long")
    for b in range(bits):
        spread = spread.bitwiseOR(
            F.shiftleft(
                F.shiftright(q, b).bitwiseAND(F.lit(1)),
                b * n_cols,
            )
        )
    return F.shiftleft(spread, col_idx)


def zorder_value(cols: Sequence[str], bits: int = 16):
    """Z-order (Morton) clustering key over ``cols``: each column is
    rank-normalized to ``bits`` bits via a percent_rank window, then the
    bit planes are interleaved — rows close in the z-curve are close in
    EVERY listed dimension at once. Pure built-in expressions (bit ops
    + a per-column window), returns a Column to sort by.

    Why rank-normalize: raw values skew the curve (a heavy-hitter key
    collapses whole z-ranges); ranks give uniform occupancy, the same
    choice Delta's OPTIMIZE ZORDER makes. The unpartitioned rank window
    is the dimension/mart-table form; :func:`zorder_value_binned` is
    the big-table substitute.
    """
    from pyspark.sql import Window as W

    _zorder_guard(len(cols), bits)
    z = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        rank = F.percent_rank().over(W.orderBy(F.col(c)))
        q = F.least(
            F.floor(rank * (1 << bits)).cast("long"), F.lit((1 << bits) - 1)
        )
        z = z.bitwiseOR(_interleave(q, bits, len(cols), i))
    return z


def zorder_value_binned(df: DataFrame, cols: Sequence[str], bits: int = 8):
    """The 100 TB z-order key: rank bins come from ONE driver-side
    ``approxQuantile`` pass per column (Greenwald-Khanna sketch --
    distributed, single scan, no shuffle) instead of a global
    percent_rank window, so no stage ever funnels the table through one
    partition. The edges become a broadcast literal array and each
    row's bin is computed map-side (count of edges <= value, a
    vectorized JVM ``aggregate`` over <= 2^bits elements).

    ``bits`` defaults to 8 (256 bins/column): row groups hold millions
    of rows at scale, so 256 distinct strides per dimension already
    saturate what min/max skipping can use; 2^16 bins would only bloat
    the literal edge arrays. Approximation error moves rows near bin
    BOUNDARIES only -- clustering quality degrades smoothly, never
    correctness (the key is just a sort key)."""
    _zorder_guard(len(cols), bits)
    probs = [j / (1 << bits) for j in range(1, 1 << bits)]
    rel_err = 1.0 / (1 << (bits + 2))
    z = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        edges = sorted(set(df.stat.approxQuantile(c, probs, rel_err)))
        arr = F.array(*[F.lit(float(e)) for e in edges])
        q = F.aggregate(
            arr,
            F.lit(0).cast("long"),
            lambda acc, e: acc + F.when(
                F.col(c).cast("double") >= e, F.lit(1)
            ).otherwise(F.lit(0)).cast("long"),
        )
        z = z.bitwiseOR(_interleave(q, bits, len(cols), i))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_files: int | None = None,
    bits: int | None = None,
    method: str = "quantile",
) -> None:
    """Publish ``df`` clustered along the z-curve of ``cols`` so parquet
    row-group min/max stats are TIGHT in every listed column — filters
    on ANY of them skip most row groups at scan time (multi-column data
    skipping, the OPTIMIZE ZORDER of Delta/Iceberg on plain parquet +
    the manifest sink). A single-column sort gives perfect skipping on
    one column and none on the rest; the z-curve trades a little of the
    first column's tightness for skipping on all of them.

    The layout pass is one range exchange on the z-value; with
    ``n_files`` unset the session's shuffle parallelism decides the
    file count.

    ``method``: "quantile" (the DEFAULT — :func:`zorder_value_binned`:
    one approxQuantile sketch pass per column, map-side binning, NO
    window anywhere in the plan — the 100 TB fact-table path; ``bits``
    capped at 8) or "rank" (exact percent_rank windows — these are
    UNPARTITIONED, funneling the whole table through one task, so the
    rank path is opt-in and only for small dimension/mart tables where
    exact rank bins matter more than parallelism).
    """
    # bits defaults per method (quantile's sketch caps at 8); an
    # EXPLICIT bits>8 with quantile is an error, not a silent downgrade
    if bits is None:
        bits = 8 if method == "quantile" else 16
    elif method == "quantile" and bits > 8:
        raise ValueError(
            f"write_zordered: bits={bits} exceeds the quantile method's "
            "8-bit sketch resolution; pass method='rank' for exact "
            "high-resolution z-values (small tables only) or bits<=8"
        )
    zcol = (
        zorder_value_binned(df, list(cols), bits=bits)
        if method == "quantile"
        else zorder_value(list(cols), bits=bits)
    )
    clustered = df.withColumn("__z", zcol)
    parts = n_files or clustered.sparkSession.conf.get(
        "spark.sql.shuffle.partitions"
    )
    clustered = (
        clustered.repartitionByRange(int(parts), F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    # record per-file min/max for the clustered columns so
    # read_table_pruned skips whole files on any of them
    write_replace(clustered, path, stats_cols=list(cols))


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


def merge(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    on: Sequence[str],
    when_matched_update: bool = True,
    when_matched_delete: str | None = None,
    when_not_matched_insert: bool = True,
    audit: bool = True,
) -> dict[str, int]:
    """General MERGE INTO over the versioned sink — the superset of
    ``upsert`` (update+insert) and ``append_if_absent`` (insert only),
    plus conditional delete, mirroring the three WHEN clauses of
    SQL/Delta MERGE and the reference's ``ON CONFLICT`` family:

    * matched + ``when_matched_delete`` condition true -> row removed
      (the condition is a SQL boolean over SOURCE columns, e.g. a
      tombstone flag ``"is_deleted"``);
    * matched otherwise -> updated from source when
      ``when_matched_update`` (created_at carried, updated_at
      refreshed), else kept as stored;
    * unmatched source row -> inserted when ``when_not_matched_insert``
      (tombstones for absent keys are ignored, not inserted).

    Returns counts {"updated": u, "inserted": i, "deleted": d}.

    Plan shape: ONE full-outer join on the merge keys classifies every
    row; both sides shuffle once on the same key (or not at all over a
    bucketed store). The rewrite publishes through the manifest commit
    — MERGE is atomic, and a crash mid-merge leaves the old version
    current. Source must be unique on ``on`` (enforced — a source
    with duplicate keys makes MERGE ambiguous, the same error SQL
    MERGE raises)."""
    key_list = list(on)
    existing = read_table(spark, path)
    dup = (
        source.groupBy(*key_list).count().filter(F.col("count") > 1).count()
    )
    if dup:
        raise ValueError(
            f"MERGE source has {dup} duplicate key groups on {key_list}"
        )
    # NULL condition result = not deleted (SQL three-valued logic must
    # not leak a source row into the skip branch)
    del_cond = (
        F.coalesce(F.expr(when_matched_delete).cast("boolean"), F.lit(False))
        if when_matched_delete is not None
        else F.lit(False)
    )
    if existing is None:
        inserts = source.filter(~del_cond) if when_matched_delete else source
        out = with_audit_cols(inserts) if audit else inserts
        write_replace(out, path)
        n = inserts.count()
        return {"updated": 0, "inserted": n, "deleted": 0}

    data_cols = [c for c in existing.columns if c not in _AUDIT_COLS]
    src_cols = [c for c in data_cols if c in source.columns]
    s = source.withColumn("__s_present", F.lit(True)).alias("s")
    t2 = existing.withColumn("__t_present", F.lit(True)).alias("t")
    joined = t2.join(s, key_list, "full_outer")
    in_src = s["__s_present"].isNotNull()
    in_tgt = t2["__t_present"].isNotNull()

    action = (
        F.when(in_tgt & in_src & del_cond, F.lit("delete"))
        .when(in_tgt & in_src,
              F.lit("update") if when_matched_update else F.lit("keep"))
        .when(~in_tgt & in_src & ~del_cond,
              F.lit("insert") if when_not_matched_insert else F.lit("skip"))
        .when(~in_tgt & in_src, F.lit("skip"))   # tombstone for absent key
        .otherwise(F.lit("keep"))                 # target-only row
    )
    take_src = F.col("__action").isin("update", "insert")
    merged = joined.withColumn("__action", action).filter(
        ~F.col("__action").isin("delete", "skip")
    )
    now = F.current_timestamp()
    out_cols = [F.coalesce(t2[k], s[k]).alias(k) for k in key_list]
    for c in data_cols:
        if c in key_list:
            continue
        if c in src_cols:
            out_cols.append(
                F.when(take_src, s[c]).otherwise(t2[c]).alias(c)
            )
        else:
            out_cols.append(t2[c].alias(c))
    if audit:
        out_cols.append(
            F.coalesce(t2[CREATED_AT], now).alias(CREATED_AT)
        )
        out_cols.append(
            F.when(take_src, now).otherwise(t2[UPDATED_AT]).alias(UPDATED_AT)
        )
    counts = {
        r["__action"]: r["n"]
        for r in joined.withColumn("__action", action)
        .groupBy("__action").agg(F.count("*").alias("n")).collect()
    }
    write_replace(merged.select(*out_cols), path)
    return {
        "updated": int(counts.get("update", 0)),
        "inserted": int(counts.get("insert", 0)),
        "deleted": int(counts.get("delete", 0)),
    }


STATS_META = "_FILE_STATS"
# pruned reads trust the stats manifest to list EVERY live file, so a
# data-changing publish must never copy it forward (see _NO_CARRY_META)
assert STATS_META in _NO_CARRY_META


def _stat_encode(v):
    """JSON-safe, TYPED encoding of a parquet footer min/max value.
    Plain ``json.dumps(default=str)`` would stringify dates/timestamps/
    decimals, and :func:`read_table_pruned` would then compare a str
    against the caller's date bound — a TypeError at best, silent
    mis-pruning at worst. Values whose type has no faithful encoding
    (e.g. raw bytes) return ``None`` → the column's stats entry is
    dropped for that file and the file is never pruned on it."""
    import datetime
    import decimal

    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float, str)):
        return v
    if isinstance(v, datetime.datetime):
        return {"__t": "ts", "v": v.isoformat()}
    if isinstance(v, datetime.date):
        return {"__t": "date", "v": v.isoformat()}
    if isinstance(v, decimal.Decimal):
        return {"__t": "dec", "v": str(v)}
    return None


def _stat_decode(v):
    """Inverse of :func:`_stat_encode`: typed dicts come back as native
    date/datetime/Decimal so lo/hi comparisons run on real values."""
    if isinstance(v, dict) and "__t" in v:
        import datetime
        import decimal

        t, s = v["__t"], v["v"]
        if t == "ts":
            return datetime.datetime.fromisoformat(s)
        if t == "date":
            return datetime.date.fromisoformat(s)
        if t == "dec":
            return decimal.Decimal(s)
    return v


def _collect_file_stats(
    staged_dir: str, cols: Sequence[str]
) -> dict[str, dict[str, list]]:
    """Per-file [min, max] for ``cols`` from the parquet footers — a
    driver-side metadata walk (no data read, no job), the same stats a
    Delta/Iceberg commit records per file. Only numeric/str min-max
    make pruning sense; files lacking stats for a column simply have no
    entry (and are never pruned on it)."""
    import pyarrow.parquet as pq

    out: dict[str, dict[str, list]] = {}
    for name in sorted(os.listdir(staged_dir)):
        if not name.endswith(".parquet") or name.startswith("."):
            continue
        meta = pq.ParquetFile(os.path.join(staged_dir, name)).metadata
        idx = {meta.schema.column(i).name: i
               for i in range(meta.num_columns)}
        stats: dict[str, list] = {}
        for c in cols:
            if c not in idx:
                continue
            mins, maxs = [], []
            for rg in range(meta.num_row_groups):
                st = meta.row_group(rg).column(idx[c]).statistics
                if st is None or st.min is None or st.max is None:
                    mins = []
                    break
                mins.append(st.min)
                maxs.append(st.max)
            if mins:
                lo, hi = _stat_encode(min(mins)), _stat_encode(max(maxs))
                if lo is not None and hi is not None:
                    stats[c] = [lo, hi]
        out[name] = stats
    return out


def read_table_pruned(
    spark: SparkSession, path: str, col: str, lo=None, hi=None
) -> DataFrame | None:
    """File-level data skipping from the stats manifest: read ONLY the
    files whose [min, max] for ``col`` intersects [lo, hi], then
    re-apply the predicate exactly. At 100 TB this is the listing-level
    skip Delta performs from its per-file stats — whole files never
    enter the scan, before parquet row-group pruning even starts.
    Combine with :func:`write_zordered` (stats tight in EVERY clustered
    column) for multi-dimension skipping.

    Falls back to the full table (predicate still applied) when the
    current version was published without stats for ``col``."""
    import json

    data_dir = current_data_dir(path)
    if data_dir is None:
        return None
    pred = F.lit(True)
    if lo is not None:
        pred = pred & (F.col(col) >= F.lit(lo))
    if hi is not None:
        pred = pred & (F.col(col) <= F.lit(hi))
    raw = read_version_meta(path, STATS_META)
    if raw is None:
        return spark.read.parquet(data_dir).filter(pred)
    stats = json.loads(raw)
    keep = []
    for name, file_stats in stats.items():
        rng = file_stats.get(col)
        if rng is None:
            keep.append(name)  # no stats: cannot prune, must read
            continue
        fmin, fmax = _stat_decode(rng[0]), _stat_decode(rng[1])
        try:
            if (hi is not None and fmin > hi) or \
                    (lo is not None and fmax < lo):
                continue
        except TypeError:
            # stats/bounds type mismatch (e.g. a legacy default=str
            # manifest vs a date bound): pruning is an OPTIMIZATION,
            # so an incomparable pair must read the file, never skip it
            keep.append(name)
            continue
        keep.append(name)
    if not keep:
        # empty selection: preserve schema via a zero-file-safe read
        return spark.read.parquet(data_dir).filter(F.lit(False))
    return spark.read.parquet(
        *[os.path.join(data_dir, n) for n in keep]
    ).filter(pred)
