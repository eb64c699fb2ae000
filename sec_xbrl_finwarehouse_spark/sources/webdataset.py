"""WebDataset (.tar shard) ingestion AND export — the de-facto
container format for large-scale multimodal training data (LAION,
img2dataset output, torchdata/webdataset loaders): samples are groups
of tar members sharing a basename key (``000123.jpg`` + ``000123.txt``
+ ``000123.json``), sharded into many ~1 GB tars. The writer half
(:func:`write_webdataset_shards`) emits deterministic, key-co-located,
atomically-renamed shards that round-trip through the reader.

Spark mapping:

* one tar shard = one task — shards are the parallelism unit, exactly
  as WebDataset intends (sequential reads within a shard, shards
  distributed across workers). For local/mounted paths the listing
  comes from the ``binaryFile`` source with ONLY the ``path`` column
  projected, so shard bytes are never materialized as DataFrame
  cells; remote schemes (hdfs://, s3a://, ...) fall back to a
  content-column read through the Hadoop FS API
  (:func:`_members_from_content`, whole-shard task memory);
* member extraction STREAMS: the Arrow ``mapInPandas`` kernel opens
  each shard with the stdlib ``tarfile`` in sequential-read mode and
  emits member batches incrementally (bounded by
  :data:`MEMBER_BATCH_BYTES` / :data:`MEMBER_BATCH_ROWS`), so peak
  task memory is one batch plus one member — never a whole shard —
  and downstream operators start consuming before the shard finishes;
* the LONG member frame (shard, key, ext, payload) regroups into one
  row per SAMPLE with ``ext -> payload`` map via
  ``map_from_entries(collect_list(...))`` — a single shuffle keyed by
  (shard, key); downstream media kernels (functions/multimodal.py)
  consume the payloads directly.

Scale notes: on the streaming (local/mounted) path shard size bounds
only the per-task WORK, not memory; on the remote fallback it bounds
task memory too — keep shards at the WebDataset-conventional ~1 GB.
``spark.sql.files.maxPartitionBytes`` does not split binary files, so
one shard stays one task either way. For 100 TB corpora the shard
listing itself is parquet-manifest-able; globs work unchanged.
"""

from __future__ import annotations

import posixpath
import tarfile
from collections.abc import Iterator
from urllib.parse import unquote, urlparse

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEMBER_SCHEMA = (
    "shard string, key string, ext string, payload binary, n_bytes long"
)

# streaming-emission bounds: a batch closes when it holds this many
# payload bytes or rows, whichever first — peak kernel memory is one
# batch, not one shard
MEMBER_BATCH_BYTES = 64 << 20
MEMBER_BATCH_ROWS = 4096


def _local_path(shard_uri: str) -> str:
    """Filesystem path for a ``binaryFile`` row's ``path`` URI. Local
    and DFS-mounted paths resolve; a remote scheme without a mounted
    filesystem is an explicit error, not a garbage read (remote
    schemes take the content-column fallback in
    :func:`read_webdataset_members` instead)."""
    parsed = urlparse(shard_uri)
    if parsed.scheme in ("", "file"):
        return unquote(parsed.path) or shard_uri
    raise NotImplementedError(
        f"webdataset shard {shard_uri!r}: scheme {parsed.scheme!r} needs "
        "a mounted filesystem on the executors (fuse/DFS mount); bare "
        "object-store URIs are not streamed by this kernel"
    )


def _members_from_content(
    spark: SparkSession, path: str, batch_bytes: int, batch_rows: int
) -> DataFrame:
    """Hadoop-filesystem fallback for remote schemes (hdfs://, s3a://,
    ...): the ``binaryFile`` source reads each shard's CONTENT through
    the Hadoop FS API (one shard per row/task -- shard size bounds task
    memory here, so keep shards at the conventional ~1 GB), and the
    kernel parses the in-memory buffer. Local paths take the streaming
    kernel instead, which never holds a whole shard."""
    import io
    import tarfile as _tarfile

    shards = spark.read.format("binaryFile").load(path).select(
        F.col("path").alias("shard"), "content"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["shard", "key", "ext", "payload", "n_bytes"]
        rows: list[tuple] = []
        held = 0
        for pdf in batches:
            for shard, content in zip(pdf["shard"], pdf["content"]):
                with _tarfile.open(fileobj=io.BytesIO(content)) as tf:
                    for m in tf:
                        if not m.isreg():
                            continue
                        key, ext = _member_key(m.name)
                        payload = tf.extractfile(m).read()
                        rows.append((shard, key, ext, payload, len(payload)))
                        held += len(payload)
                        if held >= batch_bytes or len(rows) >= batch_rows:
                            yield pd.DataFrame(rows, columns=cols)
                            rows, held = [], 0
        if rows:
            yield pd.DataFrame(rows, columns=cols)

    return shards.mapInPandas(kernel, MEMBER_SCHEMA)


def _member_key(name: str) -> tuple[str, str]:
    """(sample key, ext) for a tar member name. WebDataset's grouping
    rule splits the BASENAME at its first dot — the directory prefix is
    part of the key, and dots in directory names are data, not
    separators: ``a/b/000123.seg.png`` -> (``a/b/000123``, ``seg.png``)
    and ``shard.v2/000123.jpg`` -> (``shard.v2/000123``, ``jpg``)."""
    dirname, basename = posixpath.split(name)
    stem, dot, ext = basename.partition(".")
    key = posixpath.join(dirname, stem) if dirname else stem
    return key, ext if dot else ""


def read_webdataset_members(
    spark: SparkSession,
    path: str | list[str],
    batch_bytes: int = MEMBER_BATCH_BYTES,
    batch_rows: int = MEMBER_BATCH_ROWS,
) -> DataFrame:
    """Long frame of tar members: one row per (shard, sample key,
    extension). ``key`` is the member path with the basename truncated
    at its FIRST dot (see :func:`_member_key`). Directory entries and
    non-regular members are skipped. ``batch_bytes``/``batch_rows``
    bound each emitted Arrow batch (and therefore peak kernel memory).
    ``path`` is a glob or an explicit list of shard paths (the
    incremental ingest's only-new-shards read). Remote schemes
    (hdfs://, s3a://, ...) read shard content through the Hadoop FS
    API (:func:`_members_from_content`); local/mounted paths stream
    and never hold a whole shard."""
    if isinstance(path, list) and not path:
        raise ValueError(
            "read_webdataset_members: empty shard list -- callers "
            "diffing their own shard sets should skip the read entirely"
        )
    probe = path[0] if isinstance(path, list) else path
    if urlparse(probe).scheme not in ("", "file"):
        return _members_from_content(spark, path, batch_bytes, batch_rows)
    shards = spark.read.format("binaryFile").load(path).select(
        F.col("path").alias("shard")
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["shard", "key", "ext", "payload", "n_bytes"]
        rows: list[tuple] = []
        held = 0
        for pdf in batches:
            for shard in pdf["shard"]:
                # mode "r|*": strictly sequential, no member index held,
                # each member's bytes read once as the tape advances
                with tarfile.open(_local_path(shard), mode="r|*") as tf:
                    for m in tf:
                        if not m.isreg():
                            continue
                        key, ext = _member_key(m.name)
                        payload = tf.extractfile(m).read()
                        rows.append((shard, key, ext, payload, len(payload)))
                        held += len(payload)
                        if held >= batch_bytes or len(rows) >= batch_rows:
                            yield pd.DataFrame(rows, columns=cols)
                            rows, held = [], 0
        if rows:
            yield pd.DataFrame(rows, columns=cols)

    return shards.mapInPandas(kernel, MEMBER_SCHEMA)


MANIFEST_SCHEMA = (
    "shard string, path string, n_samples long, n_members long, n_bytes long"
)


def write_webdataset_shards(
    members: DataFrame,
    out_dir: str,
    n_shards: int = 64,
    prefix: str = "shard",
) -> DataFrame:
    """Export a member frame ``(key string, ext string, payload
    binary)`` as WebDataset tar shards — the writer half of this
    module's reader contract: ``read_webdataset_samples(out_dir)``
    round-trips the samples bit-for-bit.

    Determinism (content-stable across runs, engines, and cluster
    layouts, like every sink in this package):

    * shard assignment hashes the sample KEY (``pmod(xxhash64(key),
      n_shards)``) — all of a sample's members land in ONE shard, the
      invariant WebDataset loaders and this module's reader group by;
    * member order inside a shard is (key, ext, payload) — sorted
      within the shard's partition, the payload tiebreak making even
      malformed inputs with duplicate (key, ext) rows reproduce
      byte-identically (such duplicates still violate WebDataset's
      one-ext-per-sample convention and will collide in the reader's
      ``parts`` map — the writer keeps the bytes deterministic, it
      cannot make the sample well-formed);
    * tar metadata is pinned (mtime 0, uid/gid 0, blank names, mode
      0o644): the output bytes are a pure function of the input rows.

    Key validation: the reader (and every WebDataset loader) splits a
    member's BASENAME at its first dot, so a key whose basename
    contains a dot cannot round-trip — ``img.v2`` + ext ``jpg`` would
    read back as key ``img``, ext ``v2.jpg``, and two such keys can
    hash to different shards yet reparse to the SAME sample, breaking
    co-location. The kernel rejects dotted key basenames with a
    ValueError naming the key (dots in DIRECTORY components are fine;
    the reader treats those as data).

    Overwrite semantics: existing ``{prefix}-*.tar`` files and stale
    temp files in ``out_dir`` are removed up front (driver-side), so a
    re-run with fewer shards cannot leave phantom shards that a
    ``*.tar`` glob would silently merge with the new output. Within a
    run, shard tars are written to a temp name and atomically renamed,
    so concurrent readers never observe a partial shard.

    Scale shape: one exchange (repartition on the shard index), then
    each task streams its shards member-by-member through the stdlib
    tarfile onto disk — task memory is one payload, never a shard.
    ``n_shards`` sizes shards the usual way (total bytes / ~1 GB).
    ``out_dir`` must be a path every executor can write (local or DFS
    mount — the same restriction :func:`_local_path` documents for
    reading).

    Returns the manifest as a small DataFrame ``(shard, path,
    n_samples, n_members, n_bytes)`` — one row per written shard
    (n_bytes sums payloads, matching the reader's accounting)."""
    import glob
    import os

    # pre-clean: drop this prefix's previous shards + orphaned temps so
    # a smaller re-run cannot leave stale tars behind a *.tar glob
    if os.path.isdir(out_dir):
        for stale in glob.glob(os.path.join(out_dir, f"{prefix}-*.tar")):
            os.remove(stale)
        for tmp in glob.glob(os.path.join(out_dir, f".{prefix}-*.tmp")):
            os.remove(tmp)

    assigned = (
        members.select("key", "ext", "payload")
        .withColumn(
            "shard_idx",
            F.pmod(F.xxhash64(F.col("key")), F.lit(n_shards)).cast("int"),
        )
        .repartition(n_shards, "shard_idx")
        .sortWithinPartitions("shard_idx", "key", "ext", "payload")
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import uuid as _uuid

        os.makedirs(out_dir, exist_ok=True)
        state: dict = {"idx": None}

        def close_current():
            if state["idx"] is None:
                return None
            state["tf"].close()
            final = os.path.join(out_dir, f"{prefix}-{state['idx']:05d}.tar")
            os.rename(state["tmp"], final)
            row = (
                f"{prefix}-{state['idx']:05d}.tar", final,
                len(state["keys"]), state["n_members"], state["n_bytes"],
            )
            state["idx"] = None
            return row

        def open_shard(idx: int):
            state["idx"] = idx
            state["tmp"] = os.path.join(
                out_dir, f".{prefix}-{idx:05d}.{_uuid.uuid4().hex}.tmp"
            )
            # mode "w": plain sequential write, no member index in memory
            state["tf"] = tarfile.open(state["tmp"], mode="w")
            state["keys"] = set()
            state["n_members"] = 0
            state["n_bytes"] = 0

        manifest: list[tuple] = []
        for pdf in batches:
            for key, ext, payload, idx in zip(
                pdf["key"], pdf["ext"], pdf["payload"], pdf["shard_idx"]
            ):
                if "." in posixpath.basename(str(key)):
                    raise ValueError(
                        f"webdataset key {key!r}: basename contains a dot "
                        "-- the reader splits basenames at the first dot, "
                        "so this key cannot round-trip (move the dot into "
                        "a directory component or the ext)"
                    )
                if state["idx"] != idx:
                    done = close_current()
                    if done:
                        manifest.append(done)
                    open_shard(int(idx))
                name = f"{key}.{ext}" if ext else str(key)
                info = tarfile.TarInfo(name=name)
                payload = bytes(payload)
                info.size = len(payload)
                info.mtime = 0
                info.uid = info.gid = 0
                info.uname = info.gname = ""
                info.mode = 0o644
                state["tf"].addfile(info, io.BytesIO(payload))
                state["keys"].add(key)
                state["n_members"] += 1
                state["n_bytes"] += len(payload)
        done = close_current()
        if done:
            manifest.append(done)
        yield pd.DataFrame(
            manifest,
            columns=["shard", "path", "n_samples", "n_members", "n_bytes"],
        )

    return assigned.mapInPandas(kernel, MANIFEST_SCHEMA)


def write_webdataset(
    samples: DataFrame,
    out_dir: str,
    n_shards: int = 64,
    prefix: str = "shard",
) -> DataFrame:
    """Sample-level writer: takes the ``(key, parts: map<ext, binary>)``
    shape :func:`read_webdataset_samples` produces (or any pipeline
    producing samples as ext->payload maps), explodes it map-side into
    the long member frame, and delegates to
    :func:`write_webdataset_shards`."""
    members = samples.select(
        "key", F.explode("parts").alias("ext", "payload")
    )
    return write_webdataset_shards(
        members, out_dir, n_shards=n_shards, prefix=prefix
    )


def read_webdataset_samples(
    spark: SparkSession, path: str | list[str]
) -> DataFrame:
    """One row per SAMPLE: ``(shard, key, parts: map<ext, binary>,
    n_parts, n_bytes)``. The regroup is one shuffle on (shard, key) —
    member rows of one sample always co-locate; at scale the shuffle
    moves each sample's payload bytes exactly once."""
    members = read_webdataset_members(spark, path)
    return (
        members.groupBy("shard", "key")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("ext", "payload"))
            ).alias("parts"),
            F.count("*").cast("int").alias("n_parts"),
            F.sum("n_bytes").alias("n_bytes"),
        )
    )
