"""WebDataset (.tar shard) ingestion — the de-facto container format
for large-scale multimodal training data (LAION, img2dataset output,
torchdata/webdataset loaders): samples are groups of tar members
sharing a basename key (``000123.jpg`` + ``000123.txt`` +
``000123.json``), sharded into many ~1 GB tars.

Spark mapping:

* one tar shard = one ``binaryFile`` row = one task — shards are the
  parallelism unit, exactly as WebDataset intends (sequential reads
  within a shard, shards distributed across workers);
* member extraction runs in an Arrow ``mapInPandas`` kernel with the
  stdlib ``tarfile`` over an in-memory buffer — no Python per-row
  loop outside the kernel, no temp files;
* the LONG member frame (shard, key, ext, payload) regroups into one
  row per SAMPLE with ``ext -> payload`` map via
  ``map_from_entries(collect_list(...))`` — a single shuffle keyed by
  (shard, key); downstream media kernels (functions/multimodal.py)
  consume the payloads directly.

Scale notes: ``binaryFile`` holds a whole shard in one task's memory —
keep shards at the WebDataset-conventional ~1 GB and size executor
memory accordingly; ``spark.sql.files.maxPartitionBytes`` does NOT
split binary files, so shard size IS task size. For 100 TB corpora the
shard listing itself is parquet-manifest-able; globs work unchanged.
"""

from __future__ import annotations

import io
import tarfile
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEMBER_SCHEMA = (
    "shard string, key string, ext string, payload binary, n_bytes long"
)


def read_webdataset_members(spark: SparkSession, path: str) -> DataFrame:
    """Long frame of tar members: one row per (shard, sample key,
    extension). ``key`` is the member basename up to the FIRST dot —
    WebDataset's grouping rule (so ``a/b/000123.seg.png`` groups under
    ``a/b/000123`` with ext ``seg.png``). Directory entries and
    non-regular members are skipped."""
    shards = spark.read.format("binaryFile").load(path).select(
        F.col("path").alias("shard"), "content"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for shard, content in zip(pdf["shard"], pdf["content"]):
                with tarfile.open(fileobj=io.BytesIO(content)) as tf:
                    for m in tf:
                        if not m.isreg():
                            continue
                        name = m.name
                        base, dot, ext = name.partition(".")
                        payload = tf.extractfile(m).read()
                        rows.append((
                            shard, base, ext if dot else "",
                            payload, len(payload),
                        ))
            yield pd.DataFrame(
                rows,
                columns=["shard", "key", "ext", "payload", "n_bytes"],
            )

    return shards.mapInPandas(kernel, MEMBER_SCHEMA)


def read_webdataset_samples(spark: SparkSession, path: str) -> DataFrame:
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
