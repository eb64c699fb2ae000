"""Streaming vector-index ingest: new embeddings appended to a stored
IVF index per micro-batch via ``foreachBatch``.

Third exactly-once mechanism in the streaming pack, completing the
trio: the KMV/HLL sketches are safe under at-least-once delivery BY
ALGEBRA (semilattice merge), the histogram/Count-Min counters need the
LOAD-BEARING atomic watermark (non-idempotent monoid), and this ingest
is safe BY IDEMPOTENCE -- :func:`..plans.embedding_queries.
append_ivf_index` anti-joins the batch against the touched cells'
stored ids, so a replayed batch appends zero vectors and no watermark
bookkeeping is needed at all. (The guard is partition-pruned: replay
cost is batch-sized, never index-sized.)

Scale shape per batch: assignment is the one-row-broadcast centroid
projection (no corpus shuffle), the append adds files under only the
touched ``cell=`` directories, and concurrent probes keep reading the
already-present files -- parquet appends are new-file-only, so a
reader never observes a half-written vector.

Crash window caveat, inherited from plain-parquet appends: a crash
DURING the append can leave a torn batch (some cells appended, others
not). The anti-join heals it on replay -- already-landed vectors are
skipped, missing ones land -- so convergence holds without a manifest;
what plain parquet cannot give is snapshot isolation ACROSS cells
mid-recovery. An index needing that upgrade path writes through the
versioned sink instead (sinks.upsert_partitioned on cell).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.embedding_queries import append_ivf_index


def foreach_batch_ivf_append(
    index_dir: str,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch sink appending each micro-batch of
    ``(vec_id | neighbor_id, embedding | emb)`` rows to the stored IVF
    index at ``index_dir``. Exactly-once by idempotence (module
    docstring); batches may arrive in any order and replay freely."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        cols = set(batch_df.columns)
        df = batch_df
        if "neighbor_id" not in cols:
            df = df.withColumnRenamed("vec_id", "neighbor_id")
        if "emb" not in cols:
            df = df.withColumn(
                "emb", F.col("embedding").cast("array<double>")
            )
        append_ivf_index(
            df.sparkSession, index_dir, df.select("neighbor_id", "emb")
        )

    return _sink
