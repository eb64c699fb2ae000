"""Upsert / insert-if-absent on an append-only engine (SURVEY.md §2.1 S5/S6).

Spark has no in-place ``ON CONFLICT``; these operators produce the
post-merge dataset, which callers persist via write-then-swap (see
``sinks``). Both are single-shuffle on the key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SRC = "__src"
_ROWNUM = "__rn"


def upsert_latest_wins(
    existing: DataFrame,
    incoming: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """``INSERT ... ON CONFLICT (pk) DO UPDATE SET ...`` semantics:
    incoming overwrites existing on key collision; non-colliding rows of
    both survive (seed_companies.py:52-61; build_statements_annual_v3.py:156-176).

    Implemented as union + row_number preferring the incoming side --
    one shuffle on the PK, no driver round-trips, works at any scale.
    Assumes ``incoming`` itself is unique per key (true for the reference,
    whose upsert batches are keyed dicts); if not, pre-dedup incoming.
    """
    lhs = existing.select(*incoming.columns).withColumn(_SRC, F.lit(1))
    rhs = incoming.withColumn(_SRC, F.lit(0))
    w = Window.partitionBy(*keys).orderBy(F.col(_SRC).asc())
    return (
        lhs.unionByName(rhs)
        .withColumn(_ROWNUM, F.row_number().over(w))
        .filter(F.col(_ROWNUM) == 1)
        .drop(_ROWNUM, _SRC)
    )


def insert_if_absent(
    existing: DataFrame,
    incoming: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """``INSERT ... ON CONFLICT DO NOTHING`` semantics
    (ingest_facts.py:119-128 filings, :132-143 facts).

    Returns ``existing`` plus the incoming rows whose key is absent --
    a left-anti join (skipped entirely by Catalyst when `existing` is
    empty; broadcastable when one side is small). Incoming rows are also
    deduped among themselves on the key, matching batch ``executemany``
    + unique-constraint behavior.
    """
    fresh = (
        incoming.dropDuplicates(list(keys))
        .join(existing.select(*[F.col(k) for k in keys]), list(keys), "left_anti")
    )
    return existing.unionByName(fresh.select(*existing.columns))
