"""Skew mitigation: salted join for hot keys.

A shuffle join hashes both sides on the join key, so one hot key (a
power-law user, a default/sentinel value, a celebrity entity) lands its
ENTIRE row set in one reducer task -- the straggler that makes a
1000-executor stage run at the speed of one. Spark's AQE skew-join
handles this when statistics catch it (splitting oversized partitions
at runtime); this operator is the explicit form for when you know the
skew up front, need deterministic plan shape, or join in a context AQE
does not cover.

Protocol (the standard salting idiom):

* the LARGE (skewed) side gets a uniform ``salt`` in [0, n) per row --
  hot-key rows spread across n reducer tasks instead of one;
* the SMALL side is REPLICATED n times (explode of the salt range), so
  every (key, salt) bucket still finds its match;
* the join keys become (key..., salt); results are identical to the
  unsalted join (each left row matches exactly its key's right rows,
  found in its salt bucket).

Cost: the small side shuffles n times its size -- choose n just large
enough to break the straggler (8-32 is typical). If the small side fits
in memory, broadcast instead and no salting is needed at all; salting
is for the mid-size dimension that is too big to broadcast while the
fact side is skewed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``large`` (skewed side) with ``small``, spreading each
    hot join key over ``n_salts`` reducer buckets. Output columns equal
    the plain ``large.join(small, on, how)``; row multiplicity is
    preserved (each left row joins its key's matches exactly once,
    inside its own salt bucket).

    The salt is derived from a hash of the large side's whole row PLUS
    a per-partition row index (``monotonically_increasing_id``), so it
    stays uniform even when the hot key's rows are EXACT duplicates --
    the common skew shape in pre-dedup logs, where a row-content hash
    alone would send every duplicate to one salt bucket and silently
    defeat the operator. The ids (and hence the salt values) are only
    stable for a fixed upstream partition layout; correctness does NOT
    depend on salt determinism -- the join output is salt-invariant, a
    recompute with different salts yields the same rows. ``how`` may be
    ``inner`` or ``left`` (right/full would need the salt on the other
    side's null-extension and are not supported here).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    for side, df in (("large", large), ("small", small)):
        if SALT_COL in df.columns:
            raise ValueError(
                f"salted_join: {side} side already has a {SALT_COL!r} column; "
                "rename it before salting (it would be overwritten and dropped)"
            )
    on = list(on)
    salted_large = large.withColumn(
        SALT_COL,
        F.pmod(
            F.xxhash64(*[F.col(c) for c in large.columns],
                       F.monotonically_increasing_id()),
            F.lit(n_salts),
        ),
    )
    replicated_small = small.withColumn(
        SALT_COL,
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<long>")),
    )
    return (
        salted_large.join(replicated_small, [*on, SALT_COL], how)
        .drop(SALT_COL)
    )
