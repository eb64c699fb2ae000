"""Long -> wide pivot with first-value semantics (SURVEY.md §2.4 A1).

The reference pivots host-side: ``by_year.setdefault((cik, fy), {})[tag] = value``
(build_statements_annual_v3.py:111-114). Input is already unique per
(key..., tag) thanks to the W1 window dedup, so ``first`` is deterministic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pivot_first(
    df: DataFrame,
    keys: Sequence[str],
    tag_col: str,
    value_col: str,
    tags: Sequence[str],
) -> DataFrame:
    """Pivot ``tag_col`` into one column per tag, taking the single value.

    ``tags`` is the explicit pivot-value list: with it, Spark skips the
    extra distinct-values job AND the output schema is static -- both
    required at scale (a dynamic pivot over 100 TB would scan twice).

    Uses ``first`` to mirror the reference's dict-insert semantics; the
    caller must guarantee uniqueness per (keys..., tag) (W1 does -- its
    partition key equals the pivot key).
    """
    return (
        df.groupBy(*keys)
        .pivot(tag_col, list(tags))
        .agg(F.first(F.col(value_col)))
    )
