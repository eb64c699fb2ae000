"""Shared DuckDB-oracle SQL fragments.

One construction for the md5-hex-prefix decode every derandomized
operator family leans on (KMV sketches, Bloom positions, MinHash audit
signatures, A-ES sampling keys): the first ``n`` hex nibbles of a
column ``h`` mapped to an exact integer via a flat list comprehension
(no ``from_hex``/casts -- portable, binder-recursion-safe, and exact
for n <= 13 since 4n bits must fit a double-free BIGINT path). Keeping
it in ONE place means a fix (e.g. an uppercase-hex or off-by-one
issue) cannot silently miss a sibling oracle.
"""

from __future__ import annotations


def hex_prefix_int_sql(n: int, col: str = "h") -> str:
    """SQL for the first ``n`` hex nibbles of ``col`` as an exact
    integer-valued expression (DOUBLE-typed sum; wrap in CAST for
    BIGINT arithmetic, divide by 16**n for a [0,1) fraction)."""
    return (
        f"list_sum([(strpos('0123456789abcdef', {col}[i]) - 1)"
        f" * 16 ** ({n} - i)"
        f" for i in range(1, {n} + 1)])"
    )


def hex_prefix_frac_sql(n: int, col: str = "h") -> str:
    """The ``n``-nibble prefix as a [0,1) fraction -- the KMV/theta
    hash-value arithmetic (oracle twin of ``kmv_frac_col``)."""
    return f"{hex_prefix_int_sql(n, col)} / 16 ** {n}"


def hex_prefix_bigint_sql(n: int, col: str = "h") -> str:
    """The ``n``-nibble prefix as a BIGINT -- modular-arithmetic form
    (Bloom positions, MinHash base hashes)."""
    return f"CAST({hex_prefix_int_sql(n, col)} AS BIGINT)"
