"""Postgres-compatible JDBC sink mode (SURVEY §2.1 S4/S5 alternative).

The reference upserts row-at-a-time with ``executemany`` + ``ON
CONFLICT`` (build_statements_annual_v3.py:156-176, seed_companies.py:52-61,
ingest_facts.py:119-143). A Spark cluster cannot funnel 100 TB through a
driver-side executemany; the standard distributed pattern is:

1. ``df.write.jdbc`` the batch into a STAGING table (executors stream
   partitions concurrently over N JDBC connections -- the only part
   that scales with data size);
2. one set-based merge statement on the server:
   ``INSERT INTO target SELECT ... FROM staging ON CONFLICT (pk)
   DO UPDATE SET col = EXCLUDED.col, updated_at = now()`` (or
   ``DO NOTHING``) -- semantically identical to the reference's
   per-row conflict handling, executed once;
3. drop the staging table.

Statement generation is pure (unit-tested against the reference's SQL
shapes); execution AND staging are injected, so the module works with
any DB-API connection factory. With no JDBC driver or Postgres in this
container, the whole orchestration (stage -> set-based merge -> drop
staging) runs end-to-end in tests against EMBEDDED sqlite3, whose
``ON CONFLICT (pk) DO UPDATE/DO NOTHING`` dialect matches Postgres
(tests/test_sinks_jdbc.py: live last-write-wins + refreshed
updated_at); production keeps the stock distributed ``df.write.jdbc``
staging writer.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame


def _ident(name: str) -> str:
    """Quote an SQL identifier (reference schema names are lowercase
    identifiers already; quoting keeps arbitrary column names safe)."""
    return '"' + name.replace('"', '""') + '"'


def upsert_merge_sql(
    target: str,
    staging: str,
    columns: Sequence[str],
    keys: Sequence[str],
    audit_updated_at: bool = True,
) -> str:
    """INSERT .. SELECT .. ON CONFLICT (keys) DO UPDATE SET, matching
    build_statements_annual_v3.py:156-176 (every non-key column takes
    EXCLUDED.*, plus ``updated_at = now()`` -- F12)."""
    collist = ", ".join(_ident(c) for c in columns)
    keylist = ", ".join(_ident(k) for k in keys)
    updates = [
        f"{_ident(c)} = EXCLUDED.{_ident(c)}" for c in columns if c not in keys
    ]
    if audit_updated_at:
        updates.append('"updated_at" = now()')
    return (
        f"INSERT INTO {_ident(target)} ({collist})\n"
        f"SELECT {collist} FROM {_ident(staging)}\n"
        # WHERE true disambiguates upsert-ON CONFLICT from a join's ON
        # for sqlite's parser; Postgres accepts it identically
        f"WHERE true\n"
        f"ON CONFLICT ({keylist}) DO UPDATE SET\n  "
        + ",\n  ".join(updates)
    )


def insert_ignore_sql(
    target: str, staging: str, columns: Sequence[str], keys: Sequence[str]
) -> str:
    """INSERT .. SELECT .. ON CONFLICT (keys) DO NOTHING
    (ingest_facts.py:119-128; the bare-conflict form of :132-143 keyed
    explicitly, which is equivalent under the table's unique index)."""
    collist = ", ".join(_ident(c) for c in columns)
    keylist = ", ".join(_ident(k) for k in keys)
    return (
        f"INSERT INTO {_ident(target)} ({collist})\n"
        f"SELECT {collist} FROM {_ident(staging)}\n"
        f"WHERE true\n"
        f"ON CONFLICT ({keylist}) DO NOTHING"
    )


def upsert_jdbc(
    df: DataFrame,
    url: str,
    target: str,
    keys: Sequence[str],
    execute: Callable[[str], None],
    mode: str = "update",
    properties: dict[str, str] | None = None,
    staging_suffix: str = "_staging",
    stage: Callable[[DataFrame, str], None] | None = None,
) -> str:
    """Distributed JDBC upsert: stage the DataFrame, merge set-based.

    ``execute`` runs one server-side SQL string (a DB-API cursor's
    ``execute`` bound to the warehouse, or a test recorder). ``mode``:
    ``"update"`` = ON CONFLICT DO UPDATE (S5), ``"nothing"`` = DO
    NOTHING (S6). ``stage`` overrides the staging writer (default:
    ``df.write.jdbc`` overwrite) -- the second injection point, letting
    the whole orchestration run against any DB-API database (the
    embedded-sqlite end-to-end test) or a recording double, while
    production keeps the distributed JDBC write. Returns the merge SQL
    it executed."""
    staging = f"{target}{staging_suffix}"
    if stage is not None:
        stage(df, staging)
    else:
        df.write.jdbc(url, staging, mode="overwrite",
                      properties=properties or {})
    if mode == "update":
        sql = upsert_merge_sql(target, staging, df.columns, keys)
    elif mode == "nothing":
        sql = insert_ignore_sql(target, staging, df.columns, keys)
    else:
        raise ValueError(f"unknown mode: {mode}")
    execute(sql)
    execute(f"DROP TABLE {_ident(staging)}")
    return sql
