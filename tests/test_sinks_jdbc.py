"""JDBC sink SQL-generation tests: the staged-merge statements must
carry the reference's exact conflict semantics (v3.py:156-176,
ingest_facts.py:119-143). No database in this container -- the pure
generators are asserted directly; ``upsert_jdbc``'s orchestration is
exercised in test_sinks via its executor injection point."""

from __future__ import annotations

import pytest

from sec_xbrl_finwarehouse_spark.sinks_jdbc import (
    insert_ignore_sql,
    upsert_merge_sql,
)

COLS = ["cik", "fiscal_year", "revenues", "net_income"]
KEYS = ["cik", "fiscal_year"]


def test_upsert_merge_matches_reference_shape():
    sql = upsert_merge_sql("statements_annual", "statements_annual_staging",
                           COLS, KEYS)
    assert 'INSERT INTO "statements_annual"' in sql
    assert 'FROM "statements_annual_staging"' in sql
    assert 'ON CONFLICT ("cik", "fiscal_year") DO UPDATE SET' in sql
    # every non-key column takes EXCLUDED.*; keys never self-assign
    assert '"revenues" = EXCLUDED."revenues"' in sql
    assert '"net_income" = EXCLUDED."net_income"' in sql
    assert '"cik" = EXCLUDED' not in sql
    # F12: updated_at refreshed on conflict (v3.py:175)
    assert '"updated_at" = now()' in sql


def test_upsert_merge_without_audit():
    sql = upsert_merge_sql("t", "t_staging", COLS, KEYS, audit_updated_at=False)
    assert "updated_at" not in sql


def test_insert_ignore_matches_reference_shape():
    sql = insert_ignore_sql("facts", "facts_staging", COLS, KEYS)
    assert sql.endswith('ON CONFLICT ("cik", "fiscal_year") DO NOTHING')
    assert "DO UPDATE" not in sql


def test_identifier_quoting():
    sql = insert_ignore_sql('we"ird', "s", ['a"b'], ['a"b'])
    assert '"we""ird"' in sql and '"a""b"' in sql
