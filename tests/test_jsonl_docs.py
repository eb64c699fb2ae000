"""JSONL ingestion: clean/quarantine split against a crafted delivery
with good rows, truncated JSON, a type clash, and a missing doc_id."""

from __future__ import annotations

import gzip

from sec_xbrl_finwarehouse_spark.sources.jsonl_docs import read_jsonl_docs

LINES = [
    '{"doc_id": 1, "text": "hello world", "lang": "en", "source": "web"}',
    '{"doc_id": 2, "text": "bonjour", "lang": "fr", "source": "web"}',
    '{"doc_id": 3, "text": "truncated...',                       # bad JSON
    '{"doc_id": "not-a-number", "text": "typed wrong"}',         # type clash
    '{"text": "no id provided", "lang": "en", "source": "vendor"}',
    '{"doc_id": 6, "lang": "en", "source": "web"}',              # no text
]


def _write(tmp_path, name, lines, gz=False):
    p = tmp_path / name
    data = ("\n".join(lines) + "\n").encode()
    p.write_bytes(gzip.compress(data) if gz else data)
    return str(p)


def test_clean_quarantine_split(spark, tmp_path):
    path = _write(tmp_path, "docs.jsonl", LINES)
    clean, quarantine = read_jsonl_docs(spark, path)

    rows = {r["doc_id"]: r for r in clean.collect()}
    assert rows[1]["text"] == "hello world" and rows[1]["n_chars"] == 11
    assert rows[2]["lang"] == "fr"
    # missing doc_id -> stable content hash, present and deterministic
    hashed = [k for k, r in rows.items() if r["text"] == "no id provided"]
    assert len(hashed) == 1 and hashed[0] > 0
    clean2, _ = read_jsonl_docs(spark, path)
    again = [r["doc_id"] for r in clean2.collect()
             if r["text"] == "no id provided"]
    assert again == hashed  # re-ingest -> same id

    # quarantine holds exactly the three non-clean lines, raw
    q = [r["raw_line"] for r in quarantine.collect()]
    assert len(q) == 3
    assert any("truncated" in line for line in q)
    assert any("not-a-number" in line for line in q)

    # nothing dropped: clean + quarantine == input lines
    assert clean.count() + quarantine.count() == len(LINES)


def test_gzip_delivery_reads_unchanged(spark, tmp_path):
    path = _write(tmp_path, "docs.jsonl.gz", LINES[:2], gz=True)
    clean, quarantine = read_jsonl_docs(spark, path)
    assert clean.count() == 2 and quarantine.count() == 0


def test_corpus_operators_compose_on_ingested_frame(spark, tmp_path):
    """An ingested delivery persisted as a documents table must slot
    straight into the corpus operator pack (same column contract as
    the driver's documents parquet)."""
    from sec_xbrl_finwarehouse_spark.plans.text_queries import q_doc_quality

    path = _write(tmp_path, "docs2.jsonl", LINES)
    clean, _ = read_jsonl_docs(spark, path)
    sf_dir = tmp_path / "as_table"
    sf_dir.mkdir()
    clean.write.parquet(str(sf_dir / "documents.parquet"))
    scored = q_doc_quality(spark, str(sf_dir))
    got = {r["doc_id"]: r for r in scored.collect()}
    assert len(got) == clean.count()
    assert all(r["n_tokens"] >= 1 for r in got.values())
