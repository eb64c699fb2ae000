"""CSV/TSV ingestion: clean/quarantine split against a crafted TSV
delivery with good rows, an embedded-separator line (silent-truncation
hazard — must quarantine, never guess), a non-numeric doc_id, a
missing text, a short line, and a header row."""

from __future__ import annotations

import gzip

from sec_xbrl_finwarehouse_spark.sources.csv_docs import read_csv_docs

LINES = [
    "doc_id\ttext\tlang\tsource",                     # header
    "1\thello world\ten\tweb",
    "2\tbonjour tout le monde\tfr\tweb",
    "x9\ttyped wrong\ten\tweb",                       # non-numeric doc_id
    "\tno id provided\ten\tvendor",                   # empty id -> hash
    "5\t\ten\tweb",                                   # empty text
    "6\ttabs\tin\ttext\there\ten\tweb",               # embedded separator
    "7\tshort line",                                  # too few fields
]


def _write(tmp_path, name, lines, gz=False):
    p = tmp_path / name
    data = ("\n".join(lines) + "\n").encode()
    p.write_bytes(gzip.compress(data) if gz else data)
    return str(p)


def test_clean_quarantine_split_with_header(spark, tmp_path):
    path = _write(tmp_path, "docs.tsv", LINES)
    clean, quarantine = read_csv_docs(spark, path, header=True)
    rows = {r["doc_id"]: r for r in clean.collect()}
    # explicit ids pass through; the id-less row got a content hash
    assert {1, 2} <= set(rows)
    assert len(rows) == 3
    hashed = next(i for i in rows if i not in (1, 2))
    assert rows[hashed]["text"] == "no id provided"
    assert rows[hashed]["source"] == "vendor"
    assert rows[1]["n_chars"] == len("hello world")
    q = {r["raw_line"] for r in quarantine.collect()}
    assert q == {
        "x9\ttyped wrong\ten\tweb",
        "5\t\ten\tweb",
        "6\ttabs\tin\ttext\there\ten\tweb",
        "7\tshort line",
    }
    # nothing dropped: clean + quarantine covers every non-header line
    assert len(rows) + len(q) == len(LINES) - 1


def test_headerless_and_gzip(spark, tmp_path):
    body = [l for l in LINES[1:3]]
    path = _write(tmp_path, "docs.tsv.gz", body, gz=True)
    clean, quarantine = read_csv_docs(spark, path)
    assert clean.count() == 2 and quarantine.count() == 0


def test_content_id_is_stable_across_reingest(spark, tmp_path):
    p1 = _write(tmp_path, "a.tsv", ["\tsame text\ten\tweb"])
    p2 = _write(tmp_path, "b.tsv", ["\tsame text\ten\tweb"])
    c1, _ = read_csv_docs(spark, p1)
    c2, _ = read_csv_docs(spark, p2)
    assert c1.first()["doc_id"] == c2.first()["doc_id"]
