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


def test_quotes_are_data_not_syntax(spark, tmp_path):
    """Quote characters must never change field boundaries: an
    unterminated quote used to swallow separators into text and emit a
    clean-looking mangled row; with quoting disabled both lines parse
    positionally (quotes kept as literal text)."""
    lines = [
        '1\t"hello"\ten\tweb',        # quoted-looking text: kept verbatim
        '2\t"ab\ten\tweb',            # unterminated quote: still 4 fields
    ]
    path = _write(tmp_path, "q.tsv", lines)
    clean, quarantine = read_csv_docs(spark, path)
    rows = {r["doc_id"]: r for r in clean.collect()}
    assert quarantine.count() == 0
    assert rows[1]["text"] == '"hello"' and rows[1]["lang"] == "en"
    assert rows[2]["text"] == '"ab' and rows[2]["source"] == "web"


def test_regex_metachar_separator(spark, tmp_path):
    """A '|' separator must behave positionally, not as a regex (split
    on '|' as a regex splits on EVERY character and quarantined every
    valid row)."""
    path = _write(tmp_path, "p.csv", ["1|hello world|en|web",
                                      "2|short|row"])
    clean, quarantine = read_csv_docs(spark, path, sep="|")
    assert [r["text"] for r in clean.collect()] == ["hello world"]
    assert quarantine.count() == 1
