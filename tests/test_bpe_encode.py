"""True-BPE encoder: kernel semantics, greedy/rank-order equivalence,
pretokenizer parity, and the end-to-end mapInPandas plan."""

from __future__ import annotations

import hashlib
import re

import duckdb
import pytest

from sec_xbrl_finwarehouse_spark.functions.bpe import (
    BPE_MERGES,
    BPE_PATTERN,
    BPE_RANKS,
    ENC_SEP,
    encode_pretoken,
    encode_text,
    merge_pass,
)
from sec_xbrl_finwarehouse_spark.plans.text_queries import q_doc_bpe_encode

SF_DIR = "/root/testdata/sf0.001"


def rank_order_encode(tok: str, merges: list[tuple[str, str]]) -> list[str]:
    """The ORACLE's formulation: apply each rule exhaustively once, in
    rank order (fixed-depth, no priority scan)."""
    syms = list(tok)
    for a, b in merges:
        syms = merge_pass(syms, a, b)
    return syms


def reference_gpt2_bpe(tok: str, merges: list[tuple[str, str]]) -> list[str]:
    """Independent reimplementation of the canonical GPT-2 ``bpe()``
    inference loop (Radford et al. '19 released code): collect the set
    of adjacent pairs, merge the minimum-rank one everywhere
    (left-to-right), repeat until no known pair remains. Structured
    differently from functions/bpe.py on purpose -- set-of-pairs scan
    and an explicit rebuild loop -- so a shared bug cannot hide."""
    ranks = {p: i for i, p in enumerate(merges)}
    word = list(tok)
    while len(word) > 1:
        pairs = {(word[i], word[i + 1]) for i in range(len(word) - 1)}
        known = [p for p in pairs if p in ranks]
        if not known:
            break
        a, b = min(known, key=lambda p: ranks[p])
        new_word: list[str] = []
        i = 0
        while i < len(word):
            if i < len(word) - 1 and word[i] == a and word[i + 1] == b:
                new_word.append(a + b)
                i += 2
            else:
                new_word.append(word[i])
                i += 1
        word = new_word
    return word


def corpus_pretokens() -> list[str]:
    rows = duckdb.sql(
        f"SELECT text FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    rx = re.compile(BPE_PATTERN)
    seen: set[str] = set()
    for (text,) in rows:
        seen.update(rx.findall(text or ""))
    return sorted(seen)


def test_kernel_matches_reference_gpt2_on_corpus():
    """'A real BPE': the shipped greedy encoder reproduces the
    canonical GPT-2 loop on every distinct pretoken of the corpus."""
    toks = corpus_pretokens()
    assert toks, "corpus produced no pretokens"
    for tok in toks:
        assert encode_pretoken(tok) == reference_gpt2_bpe(tok, BPE_MERGES), tok


def test_greedy_equals_rank_order_passes_on_corpus():
    """The oracle's fixed-depth rank-order formulation is equivalent to
    the greedy encoder for the pinned (well-formed) merges table --
    asserted on the real corpus, which is exactly what the driver
    compares."""
    for tok in corpus_pretokens():
        assert encode_pretoken(tok) == rank_order_encode(tok, BPE_MERGES), tok


def test_merges_fixture_is_well_formed():
    """Every non-character component of rule r is the product of some
    rule r' < r -- the precondition for greedy == rank-order."""
    products: set[str] = set()
    for a, b in BPE_MERGES:
        for comp in (a, b):
            assert len(comp) == 1 or comp in products, (a, b, comp)
        products.add(a + b)


def test_overlapping_self_merge_is_left_to_right():
    """a == b runs: left-to-right non-overlap, floor(n/2) merges."""
    merges = [("x", "x")]
    ranks = {("x", "x"): 0}
    assert merge_pass(list("xxx"), "x", "x") == ["xx", "x"]
    assert merge_pass(list("xxxx"), "x", "x") == ["xx", "xx"]
    assert merge_pass(list("xxxxx"), "x", "x") == ["xx", "xx", "x"]
    for n in range(9):
        tok = "x" * n
        got = encode_pretoken(tok, ranks)
        assert got == rank_order_encode(tok, merges)
        assert got == reference_gpt2_bpe(tok, merges)


def test_overlap_after_merge_does_not_cascade_within_pass():
    """The product of a merge never re-matches the same rule within the
    same pass (merged symbol 'ab' != 'a' since b is non-empty)."""
    merges = [("a", "b"), ("ab", "ab")]
    ranks = {p: i for i, p in enumerate(merges)}
    got = encode_pretoken("abab", ranks)
    assert got == ["abab"]
    assert got == rank_order_encode("abab", merges)
    assert got == reference_gpt2_bpe("abab", merges)


def test_encode_text_memoizes_and_flattens():
    memo: dict[str, list[str]] = {}
    toks = encode_text("scan scan scan", _memo=memo)
    assert toks == encode_pretoken("scan") + encode_pretoken(
        " scan"
    ) + encode_pretoken(" scan")
    assert set(memo) == {"scan", " scan"}


def test_enc_sep_absent_from_corpus():
    """The digest joiner must not occur in document text, or the md5
    would be ambiguous (see functions/bpe.py ENC_SEP note)."""
    (n,) = duckdb.sql(
        f"SELECT count(*) FROM '{SF_DIR}/documents.parquet'"
        " WHERE contains(text, chr(31))"
    ).fetchone()
    assert n == 0


def test_pretokenizer_parity_python_vs_spark(spark):
    """Python re (the kernel) and Spark's Java regex agree on
    regexp_extract_all(BPE_PATTERN) over the corpus."""
    from pyspark.sql import functions as F

    df = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select(
            "doc_id",
            "text",
            F.regexp_extract_all(
                F.col("text"), F.lit(BPE_PATTERN), F.lit(0)
            ).alias("toks"),
        )
        .collect()
    )
    rx = re.compile(BPE_PATTERN)
    for row in df:
        assert row.toks == rx.findall(row.text or ""), row.doc_id


def test_doc_bpe_encode_end_to_end(spark):
    got = {
        r.doc_id: (r.n_bpe_tokens, r.enc_md5)
        for r in q_doc_bpe_encode(spark, SF_DIR).collect()
    }
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    assert len(got) == len(rows)
    for doc_id, text in rows:
        toks = encode_text(text or "")
        exp = (
            len(toks),
            hashlib.md5(ENC_SEP.join(toks).encode("utf-8")).hexdigest(),
        )
        assert got[doc_id] == exp, doc_id


def test_doc_bpe_seq_packing_matches_python_packer(spark):
    """The BPE-budgeted packer's shard/cumsum/pack assignment equals a
    pure-Python packer over encode_text counts: same shards
    (doc_id % PACK_SHARDS), same doc_id order, pack boundary at every
    PACK_WINDOW preceding tokens."""
    from sec_xbrl_finwarehouse_spark.plans.text_queries import (
        PACK_SHARDS,
        PACK_WINDOW,
        q_doc_bpe_seq_packing,
    )

    got = {
        r.doc_id: (r.shard, r.n_tokens, r.cum_tokens, r.pack_id)
        for r in q_doc_bpe_seq_packing(spark, SF_DIR).collect()
    }
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet'"
        " ORDER BY doc_id"
    ).fetchall()
    assert len(got) == len(rows)
    cum: dict[int, int] = {}
    for doc_id, text in rows:
        shard = doc_id % PACK_SHARDS
        n = len(encode_text(text or ""))
        before = cum.get(shard, 0)
        cum[shard] = before + n
        exp = (shard, n, before + n, before // PACK_WINDOW)
        assert got[doc_id] == exp, (doc_id, got[doc_id], exp)
    # budgets must differ from the whitespace estimator somewhere, or
    # this query would be redundant with doc_seq_packing
    ws = {
        doc_id: len((text or "").split()) for doc_id, text in rows
    }
    assert any(got[d][1] != ws[d] for d in ws)


def test_bpe_counts_are_at_most_pretoken_chars():
    """Merging only ever shortens: n_bpe_tokens <= n_chars, and for any
    pretoken hit by at least one rule, strictly fewer symbols."""
    assert len(encode_pretoken(" scan")) < len(" scan")
    for tok in corpus_pretokens():
        assert 1 <= len(encode_pretoken(tok)) <= len(tok)
