"""True byte-pair-encoding tokenizer (pinned merges fixture).

Closes the r11 depth gap: ``doc_bpe_token_count`` estimates token
budgets from the regex PRE-tokenizer alone, but sequence packing and
token-budget accounting drift against a real tokenizer because the
merge step changes counts non-uniformly across documents. This module
is the real thing: a GPT-2-shaped BPE (Sennrich et al. '16 inference)
over a pinned merges table, run as one Arrow-batched kernel.

No counterpart in ``/root/reference/`` (no text/tokenizer surface);
additive LLM-pipeline functionality.

Algorithm contract (the part the DuckDB oracle reproduces exactly):

* Pretokenize with :data:`BPE_PATTERN` (the GPT-2 split pattern,
  ASCII-approximated to syntax Python ``re``, Java regex, and RE2
  interpret identically -- all three are leftmost-first alternation).
* Within each pretoken, symbols start as single characters; merge
  rules apply by RANK. The runtime encoder is the standard greedy
  loop (repeatedly merge every left-to-right non-overlapping
  occurrence of the lowest-ranked pair present). Because the pinned
  merges list is in TRAINING order it is *well-formed* -- every
  non-character component of rule r is the product of a rule r' < r
  -- and for a well-formed table the greedy loop is equivalent to
  applying each rule exhaustively once, in rank order (rule r can
  only create adjacencies involving its own product, which feeds
  rules > r only). The oracle runs the rank-order formulation, a
  fixed-depth recursive CTE; the equivalence is ASSERTED over the
  real corpus and adversarial overlap cases in
  tests/test_bpe_encode.py, not just argued here.

Scale shape (100 TB): the merges table is a closure constant (a
production 50k-rule table would still be <1 MB -- broadcast-by-closure
is the right transport; no join, no shuffle). Encoding is one
``mapInPandas`` pass: embarrassingly parallel, zero exchange, Arrow
batch transfer, with a per-executor pretoken memo (natural-language
pretokens follow a Zipf law, so the memo hit rate approaches 1 and
the per-batch cost is ~O(distinct pretokens), the same observation
the DuckDB oracle exploits by encoding DISTINCT pretokens only).
Row-at-a-time Python UDF or Catalyst higher-order functions lose
here: the merge loop is data-dependent sequential control flow per
token, the documented no-let-binding HOF trap (functions/phash.py).
"""

from __future__ import annotations

import hashlib
import re
from collections.abc import Iterator

import pandas as pd

# GPT-2-style pretokenizer, restricted to syntax RE2 (DuckDB), Java
# (Spark) and Python re interpret identically: alternation of
# contraction suffixes, space-prefixed letter runs, digit runs,
# punctuation runs, whitespace. No lookaheads (RE2 has none), no \p
# classes (ASCII approximation). Moved here from plans/text_queries.py
# (which re-exports it) so the kernel does not import the plan layer.
BPE_PATTERN = "'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s']+|\\s+"

# Pinned merges fixture in TRAINING order (well-formed by
# construction): learned from the sf0.01 documents corpus by
# tools/train_bpe_fixture.py (re-run it to reproduce byte-exactly).
BPE_MERGES: list[tuple[str, str]] = [
    (' ', 's'), ('e', 'r'), ('i', 'n'),
    ('o', 'w'), ('o', 'r'), ('m', 'er'),
    ('a', 't'), ('l', 'u'), (' ', 'c'),
    ('a', 's'), (' ', 'b'), (' ', 'v'),
    ('a', 'r'), ('p', 'ar'), (' ', 'f'),
    (' ', 'a'), (' ', 't'), ('j', 'o'),
    ('jo', 'in'), ('as', 'h'), ('h', 'ash'),
    (' ', 'join'), ('s', 't'), ('r', 'ow'),
    ('at', 'c'), ('atc', 'h'), ('a', 'n'),
    ('c', 'an'), ('lu', 'm'), ('lum', 'n'),
    ('o', 'lumn'), ('o', 'mer'), ('st', 'omer'),
    ('u', 'stomer'), ('i', 'l'), ('il', 't'),
    ('ilt', 'er'), (' ', 'hash'), ('a', 'l'),
    ('al', 'l'), ('m', 'all'), (' ', 'row'),
    (' s', 'can'), (' ', 'd'), (' s', 'mall'),
    ('g', 'e'), ('l', 'ow'), ('mer', 'ge'),
]

BPE_RANKS: dict[tuple[str, str], int] = {
    pair: r for r, pair in enumerate(BPE_MERGES)
}

# joiner for the encoding digest: US (unit separator). Absent from the
# test corpora (asserted cheap enough to re-check in tests); a
# production digest would hash the length-prefixed token stream
# instead of trusting a sentinel byte.
ENC_SEP = "\x1f"


def merge_pass(syms: list[str], a: str, b: str) -> list[str]:
    """One exhaustive left-to-right non-overlapping (a, b) merge pass.

    Left-to-right matters only when occurrences overlap, i.e. a == b
    runs: ['x','x','x'] under ('x','x') -> ['xx','x'], never
    ['x','xx']. The DuckDB oracle reproduces exactly this via its
    even-run-length start mask.
    """
    out: list[str] = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def encode_pretoken(
    tok: str, ranks: dict[tuple[str, str], int] | None = None
) -> list[str]:
    """Greedy BPE inference for one pretoken: repeatedly merge all
    occurrences of the lowest-ranked pair present (the GPT-2 ``bpe()``
    loop). Terminates: every merge shortens the symbol list."""
    if ranks is None:
        ranks = BPE_RANKS
    syms = list(tok)
    while len(syms) > 1:
        best: tuple[str, str] | None = None
        best_rank = len(ranks)
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]), -1)
            if r >= 0 and r < best_rank:
                best_rank, best = r, (syms[i], syms[i + 1])
        if best is None:
            break
        syms = merge_pass(syms, *best)
    return syms


def encode_text(
    text: str,
    ranks: dict[tuple[str, str], int] | None = None,
    _rx: re.Pattern = re.compile(BPE_PATTERN),
    _memo: dict[str, list[str]] | None = None,
) -> list[str]:
    """Full-document encode: pretokenize, BPE each pretoken, flatten.
    Document token stream = concatenation over pretokens in order."""
    memo = _memo if _memo is not None else {}
    out: list[str] = []
    for pre in _rx.findall(text or ""):
        got = memo.get(pre)
        if got is None:
            got = encode_pretoken(pre, ranks)
            memo[pre] = got
        out.extend(got)
    return out


def bpe_count_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """``mapInPandas`` kernel: (doc_id, text) -> (doc_id, n_tokens).
    The counts-only sibling of :func:`bpe_encode_batches` for consumers
    that budget on token counts (sequence packing): column pruning
    cannot reach inside a kernel, so skipping the per-doc digest here
    is the moral equivalent of projecting enc_md5 away before it is
    computed. Same memo, same contract."""
    rx = re.compile(BPE_PATTERN)
    memo: dict[str, list[str]] = {}
    for pdf in batches:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_tokens": pd.Series(
                    [
                        len(encode_text(
                            t if isinstance(t, str) else "",
                            _rx=rx, _memo=memo,
                        ))
                        for t in pdf["text"]
                    ],
                    dtype="int64",
                ),
            }
        )


def bpe_encode_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """``mapInPandas`` kernel: (doc_id, text) -> (doc_id,
    n_bpe_tokens, enc_md5). ``enc_md5`` digests the UTF-8 bytes of the
    ENC_SEP-joined token stream, so the oracle's comparison covers the
    entire encoding bit-exactly, not just the count. The pretoken memo
    persists across batches within the executor task."""
    rx = re.compile(BPE_PATTERN)
    memo: dict[str, list[str]] = {}
    for pdf in batches:
        ns: list[int] = []
        digests: list[str] = []
        for text in pdf["text"]:
            toks = encode_text(
                text if isinstance(text, str) else "", _rx=rx, _memo=memo
            )
            ns.append(len(toks))
            digests.append(
                hashlib.md5(ENC_SEP.join(toks).encode("utf-8")).hexdigest()
            )
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bpe_tokens": pd.Series(ns, dtype="int64"),
                "enc_md5": digests,
            }
        )
