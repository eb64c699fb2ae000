"""Train the pinned BPE merges fixture for ``doc_bpe_encode``.

Offline, run-once reproducibility tool: learns character-level BPE
merges (Sennrich et al. '16 training loop) over the GPT-2-style
pretokens of the sf0.01 documents corpus and prints the
``BPE_MERGES`` constant pinned in
``sec_xbrl_finwarehouse_spark/functions/bpe.py``. The merges list is
in TRAINING ORDER, which makes it *well-formed*: every non-character
component of rule r is the product of some rule r' < r. Well-formedness
is what makes "apply each rule exhaustively in rank order" equivalent
to the runtime greedy lowest-rank-first encoder (see functions/bpe.py);
the equivalence is asserted over the real corpus in
tests/test_bpe_encode.py, not just argued.

Usage: python tools/train_bpe_fixture.py [sf_dir] [n_merges]
"""

from __future__ import annotations

import collections
import re
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from sec_xbrl_finwarehouse_spark.plans.text_queries import BPE_PATTERN


def merge_pass(syms: tuple[str, ...], a: str, b: str) -> tuple[str, ...]:
    """Replace all non-overlapping (a, b) adjacencies left-to-right."""
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train(texts: list[str], n_merges: int) -> list[tuple[str, str]]:
    pretok = collections.Counter()
    rx = re.compile(BPE_PATTERN)
    for t in texts:
        pretok.update(rx.findall(t or ""))
    seqs: dict[tuple[str, ...], int] = {
        tuple(tok): cnt for tok, cnt in pretok.items()
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = collections.Counter()
        for syms, cnt in seqs.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += cnt
        if not pairs:
            break
        # deterministic: max count, ties broken lexicographically
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        rebuilt: dict[tuple[str, ...], int] = collections.defaultdict(int)
        for syms, cnt in seqs.items():
            rebuilt[merge_pass(syms, *best)] += cnt
        seqs = dict(rebuilt)
    return merges


def main() -> None:
    import duckdb

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 48
    texts = [
        r[0]
        for r in duckdb.sql(
            f"SELECT text FROM '{sf_dir}/documents.parquet' ORDER BY doc_id"
        ).fetchall()
    ]
    merges = train(texts, n)
    print("BPE_MERGES: list[tuple[str, str]] = [")
    for i in range(0, len(merges), 3):
        print("    " + " ".join(f"{m!r}," for m in merges[i : i + 3]))
    print("]")


if __name__ == "__main__":
    main()
