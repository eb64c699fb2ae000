"""Decorrelated-corpus generator honesty (r12 post-mortem).

The scale-proof near-dup corpus exists to make candidate density scale
LINEARLY with amplification. r11's Caesar-only generator silently
degenerated above the alphabet period: ``_ALPHA[i:]`` for i >= 26
slices to empty, making the "rotation" the identity, so copies 26+
were letter-identical to copy 0 and the 50x corpus measured a
manufactured quadratic pair blowup (1.65M cross-copy pairs at
J ~= 0.997). These tests pin the fixed generator's contract at a
multiplicity above the period: every copy is a fresh bijection (no
aliasing), and bijections preserve within-copy structure exactly.
"""

from __future__ import annotations

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_spec = importlib.util.spec_from_file_location(
    "scale_proof", os.path.join(REPO, "tools", "scale_proof.py")
)
scale_proof = importlib.util.module_from_spec(_spec)
sys.modules.setdefault("scale_proof", scale_proof)
_spec.loader.exec_module(scale_proof)

SRC_ROWS = [
    (0, "merge Scan 42 hash join 42 merge scan"),
    (1, "row group 1337 vector filter window"),
    (2, "query plan 900 shuffle map reduce 900"),
]
COPIES = 30  # above the 26-rotation period on purpose


def _build(spark, tmp_path):
    sp = scale_proof
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(SRC_ROWS, "doc_id long, text string")\
        .coalesce(1).write.parquet(str(src / "documents.parquet"))
    out = str(tmp_path / "nd")
    sp.build_neardup(spark, out, copies=COPIES, src_dir=str(src))
    rows = spark.read.parquet(f"{out}/documents.parquet").collect()
    by_copy = {}
    for r in rows:
        by_copy.setdefault(r.doc_id // 1_000_000, {})[
            r.doc_id % 1_000_000
        ] = r.text
    assert len(by_copy) == COPIES
    return by_copy


def test_no_copy_aliases_another(spark, tmp_path):
    """The r11 bug, pinned: copy i's translation of a probe doc must
    differ from EVERY other copy's (in particular copies 26..29 vs
    copy 0, which the Caesar slicing mapped to the identity)."""
    by_copy = _build(spark, tmp_path)
    texts = [by_copy[i][0] for i in range(COPIES)]
    assert len(set(texts)) == COPIES


def test_bijection_preserves_within_copy_structure(spark, tmp_path):
    """Each copy is one character bijection applied uniformly: token
    lengths, space positions, case positions, and EQUALITY STRUCTURE
    (which positions hold the same character) must match copy 0 -- the
    property that keeps within-copy near-dup density identical to the
    source's."""
    by_copy = _build(spark, tmp_path)
    base = by_copy[0]
    for i in range(1, COPIES):
        mapping: dict[str, str] = {}
        rev: dict[str, str] = {}
        for doc in base:
            s, t = base[doc], by_copy[i][doc]
            assert len(s) == len(t), (i, doc)
            for a, b in zip(s, t):
                if a == " ":
                    assert b == " ", i
                    continue
                assert a.isupper() == b.isupper(), i
                assert mapping.setdefault(a, b) == b, (i, a)
                assert rev.setdefault(b, a) == a, (i, b)


def test_high_copies_decorrelate_tokens(spark, tmp_path):
    """Cross-copy TOKEN overlap above the rotation period: for each
    probe pair of copies >= 26 (and vs copy 0), the letter-token sets
    must be disjoint -- rotation aliasing would make them identical."""
    by_copy = _build(spark, tmp_path)

    def letter_tokens(c):
        return {
            t for d in by_copy[c] for t in by_copy[c][d].lower().split()
            if t.isalpha()
        }

    for a, b in [(0, 26), (0, 27), (26, 27), (26, 28), (27, 29)]:
        assert not (letter_tokens(a) & letter_tokens(b)), (a, b)
