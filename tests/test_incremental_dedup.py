"""Incremental dedup: new batch vs stored index must agree with the
from-scratch batch dedup, and the keep decision must be append-safe."""

from __future__ import annotations

from sec_xbrl_finwarehouse_spark.plans.incremental_dedup import (
    build_minhash_index,
    dedup_incremental,
    incremental_keep,
)
from sec_xbrl_finwarehouse_spark.plans.text_queries import q_doc_minhash_lsh_dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BASE = [f"w{i}" for i in range(40)]


def _corpus_rows():
    return [
        (0, " ".join(BASE)),
        (1, " ".join(f"x{i}" for i in range(40))),
        (2, " ".join(f"y{i}" for i in range(40))),
    ]


def _batch_rows():
    return [
        (10, " ".join(BASE[:36] + ["n1", "n2", "n3", "n4"])),  # near-dup of stored 0
        (11, " ".join(f"z{i}" for i in range(40))),            # novel
        (12, " ".join(f"z{i}" for i in range(36)) + " q1 q2 q3 q4"),  # near-dup of 11
    ]


def _setup(spark, tmp_path):
    sf = tmp_path / "sf"
    sf.mkdir(exist_ok=True)
    _docs(spark, _corpus_rows()).coalesce(1).write.mode("overwrite").parquet(
        str(sf / "documents.parquet")
    )
    idx = str(tmp_path / "idx")
    build_minhash_index(spark, str(sf), idx)
    return str(sf), idx


def test_incremental_finds_cross_and_within_pairs(spark, tmp_path):
    _, idx = _setup(spark, tmp_path)
    pairs = dedup_incremental(spark, _docs(spark, _batch_rows()), idx).collect()
    got = {(r["d1"], r["d2"]) for r in pairs}
    assert got == {(0, 10), (11, 12)}
    assert all(r["jaccard"] >= 0.5 for r in pairs)


def test_incremental_agrees_with_batch_dedup(spark, tmp_path):
    """Index(corpus) + batch must find exactly the pairs a from-scratch
    run over corpus+batch finds (restricted to pairs touching the batch)."""
    sf, idx = _setup(spark, tmp_path)
    inc = {(r["d1"], r["d2"])
           for r in dedup_incremental(spark, _docs(spark, _batch_rows()), idx).collect()}

    union = tmp_path / "sf_union"
    union.mkdir()
    _docs(spark, _corpus_rows() + _batch_rows()).coalesce(1).write.parquet(
        str(union / "documents.parquet")
    )
    full = {(r["d1"], r["d2"])
            for r in q_doc_minhash_lsh_dedup(spark, str(union)).collect()}
    new_ids = {r[0] for r in _batch_rows()}
    assert inc == {p for p in full if p[1] in new_ids or p[0] in new_ids}


def test_incremental_keep_decision(spark, tmp_path):
    _, idx = _setup(spark, tmp_path)
    batch = _docs(spark, _batch_rows())
    pairs = dedup_incremental(spark, batch, idx)
    keep = {r["doc_id"]: r["keep"] for r in incremental_keep(batch, pairs).collect()}
    assert keep == {10: False, 11: True, 12: False}
