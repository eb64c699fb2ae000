"""Composed streaming corpus builder: decontamination + incremental
dedup + exactly-once appends in ONE foreachBatch pipeline.

Pins the composition's claims:

* SEMANTICS: contaminated docs are dropped BEFORE dedup and never
  enter the MinHash index -- so a later clean near-duplicate of a
  contaminated (ghost) doc is still admitted. The discriminating doc
  (12, near-dup of contaminated 11) separates filter->dedup from
  dedup->filter AND from any implementation that indexes dropped docs.
* BATCH EQUIVALENCE: the two-micro-batch stream lands exactly the
  one-shot composition's keep set (decontaminate everything, dedup
  from scratch).
* CRASH HEALING: a failure between the corpus append and the index
  appends heals on replay, converging to the crash-free state
  (inherited from dedup_ingest, re-proven through the composed path).
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from sec_xbrl_finwarehouse_spark import sinks
from sec_xbrl_finwarehouse_spark.plans.decontam_index import (
    build_decontam_index,
)
from sec_xbrl_finwarehouse_spark.plans.text_queries import TRAIN_HEX
from sec_xbrl_finwarehouse_spark.streaming import dedup_ingest
from sec_xbrl_finwarehouse_spark.streaming.corpus_ingest import (
    foreach_batch_corpus_ingest,
    foreach_batch_quality_corpus_ingest,
)

BASE = [f"w{i}" for i in range(40)]
DOC2_TEXT = " ".join(f"y{i}" for i in range(40))

BATCH0 = [
    (0, " ".join(BASE)),
    (1, " ".join(f"x{i}" for i in range(40))),
    (2, DOC2_TEXT),                                        # contaminated
]
BATCH1 = [
    (10, " ".join(BASE[:36] + ["n1", "n2", "n3", "n4"])),  # near-dup of 0
    (11, " ".join(f"z{i}" for i in range(36)) + " c1 c2 c3 c4"),
    # ^ novel but CONTAMINATED via the c-tail
    (12, " ".join(f"z{i}" for i in range(36)) + " q1 q2 q3 q4"),
    # ^ clean near-dup of 11 -- kept ONLY if 11 never entered the index
]
# from-scratch composition: drop {2, 11} (contaminated), dedup the
# rest: 10 is a near-dup of 0 -> the keep set
KEPT = {0, 1, 12}


def _test_split_ids(n):
    """doc_ids landing in the md5 TEST split (build_decontam_index
    indexes only those)."""
    out, i = [], 0
    while len(out) < n:
        if hashlib.md5(str(i).encode()).hexdigest()[0] not in TRAIN_HEX:
            out.append(i)
        i += 1
    return out


def _build_eval_index(spark, tmp_path):
    """An eval 'suite' whose shingles hit doc 2's text and the c-tail
    of doc 11 -- written as an sf-style dir for build_decontam_index."""
    eid1, eid2 = _test_split_ids(2)
    eval_dir = tmp_path / "evalsf"
    eval_dir.mkdir()
    spark.createDataFrame(
        [(eid1, DOC2_TEXT), (eid2, "c1 c2 c3 c4")],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(str(eval_dir / "documents.parquet"))
    idx = str(tmp_path / "decontam_idx")
    build_decontam_index(spark, str(eval_dir), idx)
    return idx


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _paths(tmp_path):
    return (str(tmp_path / "corpus"), str(tmp_path / "bands"),
            str(tmp_path / "shingles"))


def _assert_converged(spark, corpus, bands, shingles):
    assert {r["doc_id"] for r in sinks.read_table(spark, corpus)
            .select("doc_id").collect()} == KEPT
    # contaminated/dropped docs must be absent from the INDEX too
    assert {r["doc_id"] for r in sinks.read_table(spark, bands)
            .select("doc_id").distinct().collect()} == KEPT
    assert {r["doc_id"] for r in sinks.read_table(spark, shingles)
            .select("doc_id").distinct().collect()} == KEPT


def test_stream_matches_one_shot_composition(spark, tmp_path):
    idx = _build_eval_index(spark, tmp_path)
    corpus, bands, shingles = _paths(tmp_path)
    src = tmp_path / "doc_src"
    src.mkdir()
    for i, rows in enumerate([BATCH0, BATCH1]):
        _docs(spark, rows).coalesce(1).write.parquet(
            str(src / f"batch_{i}.parquet")
        )
    q = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*/")
        .writeStream.foreachBatch(foreach_batch_corpus_ingest(
            corpus, bands, shingles, idx, app_id="corpus-v1"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream did not finish within 300 s"
    _assert_converged(spark, corpus, bands, shingles)
    # survivors carry their original text
    texts = {r["doc_id"]: r["text"] for r in
             sinks.read_table(spark, corpus).collect()}
    assert texts[12].endswith("q1 q2 q3 q4")


def test_fully_committed_replay_is_metadata_noop(spark, tmp_path):
    idx = _build_eval_index(spark, tmp_path)
    corpus, bands, shingles = _paths(tmp_path)
    sink = foreach_batch_corpus_ingest(
        corpus, bands, shingles, idx, app_id="corpus-v1")
    sink(_docs(spark, BATCH0), 0)
    sink(_docs(spark, BATCH1), 1)
    versions = [sinks.current_data_dir(p) for p in (corpus, bands, shingles)]
    sink(_docs(spark, BATCH1), 1)  # replay of a fully-committed batch
    assert [sinks.current_data_dir(p)
            for p in (corpus, bands, shingles)] == versions
    _assert_converged(spark, corpus, bands, shingles)


def test_quality_gate_drops_before_index_and_ghosts(spark, tmp_path):
    """The quality-gated composition's discriminating case: doc 0 fails
    the planted classifier and must enter neither the corpus nor the
    MinHash index; doc 2 -- a HIGH-quality near-dup of dropped doc 0
    (same 36/40-token shape the plain composition's test proves is
    within the dedup threshold) -- must be admitted on its own merit.
    An implementation that indexes quality-dropped docs, or gates
    after dedup, keeps {1} instead of {1, 2}."""
    qb = 1 << 40  # collision-free planted buckets (md5[:12] is 48 bits)

    def bucket(tok: str) -> int:
        return int(hashlib.md5(tok.encode()).hexdigest()[:12], 16) % qb

    idx = _build_eval_index(spark, tmp_path)
    corpus, bands, shingles = _paths(tmp_path)
    neutral = [f"m{i}" for i in range(36)]
    low = " ".join(neutral + ["bad1", "bad2", "bad3", "bad4"])
    high = " ".join(neutral + ["ok1", "ok2", "ok3", "ok4"])
    # 4 negative unigrams / 79 features = -0.101 < -0.05; every other
    # doc scores exactly 0.0 and keeps
    w = {bucket(f"bad{i}"): -2_000_000 for i in (1, 2, 3, 4)}
    sink = foreach_batch_quality_corpus_ingest(
        corpus, bands, shingles, idx, app_id="qc-v1",
        weights=w, bias=0.0, threshold=-0.05, n_buckets=qb,
    )
    sink(_docs(spark, [(0, low),
                       (1, " ".join(f"u{i}" for i in range(40)))]), 0)
    sink(_docs(spark, [(2, high)]), 1)
    for table in (corpus, bands, shingles):
        got = {r["doc_id"] for r in sinks.read_table(spark, table)
               .select("doc_id").distinct().collect()}
        assert got == {1, 2}, (table, got)
    # fully-committed replay through the gated path is a metadata noop
    versions = [sinks.current_data_dir(p) for p in (corpus, bands, shingles)]
    sink(_docs(spark, [(2, high)]), 1)
    assert [sinks.current_data_dir(p)
            for p in (corpus, bands, shingles)] == versions


def test_crash_between_appends_heals_on_replay(spark, tmp_path, monkeypatch):
    """Kill the composed sink after batch 1's corpus append (the index
    writes never land), then replay: the decontamination verdict is
    deterministic, so the re-filtered batch re-dedups to the same keep
    set and the three tables converge to the crash-free state."""
    idx = _build_eval_index(spark, tmp_path)
    corpus, bands, shingles = _paths(tmp_path)
    sink = foreach_batch_corpus_ingest(
        corpus, bands, shingles, idx, app_id="corpus-v1")
    sink(_docs(spark, BATCH0), 0)

    real_append = sinks.append_if_absent
    calls = {"n": 0}

    def exploding_append(spark_, path, incoming, keys, **kw):
        calls["n"] += 1
        if calls["n"] == 2:  # the bands write of batch 1
            raise RuntimeError("injected crash between appends")
        return real_append(spark_, path, incoming, keys, **kw)

    monkeypatch.setattr(dedup_ingest.sinks, "append_if_absent",
                        exploding_append)
    with pytest.raises(RuntimeError, match="injected crash"):
        sink(_docs(spark, BATCH1), 1)
    monkeypatch.setattr(dedup_ingest.sinks, "append_if_absent", real_append)

    sink(_docs(spark, BATCH1), 1)  # replay heals
    _assert_converged(spark, corpus, bands, shingles)
