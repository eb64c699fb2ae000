"""Property-based tests (SURVEY.md §5.4): hypothesis-generated inputs
through the dedup/upsert/pivot operators.

Strategy sizes are kept small (each example runs real Spark jobs) but
the GENERATED SHAPES cover what example-based tests miss: duplicate
keys, NULL values, empty frames, single-row frames, and key collisions
between batches. deadline=None because Spark job latency is not the
property under test.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sec_xbrl_finwarehouse_spark.operators.dedup import natural_key_dedup
from sec_xbrl_finwarehouse_spark.operators.pivot import pivot_first
from sec_xbrl_finwarehouse_spark.operators.upsert import (
    insert_if_absent,
    upsert_latest_wins,
)

_SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_ROW_SCHEMA = T.StructType([
    T.StructField("k", T.IntegerType(), False),
    T.StructField("tag", T.StringType(), False),
    T.StructField("v", T.DoubleType(), True),
])

TAGS = ["a", "b", "c"]

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),
        st.sampled_from(TAGS),
        st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False,
                                       width=32)),
    ),
    max_size=12,
)


def _df(spark, rows):
    return spark.createDataFrame(
        [(k, t, v) for k, t, v in rows], schema=_ROW_SCHEMA
    )


@_SETTINGS
@given(rows=rows_strategy)
def test_reingest_idempotent(spark, rows):
    """D1: dedup(batch ∪ batch) == dedup(batch) -- re-ingesting the same
    data is always a no-op, for ANY batch content."""
    df = _df(spark, rows)
    once = natural_key_dedup(df, ["k", "tag"])
    twice = natural_key_dedup(df.unionByName(df), ["k", "tag"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
    # at most one survivor per key
    assert once.groupBy("k", "tag").count().filter(F.col("count") > 1).count() == 0


@_SETTINGS
@given(rows=rows_strategy)
def test_upsert_idempotent_and_total(spark, rows):
    """S5: upserting a batch into itself changes nothing; upserting into
    empty yields the batch; every key appears exactly once."""
    incoming = natural_key_dedup(_df(spark, rows), ["k", "tag"])
    merged = upsert_latest_wins(incoming, incoming, ["k", "tag"])
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, incoming.collect())
    )


@_SETTINGS
@given(rows=rows_strategy, rows2=rows_strategy)
def test_insert_if_absent_preserves_existing(spark, rows, rows2):
    """S6: existing rows always survive untouched; incoming rows appear
    iff their key was absent; result keys = union of key sets."""
    existing = natural_key_dedup(_df(spark, rows), ["k", "tag"])
    incoming = _df(spark, rows2)
    merged = insert_if_absent(existing, incoming, ["k", "tag"])
    got = {(r["k"], r["tag"]): r["v"] for r in merged.collect()}
    existing_rows = {(r["k"], r["tag"]): r["v"] for r in existing.collect()}
    incoming_keys = {(k, t) for k, t, _ in rows2}
    # existing values win on conflict
    for key, v in existing_rows.items():
        assert key in got and got[key] == v
    assert set(got) == set(existing_rows) | incoming_keys
    assert merged.count() == len(got)  # unique per key


@_SETTINGS
@given(rows=rows_strategy)
def test_pivot_unpivot_roundtrip(spark, rows):
    """A1: pivot then unpivot recovers exactly the unique long rows with
    non-null values (NULL cells are unobservable in the wide form, like
    the reference's dict never storing absent tags)."""
    long = natural_key_dedup(_df(spark, rows), ["k", "tag"])
    wide = pivot_first(long, ["k"], "tag", "v", TAGS)
    back = wide.unpivot("k", TAGS, "tag", "v").filter(F.col("v").isNotNull())
    expect = sorted(
        (r["k"], r["tag"], r["v"]) for r in long.collect() if r["v"] is not None
    )
    assert sorted(map(tuple, back.collect())) == expect


@pytest.mark.parametrize("n", [0, 1])
def test_pivot_degenerate_sizes(spark, n):
    """Empty and single-row frames survive the full pivot∘unpivot path."""
    rows = [(0, "a", 1.0)][:n]
    long = _df(spark, rows)
    wide = pivot_first(long, ["k"], "tag", "v", TAGS)
    assert wide.count() == n


# ---- r4 surface properties -------------------------------------------------

words_strategy = st.lists(
    st.lists(st.sampled_from([f"w{i}" for i in range(12)]),
             min_size=0, max_size=25),
    min_size=1, max_size=6,
)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=words_strategy)
def test_simhash_neardup_pairs_symmetric_and_verified(spark, docs, tmp_path_factory):
    """For ANY token corpus: every reported pair is ordered (d1 < d2),
    within the hamming bound, and hamming(a,b) is consistent with the
    emitted fingerprints."""
    from sec_xbrl_finwarehouse_spark.plans import text_queries as tq

    tmp = tmp_path_factory.mktemp("sh")
    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)],
        "doc_id long, text string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp / "documents.parquet"))
    sigs = {r["doc_id"]: r["simhash"]
            for r in tq.q_doc_simhash(spark, str(tmp)).collect()}
    for r in tq.q_doc_simhash_neardup(spark, str(tmp)).collect():
        assert r["d1"] < r["d2"]
        assert r["hamming"] <= tq.SIMHASH_HAM_MAX
        assert bin(sigs[r["d1"]] ^ sigs[r["d2"]]).count("1") == r["hamming"]


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=words_strategy)
def test_stratified_sample_is_subset_with_full_rank_cover(spark, docs,
                                                          tmp_path_factory):
    """For ANY documents table: the sample is a subset, ranks within each
    language are exactly 1..min(K, stratum size), and rerunning yields
    the identical draw."""
    from sec_xbrl_finwarehouse_spark.plans import text_queries as tq

    tmp = tmp_path_factory.mktemp("ss")
    rows = [(i, " ".join(ws), ["en", "fr"][i % 2], "s", len(ws))
            for i, ws in enumerate(docs)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long")
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp / "documents.parquet"))

    got = tq.q_doc_stratified_sample(spark, str(tmp)).collect()
    again = tq.q_doc_stratified_sample(spark, str(tmp)).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))
    by_lang = {}
    for r in got:
        by_lang.setdefault(r["lang"], []).append(r["draw_rank"])
    strata = {}
    for _, _, lang, _, _ in rows:
        strata[lang] = strata.get(lang, 0) + 1
    for lang, ranks in by_lang.items():
        expect = min(tq.STRATA_SAMPLE_K, strata[lang])
        assert sorted(ranks) == list(range(1, expect + 1))


texts_strategy = st.lists(
    st.text(alphabet="ab @.-123xyz", max_size=30), max_size=8
)


@given(texts=texts_strategy)
@_SETTINGS
def test_repetition_fractions_bounded(spark, texts):
    """Repetition metrics are total functions into sane ranges for ANY
    text (empty, whitespace, punctuation soup): totals >= 0, fractions
    in [0, 1], dup_frac == 0 whenever every n-gram is unique, and
    top_frac >= 1/total when any n-gram exists."""
    from sec_xbrl_finwarehouse_spark.plans.corpus_queries import repetition_of

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = repetition_of(df).collect()
    assert len(out) == len(texts)
    for r in out:
        for n in (2, 3):
            total = r[f"n{n}_total"]
            dup = r[f"n{n}_dup_frac"]
            top = r[f"n{n}_top_frac"]
            assert total >= 0
            assert 0.0 <= dup <= 1.0 and 0.0 <= top <= 1.0
            if total > 0:
                assert top >= 1.0 / total - 1e-12
            else:
                assert dup == 0.0 and top == 0.0


@given(texts=texts_strategy)
@_SETTINGS
def test_pii_scan_total_and_consistent(spark, texts):
    """PII scan never errors on arbitrary text; has_pii is exactly
    (sum of counts > 0); counts are non-negative."""
    from sec_xbrl_finwarehouse_spark.plans.corpus_queries import pii_scan_of

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    for r in pii_scan_of(df).collect():
        counts = (r["n_emails"], r["n_ipv4"], r["n_phones"])
        assert all(c >= 0 for c in counts)
        assert r["has_pii"] == (sum(counts) > 0)


batches_strategy = st.lists(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=4),
                  st.integers(min_value=-100, max_value=100)),
        min_size=1, max_size=5,
    ),
    min_size=1, max_size=3,
)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(batches=batches_strategy, data=st.data())
def test_stream_sink_replays_never_change_outcome(spark, tmp_path, batches,
                                                  data):
    """Exactly-once property: delivering batches 0..n in order, with an
    ARBITRARY already-committed batch replayed after each step (the
    at-least-once failure model), yields exactly the table that
    once-each delivery yields — last-wins per key, batch order."""
    import uuid as _uuid

    from sec_xbrl_finwarehouse_spark import sinks
    from sec_xbrl_finwarehouse_spark.streaming.stream_sink import (
        foreach_batch_upsert,
    )

    table = str(tmp_path / f"prop_{_uuid.uuid4().hex}")
    sink = foreach_batch_upsert(table, ["k"], app_id="prop", audit=False)

    def frame(rows):
        return spark.createDataFrame(
            [(k, v) for k, v in rows], "k int, v int"
        )

    for i, rows in enumerate(batches):
        sink(frame(rows), i)
        j = data.draw(st.integers(min_value=0, max_value=i), label="replay")
        sink(frame(batches[j]), j)  # replayed delivery of a committed id

    got = {r["k"]: r["v"] for r in sinks.read_table(spark, table).collect()}
    # per key: the LAST batch containing the key wins; within that
    # batch, duplicate keys may resolve to any of the batch's values
    # for it (upsert_latest_wins ties are unordered within one batch)
    all_keys = {k for rows in batches for k, _ in rows}
    assert set(got) == all_keys
    for k, v in got.items():
        candidates = set()
        for rows in batches:
            vals = {bv for bk, bv in rows if bk == k}
            if vals:
                candidates = vals
        assert v in candidates, (k, v, candidates)


# ---- span dedup vs a pure-Python reference ---------------------------------

# docs built from a small PHRASE POOL so duplicated >=k-token spans
# actually occur across generated documents (pure random tokens almost
# never collide at span length)
_PHRASES = [tuple(f"p{i}{j}" for j in range(4)) for i in range(3)]
_SINGLES = [f"w{i}" for i in range(8)]

phrase_docs_strategy = st.lists(
    st.lists(
        st.one_of(
            st.sampled_from(_PHRASES),
            st.tuples(st.sampled_from(_SINGLES)),
        ),
        min_size=0, max_size=6,
    ),
    min_size=1, max_size=5,
)


def _ref_span_dedup(docs: dict, k: int) -> dict:
    """Pure-Python oracle for q_doc_span_dedup's contract: every
    duplicated >=k-token span keeps its first (doc_id, start)
    occurrence; all positions covered by a later occurrence are
    excised; docs reassembled from surviving tokens."""
    occ: dict = {}
    for d in sorted(docs):
        toks = docs[d]
        for i in range(len(toks) - k + 1):
            occ.setdefault(tuple(toks[i:i + k]), []).append((d, i))
    bad: dict = {d: set() for d in docs}
    for lst in occ.values():
        for d, i in sorted(lst)[1:]:
            bad[d].add(i)
    out = {}
    for d, toks in docs.items():
        keep = [t for p, t in enumerate(toks)
                if not any(s <= p < s + k for s in bad[d])]
        out[d] = (" ".join(keep), len(toks), len(toks) - len(keep))
    return out


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=phrase_docs_strategy)
def test_span_dedup_matches_reference(spark, docs, tmp_path_factory,
                                      monkeypatch):
    """For ANY phrase-pool corpus, the distributed span dedup equals the
    sequential reference implementation exactly (text, counts) --
    including empty docs, docs shorter than the span, within-doc
    repeats, and cross-doc boilerplate."""
    from sec_xbrl_finwarehouse_spark.plans import text_queries as tq

    monkeypatch.setattr(tq, "SPAN_K", 3)
    flat = {i: [t for chunk in d for t in chunk] for i, d in enumerate(docs)}
    tmp = tmp_path_factory.mktemp("span")
    spark.createDataFrame(
        [(i, " ".join(ts)) for i, ts in flat.items()],
        "doc_id long, text string",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp / "documents.parquet"))
    want = _ref_span_dedup(flat, 3)
    got = {
        r["doc_id"]: (r["text_dedup"], r["n_tokens"], r["n_removed"])
        for r in tq.q_doc_span_dedup(spark, str(tmp)).collect()
    }
    assert got == want


def _ref_chunks(toks: list, w: int, s: int) -> list:
    """Pure-Python oracle for q_doc_chunk: stride-s windows of w tokens,
    trailing fully-contained windows dropped."""
    n = len(toks)
    if n == 0:
        return []
    last = max(0, n - (w - s) - 1)
    return [
        (start // s, min(w, n - start), " ".join(toks[start:start + w]))
        for start in range(0, last + 1, s)
    ]


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=phrase_docs_strategy)
def test_chunk_matches_reference(spark, docs, tmp_path_factory, monkeypatch):
    """For ANY corpus: chunk boundaries, counts, and the
    contained-trailing-window drop match the sequential reference."""
    from sec_xbrl_finwarehouse_spark.plans import text_queries as tq

    monkeypatch.setattr(tq, "CHUNK_TOKENS", 5)
    monkeypatch.setattr(tq, "CHUNK_STRIDE", 3)
    flat = {i: [t for chunk in d for t in chunk] for i, d in enumerate(docs)}
    tmp = tmp_path_factory.mktemp("chunk")
    spark.createDataFrame(
        [(i, " ".join(ts)) for i, ts in flat.items()],
        "doc_id long, text string",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp / "documents.parquet"))
    want = {
        (d, idx): (ln, txt)
        for d, ts in flat.items()
        for idx, ln, txt in _ref_chunks(ts, 5, 3)
    }
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["n_chunk_tokens"], r["chunk_text"])
        for r in tq.q_doc_chunk(spark, str(tmp)).collect()
    }
    assert got == want


# ---- duplicated-n-gram fraction vs a pure-Python reference -----------------


def _ref_dup_ngram(docs: dict, n: int, min_df: int) -> dict:
    """Pure-Python oracle for q_doc_dup_ngram_frac's contract: per doc,
    count n-gram occurrences and how many of them have corpus document
    frequency >= min_df (distinct docs containing the n-gram)."""
    from collections import Counter

    grams = {
        d: [tuple(t[i:i + n]) for i in range(len(t) - n + 1)]
        for d, t in docs.items()
    }
    df = Counter()
    for gs in grams.values():
        for g in set(gs):
            df[g] += 1
    out = {}
    for d, gs in grams.items():
        n_dup = sum(1 for g in gs if df[g] >= min_df)
        out[d] = (len(gs), n_dup)
    return out


@_SETTINGS
@given(docs=phrase_docs_strategy)
def test_dup_ngram_frac_matches_reference(spark, docs, tmp_path_factory,
                                          monkeypatch):
    """For ANY phrase-pool corpus, the distributed duplicated-n-gram
    fraction equals the sequential reference exactly — including empty
    docs, docs shorter than n (NULL fraction), within-doc repeats
    (occurrences counted, df deduped per doc), and cross-doc
    boilerplate."""
    from sec_xbrl_finwarehouse_spark.plans import corpus_queries as cq

    monkeypatch.setattr(cq, "DUP_NGRAM_N", 3)
    flat = {i: [t for chunk in d for t in chunk] for i, d in enumerate(docs)}
    tmp = tmp_path_factory.mktemp("dupngram")
    spark.createDataFrame(
        [(i, " ".join(ts)) for i, ts in flat.items()],
        "doc_id long, text string",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp / "documents.parquet")
    )
    want = _ref_dup_ngram(flat, 3, cq.DUP_NGRAM_MIN_DF)
    got = {
        r["doc_id"]: r
        for r in cq.q_doc_dup_ngram_frac(spark, str(tmp)).collect()
    }
    assert set(got) == set(want)
    for d, (n_g, n_dup) in want.items():
        r = got[d]
        assert (r["n_ngrams"], r["n_dup"]) == (n_g, n_dup), (d, r)
        if n_g == 0:
            assert r["dup_frac"] is None
        else:
            assert abs(r["dup_frac"] - n_dup / n_g) < 1e-6


# ---- WebDataset writer/reader round-trip -----------------------------------

_WDS_KEYS = st.builds(
    lambda d, b: f"{d}/{b}" if d else b,
    st.one_of(st.just(""), st.sampled_from(["dir", "dir.v2", "a/b"])),
    st.text(alphabet="abc012_-", min_size=1, max_size=6),
)

wds_members_strategy = st.dictionaries(
    _WDS_KEYS,
    st.dictionaries(
        st.sampled_from(["jpg", "txt", "json", "seg.png"]),
        st.binary(min_size=0, max_size=64),
        min_size=1, max_size=3,
    ),
    min_size=1, max_size=8,
)


@_SETTINGS
@given(samples=wds_members_strategy)
def test_webdataset_write_read_round_trip(spark, samples, tmp_path_factory):
    """For ANY member frame with round-trippable keys (dot-free
    basenames, dotted directories allowed), write -> read returns
    exactly the input samples: every key in one shard, every ext ->
    payload map intact, byte-for-byte."""
    from sec_xbrl_finwarehouse_spark.sources.webdataset import (
        read_webdataset_samples,
        write_webdataset_shards,
    )

    rows = [
        (key, ext, payload)
        for key, parts in samples.items()
        for ext, payload in parts.items()
    ]
    df = spark.createDataFrame(rows, "key string, ext string, payload binary")
    out = str(tmp_path_factory.mktemp("wdsprop") / "out")
    manifest = write_webdataset_shards(df, out, n_shards=3).collect()
    assert sum(r["n_samples"] for r in manifest) == len(samples)
    assert sum(r["n_members"] for r in manifest) == len(rows)
    back = {
        r["key"]: dict(r["parts"])
        for r in read_webdataset_samples(spark, f"{out}/*.tar").collect()
    }
    assert back == samples


kmv_batches = st.lists(
    st.lists(
        st.tuples(st.sampled_from(["g1", "g2"]), st.integers(0, 200)),
        min_size=0, max_size=40,
    ),
    min_size=1, max_size=4,
)


@given(batches=kmv_batches, order=st.randoms(use_true_random=False))
@_SETTINGS
def test_kmv_merge_is_order_and_replay_invariant(spark, batches, order):
    """The semilattice property streaming/kmv_stream.py's delivery
    story rests on, under generated inputs: merging batches in ANY
    order, with ANY batch replayed, yields the same sketch as one
    merge of everything -- including empty batches, duplicate values
    within and across batches, and groups that never reach k."""
    from sec_xbrl_finwarehouse_spark.streaming.kmv_stream import (
        SKETCH_SCHEMA,
        hashes_of,
        merge_kmv_sketch,
    )

    k = 8  # small k so generated data crosses the truncation boundary

    def frame(rows):
        return hashes_of(
            spark.createDataFrame(rows, "g string, u long")
            if rows else
            spark.createDataFrame([], "g string, u long"),
            "g", "u",
        )

    empty = spark.createDataFrame([], SKETCH_SCHEMA)
    # incremental, shuffled order, with the first batch replayed at the end
    sequence = list(batches)
    order.shuffle(sequence)
    sequence.append(batches[0])
    acc = empty
    for b in sequence:
        acc = merge_kmv_sketch(acc, frame(b), k)
    got = sorted(map(tuple, acc.collect()))
    # one-shot reference over the concatenation
    all_rows = [r for b in batches for r in b]
    want = sorted(map(tuple, merge_kmv_sketch(empty, frame(all_rows), k).collect()))
    assert got == want


cm_batches = st.lists(
    st.lists(
        st.tuples(st.sampled_from(["g1", "g2"]), st.integers(0, 50)),
        min_size=0, max_size=30,
    ),
    min_size=1, max_size=4,
)


@given(batches=cm_batches, order=st.randoms(use_true_random=False))
@_SETTINGS
def test_cm_merge_is_order_invariant_and_exactly_additive(
    spark, batches, order
):
    """The monoid property streaming/cm_stream.py's watermark story
    rests on, under generated inputs: merging batches in ANY order
    yields the same counters as one merge of everything (commutative +
    associative), the total count equals d x the row count exactly
    (every row increments exactly CM_D cells), and -- the flip side
    the watermark exists for -- replaying a batch visibly inflates its
    cells (addition is NOT idempotent)."""
    from sec_xbrl_finwarehouse_spark.plans.events_queries import CM_D
    from sec_xbrl_finwarehouse_spark.streaming.cm_stream import (
        CM_SCHEMA,
        cells_of,
        merge_cm,
    )

    def frame(rows):
        return cells_of(
            spark.createDataFrame(rows, "g string, u long")
            if rows else
            spark.createDataFrame([], "g string, u long"),
            "g", "u",
        )

    empty = spark.createDataFrame([], CM_SCHEMA)
    sequence = list(batches)
    order.shuffle(sequence)
    acc = empty
    for b in sequence:
        acc = merge_cm(acc, frame(b))
    got = sorted(map(tuple, acc.collect()))
    all_rows = [r for b in batches for r in b]
    want = sorted(map(tuple, merge_cm(empty, frame(all_rows)).collect()))
    assert got == want
    assert sum(c for *_, c in got) == len(all_rows) * CM_D
    if all_rows:
        replayed = merge_cm(acc, frame(batches[0]))
        n2 = replayed.agg(F.sum("c")).collect()[0][0]
        assert n2 == (len(all_rows) + len(batches[0])) * CM_D


ams_counts = st.lists(st.integers(1, 9), min_size=1, max_size=6)


@given(counts=ams_counts)
@_SETTINGS
def test_ams_single_user_types_estimate_exactly(spark, counts, tmp_path_factory):
    """AMS degenerate exactness under generated inputs: when every
    event_type holds ONE distinct user, every estimator is Z_j = ±n so
    the median-of-means estimate equals F2 = n^2 exactly, whatever n.
    (The generated corpus varies n per type; user ids vary so the sign
    patterns differ across types -- exactness must hold regardless.)"""
    from sec_xbrl_finwarehouse_spark.plans.events_queries import (
        q_event_ams_f2,
    )

    tmp = tmp_path_factory.mktemp("ams")
    rows = []
    eid = 0
    for t, n in enumerate(counts):
        for _ in range(n):
            rows.append((eid, 1000 + t * 7, f"type_{t}", None, 1.0))
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, "
        "ts timestamp, value double",
    ).write.mode("overwrite").parquet(str(tmp / "events.parquet"))
    got = {r["event_type"]: r for r in q_event_ams_f2(spark, str(tmp)).collect()}
    assert len(got) == len(counts)
    for t, n in enumerate(counts):
        r = got[f"type_{t}"]
        assert r["f2_exact"] == n * n
        assert r["ams_estimate"] == float(n * n)
        assert r["rel_err"] == 0.0
