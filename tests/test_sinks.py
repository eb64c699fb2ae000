"""Stored-table sink tests: S5/S6 as writes, write-then-swap, F12
audit timestamps, and the re-ingest idempotence contract round-tripped
through parquet (VERDICT r1 "What's missing" #1/#3)."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from sec_xbrl_finwarehouse_spark import sinks


def _rows(spark, df_path):
    return {
        tuple(r) for r in
        sinks.read_table(spark, df_path)
        .select("k", "v").orderBy("k").collect()
    }


def _mk(spark, pairs):
    return spark.createDataFrame([{"k": k, "v": v} for k, v in pairs])


def test_write_replace_swaps_atomically(spark, tmp_path):
    path = str(tmp_path / "t")
    sinks.write_replace(_mk(spark, [(1, "a")]), path)
    assert _rows(spark, path) == {(1, "a")}
    sinks.write_replace(_mk(spark, [(2, "b")]), path)
    assert _rows(spark, path) == {(2, "b")}
    # no staging/backup litter left behind
    assert [p for p in os.listdir(tmp_path) if "__" in p] == []


def test_write_replace_self_overwrite_safe(spark, tmp_path):
    """Rebuilding a table FROM ITSELF (the reference's mart refresh shape)
    must not hit Spark's cannot-overwrite-input-path trap."""
    path = str(tmp_path / "t")
    sinks.write_replace(_mk(spark, [(1, "a"), (2, "b")]), path)
    derived = sinks.read_table(spark, path).withColumn("v", F.upper("v"))
    sinks.write_replace(derived, path)
    assert _rows(spark, path) == {(1, "A"), (2, "B")}


def test_upsert_creates_then_merges(spark, tmp_path):
    path = str(tmp_path / "t")
    sinks.upsert(spark, path, _mk(spark, [(1, "a"), (2, "b")]), ["k"])
    sinks.upsert(spark, path, _mk(spark, [(2, "B2"), (3, "c")]), ["k"])
    assert _rows(spark, path) == {(1, "a"), (2, "B2"), (3, "c")}


def test_upsert_audit_semantics(spark, tmp_path):
    """created_at survives an overwrite; updated_at refreshes only for
    upserted keys (db/schema.sql:61, build_statements_annual_v3.py:175)."""
    path = str(tmp_path / "t")
    sinks.upsert(spark, path, _mk(spark, [(1, "a"), (2, "b")]), ["k"])
    first = {r["k"]: r for r in sinks.read_table(spark, path).collect()}
    assert all(r[sinks.CREATED_AT] == r[sinks.UPDATED_AT] for r in first.values())

    sinks.upsert(spark, path, _mk(spark, [(2, "B2")]), ["k"])
    second = {r["k"]: r for r in sinks.read_table(spark, path).collect()}
    # untouched key: both stamps unchanged
    assert second[1][sinks.CREATED_AT] == first[1][sinks.CREATED_AT]
    assert second[1][sinks.UPDATED_AT] == first[1][sinks.UPDATED_AT]
    # upserted key: created_at preserved, updated_at advanced
    assert second[2][sinks.CREATED_AT] == first[2][sinks.CREATED_AT]
    assert second[2][sinks.UPDATED_AT] >= first[2][sinks.UPDATED_AT]
    assert second[2]["v"] == "B2"


def test_upsert_reingest_idempotent(spark, tmp_path):
    """Running the same upsert batch twice leaves the same data rows as
    once (D2/SCD-0 re-ingest contract), now as a STORED table."""
    path = str(tmp_path / "t")
    batch = [(1, "a"), (2, "b"), (3, "c")]
    sinks.upsert(spark, path, _mk(spark, batch), ["k"])
    once = _rows(spark, path)
    sinks.upsert(spark, path, _mk(spark, batch), ["k"])
    twice = _rows(spark, path)
    assert once == twice == set(batch)
    # exactly one row per key (the merge never duplicates)
    assert sinks.read_table(spark, path).count() == 3


def test_append_if_absent_skips_existing_keys(spark, tmp_path):
    path = str(tmp_path / "t")
    sinks.append_if_absent(spark, path, _mk(spark, [(1, "a"), (2, "b")]), ["k"])
    n = sinks.append_if_absent(
        spark, path, _mk(spark, [(2, "CHANGED"), (3, "c")]), ["k"]
    )
    assert n > 0
    # key 2 keeps its ORIGINAL value: conflict -> DO NOTHING
    assert _rows(spark, path) == {(1, "a"), (2, "b"), (3, "c")}


def test_append_if_absent_pure_duplicate_is_noop(spark, tmp_path):
    """Re-running an identical batch commits zero files and leaves the
    table byte-identical (ingest_facts.py:119-143 idempotence)."""
    path = str(tmp_path / "t")
    batch = _mk(spark, [(1, "a"), (2, "b")])
    sinks.append_if_absent(spark, path, batch, ["k"])
    files_before = sorted(os.listdir(path))
    stamps_before = {
        r["k"]: (r[sinks.CREATED_AT], r[sinks.UPDATED_AT])
        for r in sinks.read_table(spark, path).collect()
    }
    n = sinks.append_if_absent(spark, path, batch, ["k"])
    assert n == 0
    assert sorted(os.listdir(path)) == files_before
    stamps_after = {
        r["k"]: (r[sinks.CREATED_AT], r[sinks.UPDATED_AT])
        for r in sinks.read_table(spark, path).collect()
    }
    assert stamps_after == stamps_before


def test_append_if_absent_dedups_within_batch(spark, tmp_path):
    path = str(tmp_path / "t")
    sinks.append_if_absent(
        spark, path, _mk(spark, [(1, "a"), (1, "a"), (2, "b")]), ["k"]
    )
    assert sinks.read_table(spark, path).count() == 2


def test_compact_reduces_files_preserves_rows(spark, tmp_path):
    from sec_xbrl_finwarehouse_spark.sinks import compact

    path = str(tmp_path / "t.parquet")
    df = spark.range(0, 10_000).withColumn("v", F.col("id") * 2)
    df.repartition(24).write.parquet(path)  # legacy flat layout on purpose
    import glob
    before = len(glob.glob(f"{path}/*.parquet"))
    assert before >= 24
    n = compact(spark, path, target_file_bytes=1 << 30)  # everything -> 1 file
    after = glob.glob(f"{sinks.current_data_dir(path)}/*.parquet")
    assert n == 1 and len(after) == 1
    got = sinks.read_table(spark, path)
    assert got.count() == 10_000
    assert got.agg(F.sum("v")).first()[0] == df.agg(F.sum("v")).first()[0]


def test_reader_across_publish_sees_old_version_intact(spark, tmp_path):
    """A reader that resolved the manifest pointer BEFORE a publish must
    keep scanning the complete old version (never a mixed or half-swapped
    table) -- the VERDICT r4 item 7 contract. The previous version's
    files are retained through the next publish, so the in-flight plan
    still resolves every file it listed."""
    path = str(tmp_path / "t")
    sinks.write_replace(_mk(spark, [(1, "a"), (2, "b")]), path)
    pinned = sinks.read_table(spark, path)  # resolves pointer now
    sinks.write_replace(_mk(spark, [(3, "c")]), path)  # overlapping publish
    # the pinned reader sees the complete OLD table...
    assert {tuple(r) for r in pinned.select("k", "v").collect()} == {
        (1, "a"), (2, "b"),
    }
    # ...and a fresh resolve sees the complete NEW one
    assert _rows(spark, path) == {(3, "c")}


def test_publish_retains_exactly_one_prior_version(spark, tmp_path):
    path = str(tmp_path / "t")
    for i in range(4):
        sinks.write_replace(_mk(spark, [(i, "x")]), path)
    versions = [p for p in os.listdir(path) if p.startswith("v_")]
    assert len(versions) == 2  # current + previous, older ones pruned
    assert sinks.vacuum(path) == 1
    assert [p for p in os.listdir(path) if p.startswith("v_")] == [
        os.path.basename(sinks.current_data_dir(path))
    ]
    assert _rows(spark, path) == {(3, "x")}


def test_append_publishes_atomically_via_new_version(spark, tmp_path):
    """An append commits as a hard-linked new version + pointer swap: a
    reader pinned to the pre-append version never sees a partial batch."""
    path = str(tmp_path / "t")
    sinks.append_if_absent(spark, path, _mk(spark, [(1, "a")]), ["k"])
    pinned = sinks.read_table(spark, path)
    sinks.append_if_absent(spark, path, _mk(spark, [(2, "b"), (3, "c")]), ["k"])
    assert {r["k"] for r in pinned.collect()} == {1}       # old version
    assert _rows(spark, path) == {(1, "a"), (2, "b"), (3, "c")}  # new


def _mkp(spark, rows):
    """(k, v, part) rows for the partitioned-upsert tests."""
    return spark.createDataFrame(
        [{"k": k, "v": v, "part": p} for k, v, p in rows]
    )


def _pdirs(data_dir):
    return sorted(n for n in os.listdir(data_dir) if n.startswith("part="))


def _inodes(data_dir, pdir):
    d = os.path.join(data_dir, pdir)
    return {f: os.stat(os.path.join(d, f)).st_ino
            for f in os.listdir(d) if f.endswith(".parquet")}


def test_upsert_partitioned_rewrites_only_touched_partitions(spark, tmp_path):
    path = str(tmp_path / "t")
    n = sinks.upsert_partitioned(
        spark, path,
        _mkp(spark, [(1, "a", 10), (2, "b", 10), (3, "c", 20), (4, "d", 30)]),
        keys=["part", "k"], partition_col="part",
    )
    assert n == 3
    v1 = sinks.current_data_dir(path)
    assert _pdirs(v1) == ["part=10", "part=20", "part=30"]
    inodes_before = {p: _inodes(v1, p) for p in _pdirs(v1)}

    # second batch touches ONLY part=10 (update k=2, insert k=5)
    n = sinks.upsert_partitioned(
        spark, path, _mkp(spark, [(2, "B2", 10), (5, "e", 10)]),
        keys=["part", "k"], partition_col="part",
    )
    assert n == 1
    v2 = sinks.current_data_dir(path)
    assert v2 != v1
    got = {(r["k"], r["v"], r["part"])
           for r in sinks.read_table(spark, path).collect()}
    assert got == {(1, "a", 10), (2, "B2", 10), (5, "e", 10),
                   (3, "c", 20), (4, "d", 30)}
    # untouched partitions are the SAME inodes (hard links, no rewrite)
    assert _inodes(v2, "part=20") == inodes_before["part=20"]
    assert _inodes(v2, "part=30") == inodes_before["part=30"]
    # the touched partition was rewritten (all-new files)
    assert not (set(_inodes(v2, "part=10").values())
                & set(inodes_before["part=10"].values()))


def test_upsert_partitioned_new_partition_and_audit(spark, tmp_path):
    path = str(tmp_path / "t")
    sinks.upsert_partitioned(
        spark, path, _mkp(spark, [(1, "a", 10)]),
        keys=["part", "k"], partition_col="part",
    )
    first = {r["k"]: r for r in sinks.read_table(spark, path).collect()}
    n = sinks.upsert_partitioned(
        spark, path, _mkp(spark, [(1, "A2", 10), (9, "z", 99)]),
        keys=["part", "k"], partition_col="part",
    )
    assert n == 2  # part=10 rewritten, part=99 created
    rows = {r["k"]: r for r in sinks.read_table(spark, path).collect()}
    assert rows[1]["v"] == "A2" and rows[9]["part"] == 99
    # created_at preserved across the overwrite of k=1
    assert rows[1][sinks.CREATED_AT] == first[1][sinks.CREATED_AT]
    assert rows[1][sinks.UPDATED_AT] >= first[1][sinks.UPDATED_AT]


def test_upsert_partitioned_requires_partition_key(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError, match="must be one of keys"):
        sinks.upsert_partitioned(
            spark, str(tmp_path / "t"), _mkp(spark, [(1, "a", 10)]),
            keys=["k"], partition_col="part",
        )


def test_read_evolving_merges_additive_schemas(spark, tmp_path):
    from sec_xbrl_finwarehouse_spark.sinks import read_evolving

    p1 = str(tmp_path / "b1.parquet")
    p2 = str(tmp_path / "b2.parquet")
    spark.createDataFrame([(1, "a")], "id long, name string").write.parquet(p1)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    ).write.parquet(p2)
    got = read_evolving(spark, p1, p2).orderBy("id").collect()
    assert [r["id"] for r in got] == [1, 2]
    assert got[0]["score"] is None and got[1]["score"] == 9.5


def test_time_travel_versions(spark, tmp_path):
    """retain=N keeps a readable history: list_versions enumerates
    newest-first, read_table(version=...) reproduces each superseded
    snapshot exactly, and the retention window prunes the oldest."""
    from sec_xbrl_finwarehouse_spark.sinks import (
        list_versions, read_table, write_replace,
    )

    import pytest

    table = str(tmp_path / "tt_table")
    snapshots = []
    for i in range(4):
        df = spark.range(i + 1).withColumn("gen", F.lit(i))
        write_replace(df, table, retain=3)
        snapshots.append({tuple(r) for r in df.collect()})

    versions = list_versions(table)
    assert len(versions) == 3  # retention window pruned generation 0
    assert versions[0]["is_current"] and not versions[1]["is_current"]

    # newest-first maps onto generations 3, 2, 1
    for v, gen in zip(versions, (3, 2, 1)):
        got = {tuple(r) for r in read_table(
            spark, table, version=v["version"]
        ).collect()}
        assert got == snapshots[gen]

    with pytest.raises(FileNotFoundError):
        read_table(spark, table, version="v_nonexistent")


def test_table_changes_cdf(spark, tmp_path):
    """Change data feed between retained versions: inserts, updates
    (postimage), deletes (old image); unchanged keys not emitted; audit
    columns excluded from the comparison."""
    from sec_xbrl_finwarehouse_spark.sinks import (
        table_changes, write_replace,
    )

    table = str(tmp_path / "cdf_table")
    gen0 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k int, tag string, v double",
    )
    write_replace(gen0, table)
    assert table_changes(spark, table, ["k"]) is None  # no prior version

    gen1 = spark.createDataFrame(
        [(1, "a", 10.0),        # unchanged -> not emitted
         (2, "b", 99.0),        # update
         (4, "d", 40.0)],       # insert; k=3 deleted
        "k int, tag string, v double",
    )
    write_replace(gen1, table)

    changes = {r["k"]: r for r in
               table_changes(spark, table, ["k"]).collect()}
    assert set(changes) == {2, 3, 4}
    assert changes[2]["_change_type"] == "update_postimage"
    assert changes[2]["v"] == 99.0          # postimage carries NEW values
    assert changes[3]["_change_type"] == "delete"
    assert changes[3]["v"] == 30.0          # delete carries the OLD image
    assert changes[4]["_change_type"] == "insert"


def test_table_changes_ignores_audit_churn(spark, tmp_path):
    """An upsert that rewrites a key with IDENTICAL data refreshes
    updated_at; the CDF must not report it as a change."""
    from sec_xbrl_finwarehouse_spark.sinks import table_changes

    table = str(tmp_path / "cdf_audit")
    batch = spark.createDataFrame([(1, 5.0)], "k int, v double")
    sinks.upsert(spark, table, batch, keys=["k"])
    sinks.upsert(spark, table, batch, keys=["k"])  # no-op merge
    out = table_changes(spark, table, ["k"]).collect()
    assert out == []


def test_table_changes_round_trip(spark, tmp_path):
    """Applying the change feed to the PREVIOUS snapshot reproduces the
    CURRENT one exactly — the consumer contract of a CDF."""
    from sec_xbrl_finwarehouse_spark.sinks import (
        list_versions, read_table, table_changes, write_replace,
    )

    table = str(tmp_path / "cdf_rt")
    write_replace(spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0), (4, "d", 4.0)],
        "k int, tag string, v double"), table)
    write_replace(spark.createDataFrame(
        [(1, "a", 1.0), (2, "B", 2.5), (5, "e", 5.0)],
        "k int, tag string, v double"), table)

    prev_name = list_versions(table)[1]["version"]
    prev = read_table(spark, table, version=prev_name)
    feed = table_changes(spark, table, ["k"])

    deletes = feed.filter(F.col("_change_type") == "delete").select("k")
    upserts = feed.filter(F.col("_change_type") != "delete").drop("_change_type")
    rebuilt = (
        prev.join(deletes, "k", "left_anti")
        .join(upserts.select("k"), "k", "left_anti")  # drop stale rows
        .unionByName(upserts)
    )
    got = {tuple(r) for r in rebuilt.collect()}
    want = {tuple(r) for r in read_table(spark, table).collect()}
    assert got == want


def test_optimistic_concurrency_rejects_stale_commit(spark, tmp_path):
    """A writer whose read snapshot was superseded must fail its commit
    (ConcurrentWriteError), leave the winner's data intact, and clean
    up its staged version; a retry from a fresh read succeeds."""
    from sec_xbrl_finwarehouse_spark.sinks import (
        ConcurrentWriteError, EXPECT_ABSENT, current_data_dir,
        list_versions, read_table, write_replace,
    )
    import os as _os

    table = str(tmp_path / "occ_table")
    df_a = spark.createDataFrame([(1, "A")], "k int, who string")
    df_b = spark.createDataFrame([(2, "B")], "k int, who string")

    # creation race: both expect the table absent; second loses
    write_replace(df_a, table, expect_version=EXPECT_ABSENT)
    with pytest.raises(ConcurrentWriteError):
        write_replace(df_b, table, expect_version=EXPECT_ABSENT)
    assert {r["who"] for r in read_table(spark, table).collect()} == {"A"}

    # update race: writer reads v_a, another writer commits, stale
    # expectation must be rejected and its staged version dir removed
    v_a = _os.path.basename(current_data_dir(table))
    write_replace(df_b, table)  # interleaving writer (LWW)
    n_dirs_before = len(list_versions(table))
    with pytest.raises(ConcurrentWriteError):
        write_replace(df_a, table, expect_version=v_a)
    assert {r["who"] for r in read_table(spark, table).collect()} == {"B"}
    assert len(list_versions(table)) == n_dirs_before  # staged dir gone

    # retry against the CURRENT version succeeds
    v_now = _os.path.basename(current_data_dir(table))
    write_replace(df_a, table, expect_version=v_now)
    assert {r["who"] for r in read_table(spark, table).collect()} == {"A"}


def test_occ_upsert_retry_preserves_both_writers(spark, tmp_path):
    """The lost-update scenario OCC exists for: writer 2's merge was
    computed against a snapshot writer 1 replaced. With occ=True the
    stale merge errors instead of silently dropping writer 1's key;
    the retry merges against the fresh snapshot and BOTH keys survive."""
    from unittest.mock import patch

    from sec_xbrl_finwarehouse_spark import sinks as S

    table = str(tmp_path / "occ_upsert")
    S.upsert(spark, table, spark.createDataFrame(
        [(0, 0.0)], "k int, v double"), keys=["k"])

    w1 = spark.createDataFrame([(1, 1.0)], "k int, v double")
    w2 = spark.createDataFrame([(2, 2.0)], "k int, v double")

    # interleave: while writer 2 is between read and commit, writer 1
    # publishes. Emulate by injecting writer 1's upsert into writer 2's
    # post-read window via a patched merge hook.
    real_merge = S._merge_with_audit
    state = {"fired": False}

    def merge_then_interleave(existing, incoming, keys, audit):
        out = real_merge(existing, incoming, keys, audit)
        if not state["fired"]:
            state["fired"] = True
            S.upsert(spark, table, w1, keys=["k"])  # writer 1 wins the race
        return out

    with patch.object(S, "_merge_with_audit", merge_then_interleave):
        with pytest.raises(S.ConcurrentWriteError):
            S.upsert(spark, table, w2, keys=["k"], occ=True)

    # retry from a fresh snapshot: nothing lost
    S.upsert(spark, table, w2, keys=["k"], occ=True)
    got = {r["k"] for r in S.read_table(spark, table).collect()}
    assert got == {0, 1, 2}


def test_constraint_gate_rejects_bad_publish(spark, tmp_path):
    """Delta-style CHECK/unique gates: violations abort the publish
    (staged files removed, previous version still current); clean data
    passes. SQL CHECK semantics: a NULL condition result passes."""
    from sec_xbrl_finwarehouse_spark.sinks import (
        ConstraintViolation, current_data_dir, read_table, write_replace,
    )

    table = str(tmp_path / "gated")
    checks = [("non_negative", "v >= 0"),
              ("k_present", "k IS NOT NULL")]
    good = spark.createDataFrame(
        [(1, 1.0), (2, None), (3, 3.0)], "k int, v double")  # NULL v passes
    write_replace(good, table, checks=checks, unique_key=["k"])
    v_before = current_data_dir(table)

    bad_value = spark.createDataFrame(
        [(1, 1.0), (2, -5.0), (4, -1.0)], "k int, v double")
    with pytest.raises(ConstraintViolation) as ei:
        write_replace(bad_value, table, checks=checks, unique_key=["k"])
    assert ei.value.counts == {"non_negative": 2}

    dup_key = spark.createDataFrame(
        [(1, 1.0), (1, 2.0), (2, 2.0)], "k int, v double")
    with pytest.raises(ConstraintViolation) as ei:
        write_replace(dup_key, table, checks=checks, unique_key=["k"])
    assert ei.value.counts == {"unique(k)": 1}

    # table untouched by both rejected publishes; no staging left behind
    assert current_data_dir(table) == v_before
    assert read_table(spark, table).count() == 3
    import os as _os
    leftovers = [n for n in _os.listdir(tmp_path)
                 if n.startswith("gated.__staging__")]
    assert leftovers == []


def test_merge_three_clause(spark, tmp_path):
    """General MERGE: update / insert / conditional delete in one
    atomic publish, counts returned, audit semantics preserved."""
    from sec_xbrl_finwarehouse_spark.sinks import merge, read_table

    table = str(tmp_path / "merge_t")
    base = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)],
        "k int, tag string, v double",
    )
    out = merge(spark, table, base, on=["k"])
    assert out == {"updated": 0, "inserted": 3, "deleted": 0}
    created0 = {r["k"]: r["created_at"]
                for r in read_table(spark, table).collect()}

    src = spark.createDataFrame(
        [(2, "B", 20.0, False),   # update
         (3, "c", 3.0, True),     # matched + tombstone -> delete
         (4, "d", 40.0, False),   # insert
         (5, "e", 50.0, True)],   # tombstone for absent key -> skip
        "k int, tag string, v double, is_deleted boolean",
    )
    out = merge(spark, table, src, on=["k"],
                when_matched_delete="is_deleted")
    assert out == {"updated": 1, "inserted": 1, "deleted": 1}

    rows = {r["k"]: r for r in read_table(spark, table).collect()}
    assert set(rows) == {1, 2, 4}
    assert rows[2]["v"] == 20.0 and rows[2]["tag"] == "B"
    assert rows[2]["created_at"] == created0[2]  # carried through update
    assert rows[1]["updated_at"] == created0[1]  # untouched row unchanged

    # duplicate-key source is ambiguous -> error, table untouched
    dup = spark.createDataFrame(
        [(9, "x", 1.0), (9, "y", 2.0)], "k int, tag string, v double")
    with pytest.raises(ValueError):
        merge(spark, table, dup, on=["k"])
    assert set(r["k"] for r in read_table(spark, table).collect()) == {1, 2, 4}

    # insert-only mode (ON CONFLICT DO NOTHING semantics)
    src2 = spark.createDataFrame(
        [(2, "Z", 99.0), (6, "f", 6.0)], "k int, tag string, v double")
    out = merge(spark, table, src2, on=["k"], when_matched_update=False)
    rows = {r["k"]: r for r in read_table(spark, table).collect()}
    assert out["inserted"] == 1 and rows[2]["v"] == 20.0 and 6 in rows


# ---------------------------------------------------------------------------
# round-7/8 storage-bug regression tests: NULL-partition survival,
# no-orphan publish failures, typed DATE stats pruning, legacy-flat
# migration safety, NULL-key audit carry-over
# ---------------------------------------------------------------------------


def test_upsert_partitioned_null_partition_rows_survive(spark, tmp_path):
    """A NULL partition value lives under __HIVE_DEFAULT_PARTITION__ and
    the staged rewrite replaces that directory: without the NULL-safe
    membership arm the stored NULL rows were silently dropped by any
    later upsert touching the NULL partition."""
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [("a", 1, "x"), ("a", 2, "y"), (None, 3, "null-part")],
        "part string, id int, v string",
    )
    sinks.upsert_partitioned(spark, path, df, keys=["part", "id"],
                             partition_col="part")
    first = {(r["part"], r["id"]): r
             for r in sinks.read_table(spark, path).collect()}
    assert first[(None, 3)]["v"] == "null-part"

    # second batch updates the NULL partition AND adds a sibling row
    batch2 = spark.createDataFrame(
        [(None, 3, "null-part-v2"), (None, 4, "new-null")],
        "part string, id int, v string",
    )
    sinks.upsert_partitioned(spark, path, batch2, keys=["part", "id"],
                             partition_col="part")
    after = {(r["part"], r["id"]): r
             for r in sinks.read_table(spark, path).collect()}
    assert set(after) == {("a", 1), ("a", 2), (None, 3), (None, 4)}
    assert after[(None, 3)]["v"] == "null-part-v2"
    # NULL-key audit carry-over (eqNullSafe join): created_at survives
    assert after[(None, 3)][sinks.CREATED_AT] \
        == first[(None, 3)][sinks.CREATED_AT]
    assert after[(None, 3)][sinks.UPDATED_AT] \
        >= first[(None, 3)][sinks.UPDATED_AT]
    # untouched 'a' partition: bit-identical stamps
    assert after[("a", 1)][sinks.CREATED_AT] == first[("a", 1)][sinks.CREATED_AT]
    assert after[("a", 1)][sinks.UPDATED_AT] == first[("a", 1)][sinks.UPDATED_AT]


def _orphan_versions(path, known):
    return [n for n in os.listdir(path)
            if n.startswith("v_") and n not in known]


def test_failed_publish_leaves_no_orphan_version(spark, tmp_path, monkeypatch):
    """A publish failure AFTER the staged version dir is moved in
    (OSError from the pointer swap, manifest write, ...) must remove
    the v_<hex>: an orphan would be enumerated as the newest version by
    retain-pruning and time travel."""
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [("a", 1, "x"), ("b", 2, "y")], "part string, id int, v string"
    )
    sinks.upsert_partitioned(spark, path, df, keys=["part", "id"],
                             partition_col="part")
    committed = {v["version"] for v in sinks.list_versions(path)}
    before = {(r["part"], r["id"], r["v"])
              for r in sinks.read_table(spark, path).collect()}

    def boom(*a, **kw):
        raise OSError("disk full")

    monkeypatch.setattr(sinks, "_publish_version", boom)
    with pytest.raises(OSError):
        sinks.upsert_partitioned(
            spark, path,
            spark.createDataFrame([("a", 1, "X2")],
                                  "part string, id int, v string"),
            keys=["part", "id"], partition_col="part",
        )
    with pytest.raises(OSError):
        sinks.append_if_absent(
            spark, path,
            spark.createDataFrame([("c", 9, "z")],
                                  "part string, id int, v string"),
            keys=["part", "id"],
        )
    monkeypatch.undo()
    assert _orphan_versions(path, committed) == []
    assert {v["version"] for v in sinks.list_versions(path)} == committed
    assert {(r["part"], r["id"], r["v"])
            for r in sinks.read_table(spark, path).collect()} == before
    # no staging litter either
    assert [p for p in os.listdir(tmp_path) if "__staging__" in p] == []


def test_occ_mismatch_leaves_no_orphan_version(spark, tmp_path):
    """The genuine ConcurrentWriteError path (OCC expect-version
    mismatch) also removes the already-moved-in version directory."""
    path = str(tmp_path / "t")
    sinks.write_replace(_mk(spark, [(1, "a")]), path)
    committed = {v["version"] for v in sinks.list_versions(path)}
    with pytest.raises(sinks.ConcurrentWriteError):
        sinks.write_replace(_mk(spark, [(2, "b")]), path,
                            expect_version="v_nonexistent")
    assert _orphan_versions(path, committed) == []
    assert _rows(spark, path) == {(1, "a")}


def test_legacy_migration_failure_restores_flat_files(spark, tmp_path):
    """The one-time legacy-flat migration MOVES the only copy of the
    table into v_legacy_*; a commit failure there (held/stale lock)
    must move the files back, never delete them."""
    path = str(tmp_path / "t")
    # legacy layout: plain parquet at path, no _CURRENT pointer
    _mk(spark, [(1, "a"), (2, "b")]).write.parquet(path)
    flat_files = sorted(n for n in os.listdir(path)
                        if not n.startswith((".", "_")))
    os.makedirs(path, exist_ok=True)
    lock = os.path.join(path, "._COMMIT_LOCK")
    open(lock, "w").close()  # fresh lock: publishes time out at ~5 s
    try:
        with pytest.raises(sinks.ConcurrentWriteError):
            sinks.write_replace(_mk(spark, [(3, "c")]), path)
    finally:
        os.unlink(lock)
    # pre-migration data restored in place, still readable, no v_ dirs
    assert sorted(n for n in os.listdir(path)
                  if not n.startswith((".", "_"))) == flat_files
    got = {tuple(r) for r in spark.read.parquet(path)
           .select("k", "v").collect()}
    assert got == {(1, "a"), (2, "b")}
    assert [n for n in os.listdir(path) if n.startswith("v_")] == []
    # and the retry (lock released) migrates + publishes normally
    sinks.write_replace(_mk(spark, [(3, "c")]), path)
    assert _rows(spark, path) == {(3, "c")}
    assert any(n.startswith("v_legacy_") for n in os.listdir(path))


def test_read_table_pruned_date_stats(spark, tmp_path):
    """Typed (DATE) per-file stats must prune files correctly; a legacy
    stringified-stats manifest must never SKIP a file (pruning is an
    optimization, incomparable pairs read the file)."""
    import json

    path = str(tmp_path / "t")
    df = spark.sql(
        "SELECT sequence(to_date('2024-01-01'), to_date('2024-12-27'), "
        "interval 3 days) AS ds"
    ).selectExpr("explode(ds) AS d").withColumn("v", F.lit(1))
    sinks.write_replace(
        df.repartitionByRange(4, "d").sortWithinPartitions("d"),
        path, stats_cols=["d"],
    )
    import datetime

    lo, hi = datetime.date(2024, 6, 1), datetime.date(2024, 6, 30)
    pruned = sinks.read_table_pruned(spark, path, "d", lo=lo, hi=hi)
    want = {r["d"] for r in df.filter(
        (F.col("d") >= F.lit(lo)) & (F.col("d") <= F.lit(hi))).collect()}
    assert {r["d"] for r in pruned.collect()} == want
    # the June window fits one range partition: files were SKIPPED
    n_total = len([n for n in os.listdir(sinks.current_data_dir(path))
                   if n.endswith(".parquet")])
    assert len(pruned.inputFiles()) < n_total

    # legacy manifest: stats stringified (old default=str encoding)
    data_dir = sinks.current_data_dir(path)
    meta = os.path.join(data_dir, sinks.STATS_META)
    stats = json.loads(open(meta).read())
    legacy = {
        f: {c: [str(sinks._stat_decode(rng[0])),
                str(sinks._stat_decode(rng[1]))]
            for c, rng in cols.items()}
        for f, cols in stats.items()
    }
    open(meta, "w").write(json.dumps(legacy))
    fallback = sinks.read_table_pruned(spark, path, "d", lo=lo, hi=hi)
    assert {r["d"] for r in fallback.collect()} == want
    # nothing skipped: every file read (never mis-prune on str-vs-date)
    assert len(fallback.inputFiles()) == n_total


def test_restore_rolls_back_as_new_version(spark, tmp_path):
    """RESTORE: a retained superseded version becomes current again via
    a NEW hard-linked version (history grows, nothing is mutated); the
    provenance marker names the source; restoring current is rejected;
    an unretained name raises."""
    path = str(tmp_path / "t")
    v1 = spark.createDataFrame([(1, "good")], "id int, v string")
    v2 = spark.createDataFrame([(1, "bad"), (2, "oops")], "id int, v string")
    sinks.write_replace(v1, path, retain=3)
    good = next(x["version"] for x in sinks.list_versions(path)
                if x["is_current"])
    sinks.write_replace(v2, path, retain=3)
    assert {r["v"] for r in sinks.read_table(spark, path).collect()} == \
        {"bad", "oops"}

    new_v = sinks.restore(path, good)
    assert {r["v"] for r in sinks.read_table(spark, path).collect()} == \
        {"good"}
    cur = sinks.current_data_dir(path)
    assert os.path.basename(cur) == new_v != good
    with open(os.path.join(cur, "_restored_from"), encoding="utf-8") as f:
        assert f.read() == good
    # the restored-FROM version is still retained and identical
    assert {r["v"] for r in
            sinks.read_table(spark, path, version=good).collect()} == \
        {"good"}

    with pytest.raises(ValueError):
        sinks.restore(path, new_v)          # already current
    with pytest.raises(FileNotFoundError):
        sinks.restore(path, "v_nonexistent")


def test_clone_is_independent_zero_copy_table(spark, tmp_path):
    """SHALLOW CLONE: the clone serves the source's data immediately,
    carries provenance, and diverges independently -- a publish to the
    clone never changes the source and vice versa. Cloning onto an
    existing table is rejected."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    sinks.write_replace(
        spark.createDataFrame([(1, "a")], "id int, v string"), src
    )
    v = sinks.clone(src, dst)
    assert [r["v"] for r in sinks.read_table(spark, dst).collect()] == ["a"]
    cur = sinks.current_data_dir(dst)
    assert os.path.basename(cur) == v
    with open(os.path.join(cur, "_cloned_from"), encoding="utf-8") as f:
        assert f.read().startswith(src + "@v_")
    # divergence: write to the clone, source untouched (and vice versa)
    sinks.write_replace(
        spark.createDataFrame([(2, "clone-only")], "id int, v string"), dst
    )
    sinks.write_replace(
        spark.createDataFrame([(3, "src-only")], "id int, v string"), src
    )
    assert [r["v"] for r in sinks.read_table(spark, dst).collect()] == \
        ["clone-only"]
    assert [r["v"] for r in sinks.read_table(spark, src).collect()] == \
        ["src-only"]
    with pytest.raises(FileExistsError):
        sinks.clone(src, dst)
    with pytest.raises(FileNotFoundError):
        sinks.clone(str(tmp_path / "nope"), str(tmp_path / "d2"))


def test_clone_rejects_non_version_names(spark, tmp_path):
    """Only v_ version directories are cloneable: a staging dir or
    arbitrary subpath must never become a published table."""
    src = str(tmp_path / "src")
    sinks.write_replace(
        spark.createDataFrame([(1, "a")], "id int, v string"), src
    )
    os.mkdir(os.path.join(src, "_staging_deadbeef"))
    with pytest.raises(FileNotFoundError):
        sinks.clone(src, str(tmp_path / "d"), version="_staging_deadbeef")
    with pytest.raises(FileNotFoundError):
        sinks.clone(src, str(tmp_path / "d"), version="..")


def test_version_order_survives_mtime_scramble(spark, tmp_path):
    """Content-addressed history: version order comes from the _SEQ
    commit sequence persisted at publish, NOT directory mtime. An
    external copy of the whole table tree (cp/rsync -- every mtime
    rewritten, here deliberately scrambled to REVERSE creation order)
    must still enumerate versions correctly, time-travel to the right
    snapshots, diff the right pair in table_changes, and retain-prune
    the genuinely oldest version on the next publish."""
    import shutil as _sh
    import time as _time

    src = str(tmp_path / "orig")
    snapshots = []
    for i in range(3):
        df = spark.range(i + 1).withColumn("gen", F.lit(i))
        sinks.write_replace(df, src, retain=4)
        snapshots.append({tuple(r) for r in df.collect()})
    order_before = [v["version"] for v in sinks.list_versions(src)]

    # external copy + mtime scramble: newest version gets the OLDEST
    # mtime and vice versa -- an mtime sort would exactly reverse history
    dst = str(tmp_path / "copied")
    _sh.copytree(src, dst)
    now = _time.time()
    for rank, name in enumerate(order_before):
        os.utime(os.path.join(dst, name), (now - 9999 * (rank + 1),) * 2)

    versions = sinks.list_versions(dst)
    assert [v["version"] for v in versions] == order_before
    assert versions[0]["is_current"]
    assert [v["seq"] for v in versions] == [3, 2, 1]
    for v, gen in zip(versions, (2, 1, 0)):
        got = {tuple(r) for r in sinks.read_table(
            spark, dst, version=v["version"]).collect()}
        assert got == snapshots[gen]

    # CDF diffs current against the TRUE previous (gen1: ids 0,1), not
    # the mtime-youngest directory (gen0 after the scramble): id 2 is
    # the insert, ids 0/1 are gen-column updates. Against gen0 the set
    # would instead be {(1, insert), (2, insert), (0, update)}.
    changes = sinks.table_changes(spark, dst, ["id"]).collect()
    assert {(r["id"], r["_change_type"]) for r in changes} == \
        {(2, "insert"), (0, "update_postimage"), (1, "update_postimage")}

    # retain-prune on the copied table drops the genuinely oldest
    sinks.write_replace(
        spark.range(4).withColumn("gen", F.lit(3)), dst, retain=3)
    kept = [v["version"] for v in sinks.list_versions(dst)]
    assert len(kept) == 3
    assert order_before[-1] not in kept        # gen0 pruned
    assert set(order_before[:2]) <= set(kept)  # gen1, gen2 retained


# ---- property: version store under interleaved writers ---------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

# ops are interpreted by _run_version_store_schedule below
_op = st.one_of(
    st.tuples(st.just("upsert"),
              st.dictionaries(st.integers(0, 4), st.integers(0, 99),
                              min_size=1, max_size=3)),
    st.tuples(st.just("stale_write"),
              st.dictionaries(st.integers(0, 4), st.integers(0, 99),
                              min_size=1, max_size=3)),
    st.tuples(st.just("restore"), st.integers(0, 3)),
    st.tuples(st.just("vacuum"), st.just(0)),
)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(schedule=st.lists(_op, min_size=1, max_size=5))
def test_version_store_occ_schedule_no_lost_updates(spark, tmp_path_factory,
                                                    schedule):
    """Randomized interleavings of occ-upsert / stale-OCC-write /
    restore / vacuum against a sequential model: (1) a stale writer
    (its read snapshot superseded by an interloper's commit) ALWAYS
    fails with ConcurrentWriteError and changes nothing -- the
    interloper's update is never lost; (2) after every successful op
    the stored table equals the model exactly; (3) no operation --
    including the failed commits -- leaves an orphan v_* directory
    (every v_* on disk is the one the pointer or retention accounts
    for, and vacuum collapses history to exactly the current one)."""
    path = str(tmp_path_factory.mktemp("occ_sched") / "t")

    def df_of(d):
        return spark.createDataFrame(
            sorted(d.items()), "k int, v int")

    def table_dict():
        t = sinks.read_table(spark, path)
        return {} if t is None else {r["k"]: r["v"] for r in t.collect()}

    def v_dirs():
        if not os.path.exists(path):
            return set()
        return {n for n in os.listdir(path)
                if n.startswith("v_") and os.path.isdir(
                    os.path.join(path, n))}

    model: dict[int, int] = {}
    by_version: dict[str, dict[int, int]] = {}

    def record_current():
        cur = sinks.current_data_dir(path)
        if cur:
            by_version[os.path.basename(cur)] = dict(model)

    for op, arg in schedule:
        if op == "upsert":
            sinks.upsert(spark, path, df_of(arg), keys=["k"],
                         audit=False, occ=True, retain=4)
            model.update(arg)
            record_current()
        elif op == "stale_write":
            # writer A resolves its snapshot ...
            cur = sinks.current_data_dir(path)
            stale = sinks.EXPECT_ABSENT if cur is None \
                else os.path.basename(cur)
            # ... interloper B commits first (this update must survive)
            interloper = {k: v + 1000 for k, v in arg.items()}
            sinks.upsert(spark, path, df_of(interloper), keys=["k"],
                         audit=False, occ=True, retain=4)
            model.update(interloper)
            record_current()
            dirs_before = v_dirs()
            # ... A's commit against the superseded snapshot must fail
            # atomically: no data change, no orphan staged version
            with pytest.raises(sinks.ConcurrentWriteError):
                sinks.write_replace(df_of(arg), path, retain=4,
                                    expect_version=stale)
            assert v_dirs() == dirs_before
        elif op == "restore":
            targets = [v["version"] for v in sinks.list_versions(path)
                       if not v["is_current"] and v["version"] in by_version]
            if not targets:
                continue
            target = targets[arg % len(targets)]
            new_v = sinks.restore(path, target)
            model = dict(by_version[target])
            by_version[new_v] = dict(model)
        elif op == "vacuum":
            if sinks.current_data_dir(path) is None:
                continue
            sinks.vacuum(path)
            assert len(v_dirs()) == 1
        assert table_dict() == model
        # no orphans: every v_* directory on disk is enumerated by the
        # version catalog (an orphan would corrupt retain accounting)
        assert v_dirs() == {v["version"] for v in sinks.list_versions(path)}


def test_prune_spares_young_unstamped_dirs_reclaims_old(spark, tmp_path):
    """The post-commit retain-prune must NOT delete an unstamped v_ dir
    that is young enough to be a concurrent writer's staged-but-not-yet-
    committed version (under _SEQ ordering it sorts OLDEST, so the old
    prune would destroy an in-flight publish mid-commit), while an
    unstamped dir older than the grace window -- pre-_SEQ legacy debris
    -- is still reclaimed."""
    path = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a")], "k int, v string")
    sinks.write_replace(df, path)

    staged = os.path.join(path, "v_inflight_stage")
    os.makedirs(staged)
    with open(os.path.join(staged, "part-0.parquet"), "wb") as fh:
        fh.write(b"staged")

    # young unstamped dir: survives a publish's prune
    sinks.write_replace(df, path)
    sinks.write_replace(df, path)
    assert os.path.isdir(staged), "in-flight staged version was pruned"

    # backdate past the grace window: now it is legacy debris
    old = __import__("time").time() - sinks._STAGE_GRACE_SEC - 10
    os.utime(staged, (old, old))
    sinks.write_replace(df, path)
    assert not os.path.isdir(staged)
    # and the committed current version is intact
    assert sinks.read_table(spark, path).count() == 1


def test_replace_where_moves_rows_and_drops_partitions(spark, tmp_path):
    """r10 storage primitive: a reorganization can DROP partition
    values and MOVE rows to new ones -- kept partitions hard-link,
    dropped directories disappear, the publish is atomic, and an empty
    incoming under non-empty values is refused (never a silent
    deletion)."""
    path = str(tmp_path / "t")
    sinks.upsert_partitioned(
        spark, path,
        _mkp(spark, [(1, "a", 10), (2, "b", 10), (3, "c", 20),
                     (4, "d", 30)]),
        keys=["part", "k"], partition_col="part", audit=False,
    )
    v1 = sinks.current_data_dir(path)
    inodes_before = {p: _inodes(v1, p) for p in _pdirs(v1)}

    # split part=10 into part=101/part=102 (rows MOVE partition)
    n = sinks.replace_where(
        spark, path, "part", [10],
        _mkp(spark, [(1, "a", 101), (2, "b", 102)]),
        manifest_extra={"_reorg": "10->101,102"},
    )
    assert n == 2
    v2 = sinks.current_data_dir(path)
    assert _pdirs(v2) == ["part=101", "part=102", "part=20", "part=30"]
    got = {(r["k"], r["v"], r["part"])
           for r in sinks.read_table(spark, path).collect()}
    assert got == {(1, "a", 101), (2, "b", 102), (3, "c", 20),
                   (4, "d", 30)}
    # untouched partitions: same inodes (hard links)
    assert _inodes(v2, "part=20") == inodes_before["part=20"]
    assert _inodes(v2, "part=30") == inodes_before["part=30"]
    # manifest extra committed atomically with the version
    assert sinks.read_version_meta(path, "_reorg") == "10->101,102"
    # the pre-reorg version is retained and time-travels intact
    old = os.path.basename(v1)
    back = {(r["k"], r["part"]) for r in
            sinks.read_table(spark, path, version=old).collect()}
    assert back == {(1, 10), (2, 10), (3, 20), (4, 30)}

    # incoming may also overwrite an EXISTING partition it targets
    sinks.replace_where(
        spark, path, "part", [], _mkp(spark, [(9, "z", 20)])
    )
    got = {(r["k"], r["part"])
           for r in sinks.read_table(spark, path).collect()}
    assert got == {(1, 101), (2, 102), (9, 20), (4, 30)}

    # empty incoming + non-empty values: refused, table unchanged
    cur = sinks.current_data_dir(path)
    with pytest.raises(ValueError, match="silent partition deletion"):
        sinks.replace_where(
            spark, path, "part", [30],
            _mkp(spark, [(1, "a", 10)]).filter("k > 100"),
        )
    assert sinks.current_data_dir(path) == cur


def test_replace_where_occ_and_meta_carry_forward(spark, tmp_path):
    """r11 (ADVICE): replace_where is a read-modify-write, so (a) a
    publish racing in between the reorganizer's snapshot and its commit
    must surface as ConcurrentWriteError when the snapshot version is
    pinned via expect_version, and (b) the previous version's commit
    metadata (txn markers, watermarks) rides the reorg -- overlaid by
    manifest_extra -- while _FILE_STATS (stale for changed files) is
    dropped."""
    path = str(tmp_path / "t")
    sinks.upsert_partitioned(
        spark, path, _mkp(spark, [(1, "a", 10), (3, "c", 20)]),
        keys=["part", "k"], partition_col="part", audit=False,
        manifest_extra={"_watermark": "w1", "_keepme": "v0"},
    )
    # plant a stats manifest on the current version: it must NOT ride
    with open(os.path.join(sinks.current_data_dir(path),
                           sinks.STATS_META), "w") as f:
        f.write("{}")
    v1 = os.path.basename(sinks.current_data_dir(path))

    # (b) pinned reorg commits, carrying meta with overlay
    sinks.replace_where(
        spark, path, "part", [10], _mkp(spark, [(1, "a", 101)]),
        manifest_extra={"_watermark": "w2"}, expect_version=v1,
    )
    assert sinks.read_version_meta(path, "_watermark") == "w2"  # overlay
    assert sinks.read_version_meta(path, "_keepme") == "v0"     # carried
    assert sinks.read_version_meta(path, sinks.STATS_META) is None
    v2 = sinks.current_data_dir(path)

    # (a) a reorg still pinned to the superseded snapshot must fail --
    # the torn-merge guard -- and leave the winner's version current
    with pytest.raises(sinks.ConcurrentWriteError):
        sinks.replace_where(
            spark, path, "part", [20],
            _mkp(spark, [(3, "c", 202)]), expect_version=v1,
        )
    assert sinks.current_data_dir(path) == v2  # loser left no trace
    got = {(r["k"], r["part"])
           for r in sinks.read_table(spark, path).collect()}
    assert got == {(1, 101), (3, 20)}


def test_upsert_partitioned_occ_rejects_racing_publish(spark, tmp_path):
    """occ=True / occ=<version> turn the partitioned upsert into an
    optimistic read-modify-write: a publish that raced in after the
    caller's read fails the commit (ConcurrentWriteError), the table
    keeps the other writer's version."""
    path = str(tmp_path / "t")
    sinks.upsert_partitioned(
        spark, path, _mkp(spark, [(1, "a", 10)]),
        keys=["part", "k"], partition_col="part", audit=False,
    )
    v1 = os.path.basename(sinks.current_data_dir(path))
    # another writer publishes
    sinks.upsert_partitioned(
        spark, path, _mkp(spark, [(2, "b", 20)]),
        keys=["part", "k"], partition_col="part", audit=False,
    )
    v2 = sinks.current_data_dir(path)
    # a commit pinned to the superseded version must fail...
    with pytest.raises(sinks.ConcurrentWriteError):
        sinks.upsert_partitioned(
            spark, path, _mkp(spark, [(3, "c", 30)]),
            keys=["part", "k"], partition_col="part", audit=False,
            occ=v1,
        )
    assert sinks.current_data_dir(path) == v2  # loser left no trace
    # ...and occ=True (expect what THIS call reads) still commits
    sinks.upsert_partitioned(
        spark, path, _mkp(spark, [(3, "c", 30)]),
        keys=["part", "k"], partition_col="part", audit=False, occ=True,
    )
    got = {(r["k"], r["part"])
           for r in sinks.read_table(spark, path).collect()}
    assert got == {(1, 10), (2, 20), (3, 30)}
