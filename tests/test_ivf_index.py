"""Stored IVF index tests: build (partitionBy cell) + probe with
partition pruning, results identical to the single-DAG IVF query."""

from __future__ import annotations

import os

from sec_xbrl_finwarehouse_spark.plans import embedding_queries as eq

SF_DIR = "/root/testdata/sf0.001"


def test_ivf_index_probe_matches_inline_query(spark, tmp_path):
    idx = str(tmp_path / "ivf")
    eq.build_ivf_index(spark, SF_DIR, idx)
    # layout: one directory per coarse cell
    cells = [d for d in os.listdir(f"{idx}/corpus") if d.startswith("cell=")]
    assert len(cells) > 1

    stored = eq.q_emb_ivf_index_probe(spark, SF_DIR, idx)
    inline = eq.q_emb_ivf_ann_topk(spark, SF_DIR)
    assert sorted(map(tuple, stored.collect())) == sorted(
        map(tuple, inline.collect())
    )


def test_ivf_probe_prunes_partitions(spark, tmp_path):
    """The stored-corpus scan must carry a runtime pruning filter on the
    cell partition column (dynamic partition pruning from the broadcast
    probe join) -- i.e. only probed cell directories are read."""
    idx = str(tmp_path / "ivf")
    eq.build_ivf_index(spark, SF_DIR, idx)
    df = eq.q_emb_ivf_index_probe(spark, SF_DIR, idx)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan


def test_ivfpq_index_probe_matches_inline_query(spark, tmp_path):
    idx = str(tmp_path / "ivfpq")
    eq.build_ivfpq_index(spark, SF_DIR, idx)
    cells = [d for d in os.listdir(f"{idx}/codes") if d.startswith("cell=")]
    assert len(cells) > 1

    stored = eq.q_emb_ivfpq_index_probe(spark, SF_DIR, idx)
    inline = eq.q_emb_ivf_pq_ann_topk(spark, SF_DIR)
    assert sorted(map(tuple, stored.collect())) == sorted(
        map(tuple, inline.collect())
    )


def test_ivfpq_probe_prunes_partitions(spark, tmp_path):
    """The stored codes scan must carry a runtime pruning filter on the
    cell partition column -- only probed cell directories are read."""
    idx = str(tmp_path / "ivfpq")
    eq.build_ivfpq_index(spark, SF_DIR, idx)
    df = eq.q_emb_ivfpq_index_probe(spark, SF_DIR, idx)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan


def _half_corpus_dirs(spark, tmp_path):
    """Split the sf0.001 embeddings into two corpus halves (queries,
    vec_id < N_QUERIES, stay in BOTH so probes work), written as two
    sf-style dirs."""
    from pyspark.sql import functions as F

    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    ids = sorted(
        r[0] for r in
        e.filter(F.col("vec_id") >= eq.N_QUERIES).select("vec_id").collect()
    )
    cut = ids[len(ids) // 2]
    dirs = []
    for i, pred in enumerate([
        (F.col("vec_id") < eq.N_QUERIES) | (F.col("vec_id") < cut),
        (F.col("vec_id") < eq.N_QUERIES) | (F.col("vec_id") >= cut),
    ]):
        d = tmp_path / f"half{i}"
        d.mkdir()
        e.filter(pred).write.parquet(str(d / "embeddings.parquet"))
        dirs.append(str(d))
    return dirs, cut


def test_ivf_append_matches_rebuild_under_fixed_quantizer(spark, tmp_path):
    """Incremental maintenance contract: build the index from the first
    corpus half (its centroids are the trained quantizer), append the
    second half -- probes must equal an index whose corpus was FULLY
    assigned under the SAME fixed quantizer. Appends are idempotent
    (replaying the batch appends zero vectors) and touch only the
    assigned cells' directories (untouched cell dirs keep their exact
    file lists -- the 100 TB no-rewrite claim, asserted on disk)."""
    from pyspark.sql import functions as F

    (half1, half2), cut = _half_corpus_dirs(spark, tmp_path)
    idx = str(tmp_path / "ivf_inc")
    eq.build_ivf_index(spark, half1, idx)

    batch = (
        spark.read.parquet(f"{half2}/embeddings.parquet")
        .filter(F.col("vec_id") >= eq.N_QUERIES)
        .select(F.col("vec_id").alias("neighbor_id"),
                F.col("embedding").cast("array<double>").alias("emb"))
    )
    # per-cell file lists before the append
    files_before = {}
    for d in os.listdir(f"{idx}/corpus"):
        if d.startswith("cell="):
            files_before[d] = sorted(os.listdir(f"{idx}/corpus/{d}"))
    # which cells the batch lands in (recomputed the same way the
    # appender assigns -- fixed stored quantizer)
    cent = spark.read.parquet(f"{idx}/centroids")
    touched = {
        f"cell={r['cell']}" for r in batch.crossJoin(eq._cells_one_row(cent))
        .select(eq._nearest_cells(F.col("emb"), 1)[0]["cell"].alias("cell"))
        .distinct().collect()
    }

    n1 = eq.append_ivf_index(spark, idx, batch)
    assert n1 == batch.count()
    # idempotent replay
    assert eq.append_ivf_index(spark, idx, batch) == 0

    # untouched cells: byte-identical file lists
    for d, before in files_before.items():
        if d not in touched:
            assert sorted(os.listdir(f"{idx}/corpus/{d}")) == before, d

    # reference: full corpus assigned under the SAME (half1-trained)
    # quantizer, written fresh
    ref = str(tmp_path / "ivf_ref")
    full = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .filter(F.col("vec_id") >= eq.N_QUERIES)
        .select(F.col("vec_id").alias("neighbor_id"),
                F.col("embedding").cast("array<double>").alias("emb"))
        .crossJoin(eq._cells_one_row(cent))
        .select("neighbor_id", "emb",
                eq._nearest_cells(F.col("emb"), 1)[0]["cell"].alias("cell"))
    )
    os.makedirs(ref)
    full.write.partitionBy("cell").parquet(f"{ref}/corpus")
    cent.write.parquet(f"{ref}/centroids")

    got = sorted(map(tuple, eq.q_emb_ivf_index_probe(spark, SF_DIR, idx).collect()))
    want = sorted(map(tuple, eq.q_emb_ivf_index_probe(spark, SF_DIR, ref).collect()))
    assert got == want and len(got) > 0


def test_streaming_ivf_ingest_end_to_end(spark, tmp_path):
    """readStream -> foreach_batch_ivf_append: vectors arriving across
    micro-batches all land exactly once (the anti-join idempotence
    makes at-least-once delivery safe with no watermark), and the final
    index probes identically to a single batch append of everything."""
    from pyspark.sql import functions as F

    from sec_xbrl_finwarehouse_spark.streaming.ivf_ingest import (
        foreach_batch_ivf_append,
    )

    (half1, half2), _ = _half_corpus_dirs(spark, tmp_path)
    idx = str(tmp_path / "ivf_stream")
    eq.build_ivf_index(spark, half1, idx)
    before = spark.read.parquet(f"{idx}/corpus").count()

    src = tmp_path / "src"
    src.mkdir()
    batch = (
        spark.read.parquet(f"{half2}/embeddings.parquet")
        .filter(F.col("vec_id") >= eq.N_QUERIES)
        .select("vec_id", "embedding")
    )
    rows = batch.collect()
    mid = len(rows) // 2
    for i, chunk in enumerate([rows[:mid], rows[mid:]]):
        spark.createDataFrame(chunk, batch.schema).coalesce(1) \
            .write.parquet(str(src / f"b{i}.parquet"))

    q = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*/")
        .writeStream.foreachBatch(foreach_batch_ivf_append(idx))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not finish within 180 s"
    stored = spark.read.parquet(f"{idx}/corpus")
    assert stored.count() == before + len(rows)
    assert stored.select("neighbor_id").distinct().count() == stored.count()
    # replaying the whole source through a fresh stream adds nothing
    q2 = (
        spark.readStream.schema(batch.schema)
        .parquet(str(src) + "/*/")
        .writeStream.foreachBatch(foreach_batch_ivf_append(idx))
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    assert q2.awaitTermination(180)
    assert spark.read.parquet(f"{idx}/corpus").count() == before + len(rows)


def test_versioned_ivf_index_time_travel_probe(spark, tmp_path):
    """The versioned index contract: build from half 1 (v1), append
    half 2 (v2) -- the CURRENT probe equals the plain-layout index over
    the same fixed-quantizer corpus, and probing AS OF the pre-append
    version reproduces the half-1 results exactly (the time-travel ANN
    read). The append rewrites only touched cell partitions and is
    idempotent by key (a replay publishes a data-identical version)."""
    from pyspark.sql import functions as F

    from sec_xbrl_finwarehouse_spark import sinks

    (half1, half2), _ = _half_corpus_dirs(spark, tmp_path)
    idx = str(tmp_path / "ivf_v")
    eq.build_ivf_index_versioned(spark, half1, idx)
    v_before = [v["version"] for v in sinks.list_versions(f"{idx}/corpus")
                if v["is_current"]][0]
    probe_v1 = sorted(map(tuple,
        eq.q_emb_ivf_index_probe_versioned(spark, SF_DIR, idx).collect()))

    batch = (
        spark.read.parquet(f"{half2}/embeddings.parquet")
        .filter(F.col("vec_id") >= eq.N_QUERIES)
        .select(F.col("vec_id").alias("neighbor_id"),
                F.col("embedding").cast("array<double>").alias("emb"))
    )
    n_parts = eq.append_ivf_index_versioned(spark, idx, batch)
    assert n_parts > 0

    # current probe == the PLAIN incremental index over the same
    # fixed-quantizer corpus (build half1 + append half2)
    plain = str(tmp_path / "ivf_plain")
    eq.build_ivf_index(spark, half1, plain)
    eq.append_ivf_index(spark, plain, batch)
    got_now = sorted(map(tuple,
        eq.q_emb_ivf_index_probe_versioned(spark, SF_DIR, idx).collect()))
    want_now = sorted(map(tuple,
        eq.q_emb_ivf_index_probe(spark, SF_DIR, plain).collect()))
    assert got_now == want_now and len(got_now) > 0

    # time travel: as-of the pre-append version == the half-1 results
    got_v1 = sorted(map(tuple,
        eq.q_emb_ivf_index_probe_versioned(spark, SF_DIR, idx,
                                           version=v_before).collect()))
    assert got_v1 == probe_v1
    assert got_v1 != got_now  # the append really changed the candidates

    # replayed append: data-identical (idempotent by key)
    eq.append_ivf_index_versioned(spark, idx, batch)
    again = sorted(map(tuple,
        eq.q_emb_ivf_index_probe_versioned(spark, SF_DIR, idx).collect()))
    assert again == got_now


def test_optimize_ivf_index_splits_hot_cells_probe_identical(
    spark, tmp_path
):
    """Cell maintenance contract (r10): a skew-appended index gets its
    hot quantizer cells re-sharded into bounded sub-cells, probe
    results stay BIT-IDENTICAL (the quantizer is untouched; sub-cells
    union back to the parent's rows), partition pruning survives, the
    pass is idempotent, and appends after a split remain idempotent
    and carry the cell map forward."""
    import json

    from pyspark.sql import functions as F

    from sec_xbrl_finwarehouse_spark import sinks

    idx = str(tmp_path / "ivf_opt")
    eq.build_ivf_index_versioned(spark, SF_DIR, idx)
    corpus_path = f"{idx}/corpus"

    base = sorted(map(tuple,
        eq.q_emb_ivf_index_probe_versioned(spark, SF_DIR, idx).collect()))
    assert len(base) > 0

    widths = {
        r["cell"]: r["n"]
        for r in sinks.read_table(spark, corpus_path)
        .groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    max_w = max(widths.values())
    threshold = max_w // 2  # forces at least the widest cell to split
    n_split = eq.optimize_ivf_index(spark, idx, max_cell_rows=threshold)
    assert n_split >= 1

    # per-storage-cell widths are bounded post-split (hash sharding is
    # not perfectly even; allow the bound on the TARGET width times a
    # small imbalance factor, and require the hot parent's dir gone)
    after = {
        r["cell"]: r["n"]
        for r in sinks.read_table(spark, corpus_path)
        .groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    split_parents = {
        p for p, w in widths.items() if w > threshold
    }
    assert split_parents.isdisjoint(after)  # parent dirs replaced
    for cell, n in after.items():
        if cell >= eq.IVF_SPLIT_BASE:
            assert n <= 2 * threshold  # bounded sub-cells
    # the committed cell map names exactly the split parents
    cellmap = eq._ivf_cellmap(corpus_path)
    assert set(cellmap) == split_parents

    # probes: bit-identical, still partition-pruned
    opt = eq.q_emb_ivf_index_probe_versioned(spark, SF_DIR, idx)
    assert sorted(map(tuple, opt.collect())) == base
    plan = opt._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan

    # idempotent: desired layout already present -> no new version
    v_cur = [v["version"] for v in sinks.list_versions(corpus_path)
             if v["is_current"]][0]
    assert eq.optimize_ivf_index(spark, idx, max_cell_rows=threshold) == 0
    assert [v["version"] for v in sinks.list_versions(corpus_path)
            if v["is_current"]][0] == v_cur

    # append onto the split index: replay-idempotent, map carried.
    # The replayed id is taken FROM A SPLIT PARENT's sub-cells so the
    # split-aware (quantizer-cell, id) anti-join -- not the ordinary
    # by-key merge -- is what must dedup it.
    hot_parent = next(iter(split_parents))
    stored_ids = {
        r["neighbor_id"]
        for r in sinks.read_table(spark, corpus_path)
        .select("neighbor_id").collect()
    }
    some_id = (
        sinks.read_table(spark, corpus_path)
        .filter(F.col("cell") >= eq.IVF_SPLIT_BASE)
        .filter(eq._ivf_parent(F.col("cell")) == hot_parent)
        .select("neighbor_id").first()["neighbor_id"]
    )
    old_vec = (
        sinks.read_table(spark, corpus_path)
        .filter(F.col("neighbor_id") == some_id)
        .select("neighbor_id", "emb")
    )
    new_vec = old_vec.select(
        (F.col("neighbor_id") + 1_000_000).alias("neighbor_id"), "emb"
    )
    batch = old_vec.unionByName(new_vec)
    eq.append_ivf_index_versioned(spark, idx, batch)
    n_after_1 = sinks.read_table(spark, corpus_path).count()
    eq.append_ivf_index_versioned(spark, idx, batch)  # replay
    n_after_2 = sinks.read_table(spark, corpus_path).count()
    assert n_after_1 == len(stored_ids) + 1  # old id deduped, new added
    assert n_after_2 == n_after_1            # full replay is a no-op
    assert eq._ivf_cellmap(corpus_path) == cellmap  # map survived


def test_optimize_ivf_index_occ_rejects_racing_append(
    spark, tmp_path, monkeypatch
):
    """r11 (ADVICE): optimize_ivf_index pins its entry snapshot and
    threads it as replace_where's expect_version, so an append
    publishing between optimize's corpus scan and its publish surfaces
    as a retryable ConcurrentWriteError -- never a torn merge that
    drops the append from the rewritten partitions. The racing
    append's row must survive, and the retried optimize must land."""
    import pytest
    from pyspark.sql import functions as F

    from sec_xbrl_finwarehouse_spark import sinks

    idx = str(tmp_path / "ivf_occ")
    eq.build_ivf_index_versioned(spark, SF_DIR, idx)
    corpus_path = f"{idx}/corpus"
    widths = [
        r["n"] for r in sinks.read_table(spark, corpus_path)
        .groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()
    ]
    threshold = max(widths) // 2  # at least one cell must split

    racer = (
        sinks.read_table(spark, corpus_path)
        .select("neighbor_id", "emb").limit(1)
        .select((F.col("neighbor_id") + 5_000_000).alias("neighbor_id"),
                "emb")
        .localCheckpoint(eager=True)
    )
    real_replace = sinks.replace_where

    def racing_replace(*args, **kwargs):
        eq.append_ivf_index_versioned(spark, idx, racer)
        return real_replace(*args, **kwargs)

    monkeypatch.setattr(sinks, "replace_where", racing_replace)
    with pytest.raises(sinks.ConcurrentWriteError):
        eq.optimize_ivf_index(spark, idx, max_cell_rows=threshold)
    monkeypatch.setattr(sinks, "replace_where", real_replace)

    # the append won the race and is current
    ids = {
        r["neighbor_id"]
        for r in sinks.read_table(spark, corpus_path)
        .select("neighbor_id").collect()
    }
    assert any(i >= 5_000_000 for i in ids)
    # the retried optimize sees the appended row and commits
    assert eq.optimize_ivf_index(spark, idx, max_cell_rows=threshold) >= 1
    ids_after = {
        r["neighbor_id"]
        for r in sinks.read_table(spark, corpus_path)
        .select("neighbor_id").collect()
    }
    assert ids_after == ids  # reorg moved rows, lost none
