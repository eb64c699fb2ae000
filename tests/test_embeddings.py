"""Unit tests for the embedding similarity pack: cosine matches numpy,
LSH ANN recalls planted near-neighbors, centroid assignment is sane."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sec_xbrl_finwarehouse_spark.plans import embedding_queries as eq


def _emb_df(spark, vecs, labels=None):
    rows = [
        (i, [float(x) for x in v], int(labels[i]) if labels else 0)
        for i, v in enumerate(vecs)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def _write_sf(spark, tmp_path, vecs, labels=None):
    sf = tmp_path / "sf"
    sf.mkdir(exist_ok=True)
    _emb_df(spark, vecs, labels).coalesce(1).write.mode("overwrite").parquet(
        str(sf / "embeddings.parquet")
    )
    return str(sf)


def test_cosine_matches_numpy(spark):
    rng = np.random.RandomState(7)
    a, b = rng.standard_normal(16), rng.standard_normal(16)
    df = spark.createDataFrame(
        [([float(x) for x in a], [float(y) for y in b])],
        "a array<double>, b array<double>",
    )
    got = df.select(eq._cosine(F.col("a"), F.col("b")).alias("c")).first()["c"]
    want = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert got == pytest.approx(want, rel=1e-9)


def test_lsh_ann_recalls_planted_neighbors(spark, tmp_path):
    """Corpus vectors that are tiny perturbations of each query must be
    the rank-1 LSH result (cos ~ 0.999 -> collision P[miss] < 1e-4)."""
    rng = np.random.RandomState(0)
    dim = 64
    queries = rng.standard_normal((eq.N_QUERIES, dim))
    # corpus: for each query one planted near-dup, plus random noise
    planted = queries + 0.02 * rng.standard_normal((eq.N_QUERIES, dim))
    noise = rng.standard_normal((100, dim))
    vecs = list(queries) + list(planted) + list(noise)
    sf = _write_sf(spark, tmp_path, vecs)

    out = eq.q_emb_lsh_ann_topk(spark, sf).collect()
    top1 = {r["query_id"]: r["neighbor_id"] for r in out if r["rank"] == 1}
    # planted near-dup of query q has vec_id = N_QUERIES + q
    hits = sum(1 for q, n in top1.items() if n == eq.N_QUERIES + q)
    assert hits == eq.N_QUERIES


def test_knn_graph_ranks_planted_cluster_mates_first(spark, tmp_path):
    """k-NN graph on planted 3-vector clusters: every member's rank-1/2
    neighbors must be its two cluster mates (cos ~ 0.999 inside a
    cluster vs ~0 across random clusters; LSH puts near-identical
    vectors in the same buckets with P[miss] < 1e-4 per pair)."""
    rng = np.random.RandomState(3)
    dim = 64
    centers = rng.standard_normal((20, dim))
    vecs = []
    for c in centers:  # members 3i, 3i+1, 3i+2 share center i
        for _ in range(3):
            vecs.append(c + 0.01 * rng.standard_normal(dim))
    sf = _write_sf(spark, tmp_path, vecs)

    out = eq.q_emb_knn_graph(spark, sf).collect()
    by_vec = {}
    for r in out:
        by_vec.setdefault(r["vec_id"], {})[r["rank"]] = r["neighbor_id"]
    assert len(by_vec) == 60
    for v, ranks in by_vec.items():
        mates = {m for m in range(v // 3 * 3, v // 3 * 3 + 3) if m != v}
        assert {ranks[1], ranks[2]} == mates, (v, ranks)


def test_knn_refine_candidates_are_superset_and_recall_improves(
    spark, tmp_path
):
    """NN-descent round on SPREAD clusters (perturbation large enough
    that some cluster pairs miss every shared LSH bucket, small enough
    that cosines stay high): the refined pool is a superset of the seed
    graph's, so per-vector true-mate recall is monotone non-decreasing
    -- and on this fixture the 2-hop chains recover strictly more
    cluster mates than the seed graph found."""
    rng = np.random.RandomState(11)
    dim = 64
    centers = rng.standard_normal((12, dim))
    members = 6
    vecs = []
    for c in centers:
        for _ in range(members):
            vecs.append(c + 0.55 * rng.standard_normal(dim))
    sf = _write_sf(spark, tmp_path, vecs)

    def mate_hits(rows):
        hits = 0
        for r in rows:
            lo = r["vec_id"] // members * members
            if lo <= r["neighbor_id"] < lo + members:
                hits += 1
        return hits

    seed = eq.q_emb_knn_graph(spark, sf).collect()
    refined = eq.q_emb_knn_refine(spark, sf).collect()
    seed_hits, refined_hits = mate_hits(seed), mate_hits(refined)
    assert refined_hits >= seed_hits
    assert refined_hits > seed_hits, (seed_hits, refined_hits)
    # per-rank cosine is monotone non-decreasing (superset pool)
    seed_cos = {(r["vec_id"], r["rank"]): r["cosine"] for r in seed}
    for r in refined:
        k = (r["vec_id"], r["rank"])
        if k in seed_cos:
            assert r["cosine"] >= seed_cos[k], k


def test_lsh_matches_bruteforce_top1_on_planted(spark, tmp_path):
    rng = np.random.RandomState(3)
    dim = 32
    queries = rng.standard_normal((eq.N_QUERIES, dim))
    planted = queries + 0.05 * rng.standard_normal((eq.N_QUERIES, dim))
    vecs = list(queries) + list(planted) + list(rng.standard_normal((50, dim)))
    sf = _write_sf(spark, tmp_path, vecs)
    brute = {r["query_id"]: r["neighbor_id"]
             for r in eq.q_emb_ann_topk(spark, sf).collect() if r["rank"] == 1}
    lsh = {r["query_id"]: r["neighbor_id"]
           for r in eq.q_emb_lsh_ann_topk(spark, sf).collect() if r["rank"] == 1}
    assert brute == lsh


def test_nearest_centroid_recovers_clusters(spark, tmp_path):
    """Vectors drawn tightly around 3 well-separated centers, labeled by
    center -> every vector must be assigned its own label's centroid."""
    rng = np.random.RandomState(1)
    centers = rng.standard_normal((3, 16)) * 10
    vecs, labels = [], []
    for lab in range(3):
        for _ in range(20):
            vecs.append(centers[lab] + 0.1 * rng.standard_normal(16))
            labels.append(lab)
    sf = _write_sf(spark, tmp_path, vecs, labels)
    out = eq.q_emb_nearest_centroid(spark, sf).collect()
    assigned = {r["vec_id"]: r["assigned_label"] for r in out}
    assert all(assigned[i] == labels[i] for i in range(len(vecs)))


def test_ivf_equals_bruteforce_when_probing_all_cells(spark, tmp_path, monkeypatch):
    """With NPROBE >= number of cells, IVF search IS exhaustive search --
    the two queries must return identical frames."""
    rng = np.random.RandomState(11)
    vecs = rng.standard_normal((eq.N_QUERIES + 40, 16))
    labels = [i % 3 for i in range(len(vecs))]
    sf = _write_sf(spark, tmp_path, vecs, labels)
    monkeypatch.setattr(eq, "NPROBE", 3)
    brute = sorted(map(tuple, eq.q_emb_ann_topk(spark, sf).collect()))
    ivf = sorted(map(tuple, eq.q_emb_ivf_ann_topk(spark, sf).collect()))
    assert brute == ivf


def test_ivf_recalls_planted_neighbor(spark, tmp_path):
    """A near-duplicate of each query (same label cluster) must be the
    IVF rank-1 result: the planted vector's cell is by construction the
    query's nearest centroid."""
    rng = np.random.RandomState(13)
    dim = 16
    centers = rng.standard_normal((2, dim)) * 10
    queries = [centers[i % 2] + 0.1 * rng.standard_normal(dim)
               for i in range(eq.N_QUERIES)]
    planted = [q + 0.01 * rng.standard_normal(dim) for q in queries]
    fill = [centers[i % 2] + 0.5 * rng.standard_normal(dim) for i in range(30)]
    vecs = queries + planted + fill
    labels = ([i % 2 for i in range(eq.N_QUERIES)] * 2
              + [i % 2 for i in range(30)])
    sf = _write_sf(spark, tmp_path, vecs, labels)
    top1 = {r["query_id"]: r["neighbor_id"]
            for r in eq.q_emb_ivf_ann_topk(spark, sf).collect() if r["rank"] == 1}
    assert top1 == {i: i + eq.N_QUERIES for i in range(eq.N_QUERIES)}


def test_lsh_neardup_finds_planted_pairs(spark, tmp_path):
    """Planted near-duplicate pairs (cos ~ 0.999) must all survive the
    LSH bucket-candidate stage and the exact verify; pairs of
    independent random vectors (E[cos] ~ 0) must not appear."""
    rng = np.random.RandomState(11)
    dim = 64
    base = rng.standard_normal((10, dim))
    dups = base + 0.02 * rng.standard_normal((10, dim))
    noise = rng.standard_normal((60, dim))
    vecs = list(base) + list(dups) + list(noise)
    sf = _write_sf(spark, tmp_path, vecs)

    rows = eq.q_emb_lsh_neardup(spark, sf).collect()
    got = {(r["v1"], r["v2"]) for r in rows}
    planted = {(i, 10 + i) for i in range(10)}
    assert planted <= got
    # every reported pair genuinely clears the threshold (numpy check)
    arr = np.stack(vecs)
    for r in rows:
        a, b = arr[r["v1"]], arr[r["v2"]]
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert cos == pytest.approx(r["cosine"], abs=1e-5) and cos >= eq.NEARDUP_COS - 1e-6


def test_pq_ann_shape_and_order(spark):
    """PQ/ADC output contract: TOPK rows per query, ranks dense 1..k,
    adist non-decreasing in rank, rerun-stable."""
    from sec_xbrl_finwarehouse_spark.plans.embedding_queries import (
        N_QUERIES,
        TOPK,
        q_emb_pq_ann_topk,
    )

    sf = "/root/testdata/sf0.001"
    out = q_emb_pq_ann_topk(spark, sf).collect()
    assert len(out) == N_QUERIES * TOPK
    per_q = {}
    for r in out:
        per_q.setdefault(r["query_id"], []).append((r["rank"], r["adist"]))
    for q, rows in per_q.items():
        rows.sort()
        assert [r for r, _ in rows] == list(range(1, TOPK + 1))
        dists = [d for _, d in rows]
        assert dists == sorted(dists)
    again = q_emb_pq_ann_topk(spark, sf).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


def test_ivfpq_equals_bruteforce_when_probing_and_refining_all(
    spark, tmp_path, monkeypatch
):
    """With NPROBE >= number of cells AND a refine pool covering the
    whole corpus, every approximation in IVF+PQ+refine is a no-op: the
    cell pruning admits everything and the exact rerank re-scores
    everything, so the output must equal the brute-force exact top-k
    bit for bit (any drift means the cell join, the ADC pool cut, or
    the rerank changed the candidate set)."""
    rng = np.random.RandomState(17)
    vecs = rng.standard_normal((eq.N_QUERIES + 40, eq.EMB_DIM))
    labels = [i % 3 for i in range(len(vecs))]
    sf = _write_sf(spark, tmp_path, vecs, labels)
    monkeypatch.setattr(eq, "NPROBE", 3)
    monkeypatch.setattr(eq, "PQ_REFINE", len(vecs))
    brute = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["cosine"])
        for r in eq.q_emb_ann_topk(spark, sf).collect()
    )
    ivfpq = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["cosine"])
        for r in eq.q_emb_ivf_pq_ann_topk(spark, sf).collect()
    )
    assert brute == ivfpq


def test_ivfpq_cell_is_neighbors_cell(spark, tmp_path):
    """Every emitted hit's ``cell`` must be the NEIGHBOR's coarse cell
    (the cell whose inverted list the hit was read from), and that cell
    must be one of the query's probed cells by construction of the
    join — cross-checked against the standalone IVF assignment."""
    rng = np.random.RandomState(19)
    vecs = rng.standard_normal((eq.N_QUERIES + 30, eq.EMB_DIM))
    labels = [i % 4 for i in range(len(vecs))]
    sf = _write_sf(spark, tmp_path, vecs, labels)
    e = eq._embeddings(spark, sf)
    assigned = {
        r["neighbor_id"]: r["cell"]
        for r in (
            e.filter(F.col("vec_id") >= eq.N_QUERIES)
            .select(F.col("vec_id").alias("neighbor_id"), "emb")
            .crossJoin(eq._cells_one_row(eq._centroids(e)))
            .select(
                "neighbor_id",
                eq._nearest_cells(F.col("emb"), 1)[0]["cell"].alias("cell"),
            )
            .collect()
        )
    }
    for r in eq.q_emb_ivf_pq_ann_topk(spark, sf).collect():
        assert r["cell"] == assigned[r["neighbor_id"]]


def test_hard_negatives_never_share_label(spark):
    from sec_xbrl_finwarehouse_spark.plans.embedding_queries import (
        _embeddings,
        q_emb_hard_negatives,
    )
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    labels = {
        r["vec_id"]: r["label"]
        for r in _embeddings(spark, sf).select("vec_id", "label").collect()
    }
    out = q_emb_hard_negatives(spark, sf).collect()
    assert len(out) > 0
    for r in out:
        assert labels[r["query_id"]] != r["neighbor_label"]
        assert r["neighbor_label"] == labels[r["neighbor_id"]]


def test_kmeans_iter_partition_and_nonneg_shift(spark):
    from sec_xbrl_finwarehouse_spark.plans.embedding_queries import (
        _embeddings,
        q_emb_kmeans_iter,
    )

    sf = "/root/testdata/sf0.001"
    n_vecs = _embeddings(spark, sf).count()
    out = q_emb_kmeans_iter(spark, sf).collect()
    # final assignment partitions the corpus across surviving clusters
    assert sum(r["n_members"] for r in out) == n_vecs
    assert all(r["shift"] >= 0.0 for r in out)
    assert len({r["cid"] for r in out}) == len(out)  # one row per cluster


def test_multiprobe_recall_on_clustered_corpus(spark, tmp_path):
    """Recall gate on a CLUSTERED corpus (the realistic regime — the
    isotropic testdata corpus is the documented worst case): queries
    are members of 10 loose clusters (pairwise cosine ~0.77, loose
    enough that single-probe 8x8 LSH lands ~0.68 recall), and the
    Hamming-<=2 multi-probe must lift mean recall@TOPK to >= 0.8."""
    rng = np.random.RandomState(5)
    dim, spread = 64, 0.55
    centers = rng.standard_normal((eq.N_QUERIES, dim))
    vecs = [centers[i] + spread * rng.standard_normal(dim)
            for i in range(eq.N_QUERIES)]  # queries: one per cluster
    labels = list(range(eq.N_QUERIES))
    for i in range(eq.N_QUERIES):
        for _ in range(15):
            vecs.append(centers[i] + spread * rng.standard_normal(dim))
            labels.append(i)
    chaff = list(rng.standard_normal((100, dim)))  # isotropic chaff
    vecs += chaff
    labels += [i % eq.N_QUERIES for i in range(len(chaff))]
    sf = _write_sf(spark, tmp_path, vecs, labels)
    rec = eq.q_emb_ann_recall(spark, sf).collect()
    mean_recall = sum(r["recall"] for r in rec) / len(rec)
    assert mean_recall >= 0.8, mean_recall
    # IVF on the same corpus: label-cells coincide with the clusters,
    # so the NPROBE-pruned probe must recall the true neighbors too
    ivf = eq.q_emb_ivf_recall(spark, sf).collect()
    ivf_recall = sum(r["recall"] for r in ivf) / len(ivf)
    assert ivf_recall >= 0.8, ivf_recall
    # IVF+PQ+refine: the ADC stage alone measured 0.36 here (cluster
    # members share codes -> ties break by id), the exact rerank of the
    # top-PQ_REFINE pool restores IVF-level recall -- the property the
    # refine stage exists for
    ivfpq = eq.q_emb_ivfpq_recall(spark, sf).collect()
    ivfpq_recall = sum(r["recall"] for r in ivfpq) / len(ivfpq)
    assert ivfpq_recall >= 0.8, ivfpq_recall


def test_hard_negatives_ann_cross_label_and_rank_order(spark):
    """ANN-path miner invariants: (1) every mined negative is
    cross-label (the filter runs BEFORE the pool cut, so no same-label
    row can survive to the rerank); (2) ranks are 1..k contiguous per
    query with cosine non-increasing; (3) each mined cosine is bounded
    above by the exact miner's best for that query (the ANN path can
    only miss neighbors, never invent better ones)."""
    sf = "/root/testdata/sf0.001"
    labels = {
        r["vec_id"]: r["label"]
        for r in eq._embeddings(spark, sf).select("vec_id", "label").collect()
    }
    out = eq.q_emb_hard_negatives_ann(spark, sf).collect()
    assert len(out) > 0
    by_q = {}
    for r in out:
        assert labels[r["query_id"]] != r["neighbor_label"]
        assert r["neighbor_label"] == labels[r["neighbor_id"]]
        by_q.setdefault(r["query_id"], []).append(r)
    exact_best = {}
    for r in eq.q_emb_hard_negatives(spark, sf).collect():
        prev = exact_best.get(r["query_id"])
        if prev is None or r["cosine"] > prev:
            exact_best[r["query_id"]] = r["cosine"]
    for qid, hits in by_q.items():
        hits.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in hits] == list(range(1, len(hits) + 1))
        cosines = [r["cosine"] for r in hits]
        assert cosines == sorted(cosines, reverse=True)
        # rounding in both paths is 6dp; allow one ulp of slack
        assert cosines[0] <= exact_best[qid] + 1e-6


def test_sampled_recall_is_scan_level_and_subset_consistent(spark):
    """r11 at-scale recall monitor: the md5 query sample must land
    directly on the query-side parquet scans (the exact brute-force
    pass pays only for the sample -- an output-side filter was
    measured to stall above the scoring join), and the sampled rows
    must equal the full audit restricted to the sampled ids."""
    import hashlib

    sf = "/root/testdata/sf0.001"
    sampled_ids = {
        i for i in range(eq.N_QUERIES)
        if hashlib.md5(str(i).encode()).hexdigest()[0]
        in eq.RECALL_SAMPLE_HEX
    }
    df = eq.q_emb_ann_recall_sampled(spark, sf)
    got = {(r["query_id"], r["n_hits"], r["recall"]) for r in df.collect()}
    assert {g[0] for g in got} == sampled_ids
    full = {(r["query_id"], r["n_hits"], r["recall"])
            for r in eq.q_emb_ann_recall(spark, sf).collect()}
    assert got == {f for f in full if f[0] in sampled_ids}

    # every md5-sample Filter sits DIRECTLY on a parquet relation
    lines = df._jdf.queryExecution().optimizedPlan().toString().splitlines()
    md5_at = [i for i, l in enumerate(lines) if "md5" in l]
    assert md5_at, "sample predicate vanished from the plan"
    for i in md5_at:
        assert "Relation" in lines[i + 1] and "parquet" in lines[i + 1], \
            lines[i:i + 2]


def test_dual_ref_persist_gate(spark, tmp_path, monkeypatch):
    """r12: the dual-reference persist (kmeans final assignment, recall
    exact pass) engages only above the embeddings-size gate -- below it
    the duplicated chains are cheaper than the cache barrier (measured,
    see DUAL_REF_PERSIST_MIN_BYTES) -- and ALWAYS when the source size
    is unknowable (remote URI at production scale)."""
    from pyspark import StorageLevel

    df = spark.range(3)

    # small local table -> no persist
    small = eq._persist_if_large(df, "/root/testdata/sf0.001")
    assert small.storageLevel == StorageLevel.NONE

    # unknown source (no such local path) -> persist
    unknown = eq._persist_if_large(spark.range(3), str(tmp_path / "nope"))
    assert unknown.storageLevel != StorageLevel.NONE
    unknown.unpersist()

    # large local table -> persist (gate lowered instead of writing GBs)
    monkeypatch.setattr(eq, "DUAL_REF_PERSIST_MIN_BYTES", 1)
    big = eq._persist_if_large(spark.range(3), "/root/testdata/sf0.001")
    assert big.storageLevel != StorageLevel.NONE
    big.unpersist()
