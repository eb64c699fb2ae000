"""Cross-modal dedup union: planted pair graphs and the end-to-end
query shape."""

from __future__ import annotations

from sec_xbrl_finwarehouse_spark.plans.crossmodal_queries import (
    cluster_union_pair_graphs,
    q_multimodal_dedup_clusters,
)

SF_DIR = "/root/testdata/sf0.001"


def _pairs(spark, rows):
    return spark.createDataFrame(rows or [], "d1 long, d2 long")


def test_doc_joined_only_through_image_edge(spark):
    """Doc 3 has NO text edge; it reaches the {1,2} cluster only via an
    image edge -- the union must close transitively across modalities
    (text 1~2, image 2~3 -> one cluster rep'd by 1)."""
    docs = spark.createDataFrame([(i,) for i in range(1, 6)], "doc_id long")
    text = _pairs(spark, [(1, 2)])
    image = _pairs(spark, [(2, 3)])
    audio = _pairs(spark, [])
    got = {
        r.doc_id: (r.cluster_rep, r.keep)
        for r in cluster_union_pair_graphs(docs, [text, image, audio]).collect()
    }
    assert got[1] == (1, True)
    assert got[2] == (1, False)
    assert got[3] == (1, False)  # image-only membership
    assert got[4] == (4, True) and got[5] == (5, True)  # singletons


def test_duplicate_edges_across_modalities_collapse(spark):
    """The same pair surviving in all three modalities must behave as
    one edge (dedup before CC), and disjoint audio evidence forms its
    own cluster."""
    docs = spark.createDataFrame([(i,) for i in range(1, 5)], "doc_id long")
    text = _pairs(spark, [(1, 2)])
    image = _pairs(spark, [(1, 2)])
    audio = _pairs(spark, [(1, 2), (3, 4)])
    got = {
        r.doc_id: r.cluster_rep
        for r in cluster_union_pair_graphs(docs, [text, image, audio]).collect()
    }
    assert got == {1: 1, 2: 1, 3: 3, 4: 3}


def test_fused_kernel_matches_single_modality_kernels(spark):
    """The fused struct<phash, afp> kernel (one Arrow pass, one
    combined einsum batch -- the r12 cross-modal optimization) must be
    bit-identical to the image and audio kernels run separately, on
    every edge class: empty text, sub-frame text (afp NULL), exactly
    one frame, multi-frame, and non-ASCII codepoints (clamp-255)."""
    from pyspark.sql import functions as F

    from sec_xbrl_finwarehouse_spark.functions.audiofp import (
        text_audiofp_column,
        text_phash_afp_column,
    )
    from sec_xbrl_finwarehouse_spark.functions.phash import text_phash_column

    texts = [
        "",
        "short",
        "x" * 255,            # one char under a frame -> afp NULL
        "y" * 256,            # exactly one frame
        ("lorem ipsum dolor sit amet " * 40)[:1000],
        "café ☃ \U0001f600 " * 60,  # clamped codepoints
        None,                  # NULL text (coalesced to '')
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    coalesced = F.coalesce(F.col("text"), F.lit(""))
    got = (
        df.select(
            "doc_id",
            text_phash_afp_column(coalesced).alias("f"),
            text_phash_column(coalesced).alias("phash1"),
            text_audiofp_column(coalesced).alias("afp1"),
        )
        .select("doc_id", "f.phash", "f.afp", "phash1", "afp1")
        .collect()
    )
    assert len(got) == len(texts)
    for r in got:
        assert r.phash == r.phash1, r
        assert r.afp == r.afp1, r
    # the sub-frame rows really exercise the NULL branch
    by_id = {r.doc_id: r for r in got}
    assert by_id[0].afp is None and by_id[2].afp is None
    assert by_id[3].afp is not None


def test_multimodal_clusters_refine_each_modality(spark):
    """End-to-end at sf0.001: every per-modality cluster is contained
    in the cross-modal cluster of its members (union can only merge,
    never split), and output covers every document exactly once."""
    from sec_xbrl_finwarehouse_spark.plans.audio_queries import (
        q_audio_dedup_clusters,
    )
    from sec_xbrl_finwarehouse_spark.plans.image_queries import (
        q_image_dedup_clusters,
    )
    from sec_xbrl_finwarehouse_spark.plans.text_queries import (
        q_doc_dedup_clusters,
    )

    cross = {
        r.doc_id: r.cluster_rep
        for r in q_multimodal_dedup_clusters(spark, SF_DIR).collect()
    }
    n_docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    )
    assert len(cross) == n_docs
    merged_any = False
    for modal_q in (
        q_doc_dedup_clusters,
        q_image_dedup_clusters,
        q_audio_dedup_clusters,
    ):
        modal = {}
        for r in modal_q(spark, SF_DIR).collect():
            modal.setdefault(r.cluster_rep, set()).add(r.doc_id)
        for members in modal.values():
            crosses = {cross[d] for d in members}
            assert len(crosses) == 1, members
            if len(members) > 1:
                merged_any = True
    assert merged_any  # the corpus actually exercises non-singletons
