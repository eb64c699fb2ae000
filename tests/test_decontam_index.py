"""Stored eval-set decontamination index: incremental-vs-from-scratch
agreement, batch-sized probe semantics, and the broadcast plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from sec_xbrl_finwarehouse_spark.plans.decontam_index import (
    build_decontam_index,
    decontaminate_incremental,
)
from sec_xbrl_finwarehouse_spark.plans.text_queries import (
    TRAIN_HEX,
    q_doc_decontaminate,
)

SF_DIR = "/root/testdata/sf0.001"


def test_incremental_agrees_with_from_scratch(spark, tmp_path):
    """Index built from the corpus's test split + incremental scan of
    its train docs == the one-shot q_doc_decontaminate, row for row."""
    idx = str(tmp_path / "decontam")
    build_decontam_index(spark, SF_DIR, idx)

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    first_hex = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    train = d.filter(first_hex.isin(*TRAIN_HEX)).select("doc_id", "text")

    got = sorted(map(tuple,
                     decontaminate_incremental(spark, train, idx).collect()))
    want = sorted(map(tuple, q_doc_decontaminate(spark, SF_DIR).collect()))
    assert got == want and len(got) > 0
    assert any(r[2] for r in got)  # some contamination actually found


def test_batch_probe_and_clean_batch(spark, tmp_path):
    idx = str(tmp_path / "decontam")
    build_decontam_index(spark, SF_DIR, idx)

    # a doc pasted from a TEST document is flagged; novel text is not;
    # a too-short doc gets the 0/false verdict via the left join
    test_text = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .withColumn(
            "fh", F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
        )
        .filter(~F.col("fh").isin(*TRAIN_HEX))
        .select("text").first()["text"]
    )
    batch = spark.createDataFrame(
        [
            (1_000_001, "prefix words " + test_text + " suffix words"),
            (1_000_002, "entirely novel zebra quantum paragraphs " * 5),
            (1_000_003, "too short"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["n_contaminated_shingles"], r["contaminated"])
           for r in decontaminate_incremental(spark, batch, idx).collect()}
    assert got[1_000_001][1] is True and got[1_000_001][0] > 0
    assert got[1_000_002] == (0, False)
    assert got[1_000_003] == (0, False)


def test_probe_plan_broadcasts_the_index(spark, tmp_path):
    """The batch's shingle stream must NOT shuffle on the shingle key:
    the stored index is the broadcast side."""
    idx = str(tmp_path / "decontam")
    build_decontam_index(spark, SF_DIR, idx)
    batch = spark.createDataFrame(
        [(1, "some words repeated enough to form shingles " * 4)],
        "doc_id long, text string",
    )
    plan = (
        decontaminate_incremental(spark, batch, idx)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, plan
