"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sec_xbrl_finwarehouse_spark import oracles
from sec_xbrl_finwarehouse_spark.plans import (
    audio_queries,
    corpus_queries,
    embedding_queries,
    events_queries,
    image_queries,
    text_queries,
)
from sec_xbrl_finwarehouse_spark.plans import star_queries as sq

SMOKE_SF_DIR = "/root/testdata/sf0.001"

# the 17 reference-parity star queries (window group 1 in r9; all
# carry green r9 rows and sit below the boundary this round)
STAR_PARITY = {
    "statements_annual", "ratios_annual", "screener",
    "window_dedup_latest", "pivot_wide", "flow_stock_union",
    "window_dedup_priority", "coalesce_priority", "annual_period_filter",
    "top_k_orders", "natural_key_dedup", "insert_if_absent",
    "upsert_latest_wins", "statements_annual_v2", "statements_annual_v1",
    "company_profile", "ratios_lookup",
}

# ---- r11 window policy -----------------------------------------------------
# The driver's correctness gate covers the FIRST 50 entries in dict
# order per round; the window ROTATES so no query's newest driver row
# goes stale longer than the surface/window ratio forces (oldest rows
# always lead). r10 ran the 50 entries frozen in R10_WINDOW below
# (CORRECTNESS_r10.json, 50/50 green). r11 leads with the 9 R11_LEADS
# (their newest rows are r8 -- two rounds stale), then everything NEW
# or semantics-CHANGED this round, then back-fills with the
# r9-verified entries; the r9 entries that do not fit (16 of 42 after
# the R11_CHANGED additions) are the r12 leads, visible as the head
# of list(queries())[50:].

# the 50 entries CORRECTNESS_r10.json verified (newest rows r10) --
# frozen verbatim so future rotations are self-documenting
R10_WINDOW = [
    "event_hll_distinct", "event_cm_heavy_hitters", "event_ams_f2",
    "event_hll_sliding", "event_cm_sliding", "doc_dsir_sample",
    "emb_knn_graph", "emb_knn_refine", "doc_paragraph_dedup",
    "doc_span_dedup", "doc_editdist_neardup", "doc_editdist_clusters",
    "doc_unigram_logprob", "doc_ccnet_bucket", "image_phash",
    "image_neardup", "image_dedup_clusters", "event_histogram_quantiles",
    "event_kmv_distinct", "event_kmv_overlap", "event_bloom_semijoin",
    "doc_weighted_sample", "doc_exact_dedup", "doc_quality",
    "doc_ngram_novelty", "doc_minhash_lsh_dedup",
    "doc_minhash_jaccard_est", "doc_dedup_clusters", "doc_simhash",
    "doc_simhash_neardup", "doc_stratified_sample", "doc_dedup_keep_best",
    "doc_corpus_build", "doc_ngram_df", "doc_tfidf_topk",
    "doc_decontaminate", "doc_seq_packing", "doc_mixture_sample",
    "doc_dup_ngram_frac", "doc_repetition", "doc_bigram_logprob",
    "doc_pii_scan", "emb_ivf_recall", "emb_ivfpq_recall",
    "emb_prefix_rerank_topk", "emb_ann_topk", "emb_ivf_ann_topk",
    "emb_pq_ann_topk", "emb_ivf_pq_ann_topk", "emb_hard_negatives_ann",
]

# (a) the 9 r8-verified sit-outs from r10's back-fill (newest rows r8,
# two rounds stale): they LEAD the r11 window, as planned in r10
R11_LEADS = [
    "doc_length_histogram", "doc_domain_mix", "doc_global_shuffle",
    "doc_token_stats", "doc_chunk", "doc_train_test_split",
    "doc_bpe_token_count", "doc_fingerprint", "doc_lang_id",
]
# (b) queries NEW in r11: the perceptual AUDIO fingerprint family
# (text->PCM driver path, kernel shared with the WAV codec path) and
# the sampled recall monitor (the at-scale recall-audit shape)
R11_NEW = [
    "audio_fingerprint", "audio_neardup", "audio_dedup_clusters",
    "emb_ann_recall_sampled",
]
# (c) entries whose CODE changed in r11 (green r10 rows, but
# re-verification is mandatory after a semantics-touching edit):
# decontaminate's test-side broadcast hint is now gated on source
# size (ADVICE r10); the ANN rankers grew the sample_queries flag and
# the recall harness threads it, so every query through those code
# paths re-verifies
R11_CHANGED = [
    "doc_decontaminate",
    "emb_ann_topk", "emb_lsh_ann_topk",
    "emb_ann_recall", "emb_ivf_recall", "emb_ivfpq_recall",
    # the LSH bucket UDF grew the lsh_bits density knob (default
    # pinned to LSH_BITS -- behavior-identical, but every caller
    # re-verifies)
    "emb_lsh_neardup", "emb_dedup_clusters", "doc_semantic_dedup",
    "emb_knn_graph", "emb_knn_refine",
]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the full reference pipeline (ingest-shaped facts ->
    statements_annual, SURVEY.md §3.2) on sf0.001."""
    return sq.q_statements_annual(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    all_q: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        # reference-parity pipeline + operators (SURVEY §2 / §3,
        # FIXTURES.md §C mapping)
        "statements_annual": sq.q_statements_annual,
        "ratios_annual": sq.q_ratios_annual,
        "screener": sq.q_screener,                            # P6 + J2 + O2
        "window_dedup_latest": sq.q_window_dedup_latest,      # W1
        "pivot_wide": sq.q_pivot_wide,                        # A1
        "flow_stock_union": sq.q_flow_stock_union,            # U1 + P4
        "window_dedup_priority": sq.q_window_dedup_priority,  # W2
        "coalesce_priority": sq.q_coalesce_priority,          # A2
        "annual_period_filter": sq.q_annual_period_filter,    # P5 + J1
        "top_k_orders": sq.q_top_k_orders,                    # O1/O2
        "natural_key_dedup": sq.q_natural_key_dedup,          # D1
        "insert_if_absent": sq.q_insert_if_absent,            # S6
        "upsert_latest_wins": sq.q_upsert_latest_wins,        # S5
        "statements_annual_v2": sq.q_statements_annual_v2,
        "statements_annual_v1": sq.q_statements_annual_v1,
        "company_profile": sq.q_company_profile,              # J3
        "ratios_lookup": sq.q_ratios_lookup,                  # O1
        **events_queries.QUERIES,
        **text_queries.QUERIES,
        **corpus_queries.QUERIES,
        **embedding_queries.QUERIES,
        **image_queries.QUERIES,
        **audio_queries.QUERIES,
    }
    must = R11_LEADS + R11_NEW + R11_CHANGED  # 24 slots
    # back-fill: entries whose newest driver row is r9 (everything
    # below r10's boundary except the r8-stale leads and the changed
    # set), in stable dict order. 42 candidates, 26 slots -- the 16
    # sit-outs lead r12.
    r9_newest = [
        n for n in all_q
        if n not in R10_WINDOW and n not in R11_LEADS
        and n not in R11_NEW and n not in R11_CHANGED
    ]
    backfill = r9_newest[: 50 - len(must)]
    window = must + backfill
    assert len(window) == 50, len(window)
    ordered = {n: all_q[n] for n in window}
    # --- window boundary: r12 leads (r9 rows aging out next round)
    # first below the line, then the r10-verified remainder ---
    ordered.update({n: all_q[n] for n in r9_newest})
    ordered.update({n: all_q[n] for n in all_q if n not in ordered})
    assert len(ordered) == len(all_q)
    return ordered


def oracle_sql() -> dict[str, str]:
    return {
        **oracles.build_reference_oracles(),
        **events_queries.ORACLES,
        **text_queries.ORACLES,
        **corpus_queries.ORACLES,
        **embedding_queries.ORACLES,
        **image_queries.ORACLES,
        **audio_queries.ORACLES,
    }
