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

# ---- r10 window policy -----------------------------------------------------
# The driver's correctness gate covers the FIRST 50 entries in dict
# order per round; the window ROTATES so no query's newest driver row
# goes more than 2 rounds stale. r8 ran the text/corpus/emb packs
# (CORRECTNESS_r08.json, 50/50 green); r9 ran the complement (star +
# events + rotated-out emb/text + 5 changed-code entries, 50/50
# green). r10 leads with every entry whose CURRENT plan has no driver
# row, then back-fills with the oldest (r8-verified) entries.

# (a) the 8 queries NEW in r9 -- locally verified then, never
# driver-checked
R10_NEVER_VERIFIED = [
    "event_hll_distinct", "event_cm_heavy_hitters", "event_ams_f2",
    "event_hll_sliding", "event_cm_sliding", "doc_dsir_sample",
    "emb_knn_graph", "emb_knn_refine",
]
# (b) entries whose CODE changed in late r9 or r10 (green old rows,
# but re-verification is mandatory after a semantics-touching edit):
# paragraph/span dedup (text-keyed skew-safe elections late r9; span's
# phase-1 spread key made deterministic r10), the edit-distance pair
# (r10: cap folded into a two-phase bounded collect block build), and
# the unigram-LM pair (r10: single-pass tf factoring)
R10_CHANGED = [
    "doc_paragraph_dedup", "doc_span_dedup",
    "doc_editdist_neardup", "doc_editdist_clusters",
    "doc_unigram_logprob", "doc_ccnet_bucket",
]
# (c) queries NEW in r10: perceptual-hash image near-dup family
R10_NEW = ["image_phash", "image_neardup", "image_dedup_clusters"]

# (d) 33 back-fill slots from the 42 remaining r8-verified entries.
# All 42 are byte-identical since r8, so 9 must sit out one round;
# the sit-outs are the simplest map-side stat queries (heaviest unit
# coverage, no join/window risk) and they LEAD r11's window:
R11_LEADS = [
    "doc_length_histogram", "doc_domain_mix", "doc_global_shuffle",
    "doc_token_stats", "doc_chunk", "doc_train_test_split",
    "doc_bpe_token_count", "doc_fingerprint", "doc_lang_id",
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
    }
    must = R10_NEVER_VERIFIED + R10_CHANGED + R10_NEW  # 17 slots
    # back-fill: r8-verified entries in stable dict order, skipping the
    # 9 r11 leads and everything already in the must set. Entries with
    # green r9 rows (star parity, the non-sketch events, the r9-window
    # emb/text rotations) sit below the boundary -- their rows are one
    # round old, the youngest available.
    r9_green = STAR_PARITY | {
        n for n in events_queries.QUERIES
        if n not in {"event_kmv_distinct", "event_histogram_quantiles",
                     "event_kmv_overlap", "event_bloom_semijoin",
                     "event_hll_distinct", "event_cm_heavy_hitters",
                     "event_ams_f2", "event_hll_sliding",
                     "event_cm_sliding"}
    } | {
        "emb_cosine_neardup", "emb_int8_quantize", "emb_hard_negatives",
        "emb_kmeans_iter", "emb_dedup_clusters", "doc_semantic_dedup",
        "emb_nearest_centroid", "doc_jaccard_pairs", "emb_lsh_neardup",
        "doc_containment_pairs", "emb_lsh_ann_topk", "emb_ann_recall",
    }
    backfill = [
        n for n in all_q
        if n not in must and n not in r9_green and n not in R11_LEADS
    ]
    window = must + backfill
    assert len(window) == 50, len(window)
    ordered = {n: all_q[n] for n in window}
    # --- window boundary: r11 leads first (their r8 rows age out
    # next round), then the r9-green remainder ---
    ordered.update({n: all_q[n] for n in R11_LEADS})
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
    }
