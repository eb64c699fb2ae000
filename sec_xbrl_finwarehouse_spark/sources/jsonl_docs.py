"""JSONL document ingestion — the raw entry point of a training-data
pipeline (web-crawl dumps, data-vendor deliveries, and every open
pretraining corpus ship as JSON-lines).

Design points, all Spark-native:

* **Explicit schema, never inference.** Schema inference reads the
  whole input once before the real scan — at 100 TB that is a second
  full pass; and a drifting input silently changes inferred types
  between deliveries. The documents schema is pinned here.
* **line-read + ``from_json``, NOT the json source's PERMISSIVE
  ``_corrupt_record``.** The corrupt column's population depends on
  which columns the parser is asked for, so a pruned plan (``count()``)
  classifies rows differently than a full read — a split that changes
  under column pruning is not a contract. ``from_json`` over
  ``spark.read.text`` lines is an ordinary expression: referenced
  whenever the split is, identical in every plan, same JVM-side parse
  performance, and gzip/zstd ``.jsonl.gz`` still decode via the text
  source's codec inference.
* **Nothing dropped, nothing aborts.** Malformed JSON, missing
  ``text``, or a type-clashing ``doc_id`` goes to a quarantine frame
  carrying the raw line for offline triage; clean rows get derived
  hygiene columns (``n_chars``, content-hash ``doc_id`` fallback) so
  the corpus operators compose directly on the loaded frame.

Reference parity: the reference ingests vendor JSON with per-row
Python guards (sec_client.py + ingest_facts.py try/except); here the
same tolerance is a declarative expression, executed JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOC_JSONL_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("source", T.StringType()),
])


def read_jsonl_docs(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """Load a JSONL documents delivery as ``(clean, quarantine)``.

    ``clean`` rows parse fully and have non-null ``text``: typed
    columns plus ``n_chars`` derived at ingest; ``doc_id`` falls back
    to a content hash (first 15 hex digits of sha2(text) — stable
    across re-ingests) when the delivery omits it. ``quarantine``
    preserves each rejected raw line exactly once: malformed JSON, a
    missing/null ``text``, or a ``doc_id`` key whose value does not
    parse as a number (present in the raw line but null after the
    typed parse).

    One text scan feeds both frames; the parse is a whole-stage-codegen
    expression evaluated identically in every downstream plan."""
    raw = spark.read.text(path).select(F.col("value").alias("raw_line"))
    j = F.from_json("raw_line", DOC_JSONL_SCHEMA)
    parsed = raw.select("raw_line", j.alias("j"))
    id_clash = (
        F.get_json_object("raw_line", "$.doc_id").isNotNull()
        & F.col("j.doc_id").isNull()
    )
    bad = F.col("j").isNull() | F.col("j.text").isNull() | id_clash
    quarantine = parsed.filter(bad).select("raw_line")
    content_id = F.conv(
        F.substring(F.sha2(F.col("j.text"), 256), 1, 15), 16, 10
    ).cast("long")
    clean = parsed.filter(~bad).select(
        F.coalesce(F.col("j.doc_id"), content_id).alias("doc_id"),
        F.col("j.text").alias("text"),
        F.col("j.lang").alias("lang"),
        F.col("j.source").alias("source"),
        F.length("j.text").cast("long").alias("n_chars"),
    )
    return clean, quarantine
