"""PySpark-native analytics engine with the query & data-processing
capabilities of louispiallat/sec-xbrl-finwarehouse, re-expressed Spark-first.

Layout:
    session     -- tuned SparkSession factory (AQE, UTC, arrow)
    schemas     -- StructTypes + tag constants from the reference warehouse
    sources/    -- parquet star-schema loaders, companyfacts JSON flatten, SEC HTTP client
    operators/  -- window dedup, pivot, upsert, as-of join, sessionize,
                   text dedup (exact/minhash/simhash), similarity search, text analysis
    plans/      -- statements_annual (v1/v2/v3), ratios_annual, API query builders,
                   star-schema facts adapter
    streaming/  -- Structured Streaming variants of the event operators

Everything is DataFrame/Spark-SQL first: no RDDs, no row-at-a-time Python
UDFs in any hot path. Pandas UDFs appear only where built-ins genuinely
cannot express the op (multimodal decode stubs).
"""

__version__ = "0.1.0"
