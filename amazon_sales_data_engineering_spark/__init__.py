"""amazon_sales_data_engineering_spark — a from-scratch, PySpark-native
analytics engine with the query and data-processing capabilities of the
reference Snowflake/Snowpark ELT pipeline (umairkarel/Amazon-Sales-Data-
Engineering), re-expressed Spark-first, plus large-scale training-data
pipeline operators (dedup, similarity search, text analysis, multimodal).

Layout
------
- ``session``    SparkSession factory (scale-aware defaults).
- ``tables``     testdata table loaders.
- ``plans``      the query registry: every operator exposed as a named query
                 with a DuckDB oracle (the correctness gate).
- ``operators``  reusable distributed algorithms (dedup, sequences, date
                 spine, similarity, star joins, set ops, delta loads).
- ``functions``  column-expression helpers (portable hashing, text metrics).
- ``sources``    readers/sinks/file-ledger (reference steps 2-3 parity).
- ``pipeline``   the sales ELT pipeline (reference steps 4-5 parity).
- ``streaming``  Structured Streaming profile of the incremental patterns.
- ``multimodal`` binary-column plumbing (decode stubs, mapInPandas).
"""

__version__ = "0.1.0"
