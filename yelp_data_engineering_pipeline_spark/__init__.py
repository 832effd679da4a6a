"""PySpark-native analytics engine re-expressing the capabilities of
malbiruk/yelp-data-engineering-pipeline (reference at /root/reference,
surveyed in SURVEY.md) as idiomatic Spark DataFrame / SQL dataflow,
plus LLM-data-pipeline extensions (dedup, similarity search, text
analysis, multimodal columns) designed for 100 TB scale.

Layout
------
- ``session``    SparkSession factory (AQE on, UTC, Arrow on).
- ``tables``     explicit-schema loaders for the synthetic star schema.
- ``schemas``    yelp-domain StructTypes (scrape output, star schema).
- ``sources/``   NDJSON / text / JDBC / HTTP-fetch sources and sinks.
- ``functions/`` scalar-function library (hours parsing, URL, JSON).
- ``operators/`` relational + scale operators (pagination, dim-merge,
                 dedup, similarity, text analysis, multimodal).
- ``plans/``     end-to-end dataflows (normalize ETL, endpoint queries).
- ``streaming/`` Structured Streaming variants of the incremental logic.
"""

__version__ = "0.1.0"
