"""crawler_spark — a PySpark-native analytics engine.

A brand-new, Spark-first implementation of the query and data-processing
capabilities of the reference crawler/semantic-search engine
(karthickvalentino/crawler), re-expressed as DataFrame/SQL plans that
Catalyst can optimize, plus the large-scale training-data-pipeline
operators (dedup, similarity search, multimodal columns, text analysis)
such an engine needs at 100 TB scale.

Layout:
    session.py      SparkSession factory (AQE, Arrow, UTC, tuned shuffle)
    sources/        parquet table loaders for the test corpus + item sources
    functions/      scalar/vector/text expression builders (JVM-side first)
    operators/      relational, dedup, similarity, upsert operators
    plans/          composed query plans (search API, dashboard, ingest)
    streaming/      structured-streaming variants of the ingest pipeline
"""

__version__ = "0.1.0"
