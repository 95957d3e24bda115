"""Canonical schemas for the engine's own tables (SURVEY.md §1.3).

Mirrors the reference's Postgres data model (backend/src/models.py:20-55
plus migrations 5027f84c0e0f, 905a6fc28d5c) mapped onto Spark types:
JSON → MapType/string, VECTOR(n) → array<double>, UUID → string.
"""

from __future__ import annotations

from pyspark.sql import types as T

EMBEDDING_DIMS = 64  # testdata dimensionality; the reference uses 1024

# web_pages (reference models.py:22-41)
WEB_PAGES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("domain", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("meta_description", T.StringType(), True),
        T.StructField("meta_tags", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("meta_tags_json", T.StringType(), True),  # F9 storage contract
        T.StructField("content", T.StringType(), True),
        T.StructField("embedding", T.ArrayType(T.DoubleType()), True),
        T.StructField("file_type", T.StringType(), False),       # html|pdf|image
        T.StructField("embedding_type", T.StringType(), False),  # text|vision
        T.StructField("structured_data", T.StringType(), True),  # JSON string
        T.StructField("last_crawled", T.TimestampType(), True),
    ]
)

# crawl items as emitted by the parse stage, before embedding
# (reference dynamic_spider.py:69-77 item dict + links for the frontier)
PAGE_ITEM = T.StructType(
    [
        T.StructField("url", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("meta_description", T.StringType(), True),
        T.StructField("meta_tags", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("content", T.StringType(), True),
        T.StructField("file_type", T.StringType(), True),
        T.StructField("embedding_type", T.StringType(), True),
        T.StructField("links", T.ArrayType(T.StringType()), True),
        T.StructField("error", T.StringType(), True),  # dead-letter branch (D5)
    ]
)

# fetched raw responses entering the parse stage (S5)
FETCHED = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("body", T.BinaryType(), True),
        T.StructField("fetch_error", T.StringType(), True),
    ]
)

# jobs (reference models.py:43-55)
JOBS = T.StructType(
    [
        T.StructField("id", T.StringType(), False),       # UUID string
        T.StructField("status", T.StringType(), False),   # pending|queued|running|completed|failed
        T.StructField("parameters", T.StringType(), True),  # JSON string
        T.StructField("result", T.StringType(), True),      # JSON string
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("updated_at", T.TimestampType(), True),
    ]
)

JOB_STATES = ["pending", "queued", "running", "completed", "failed"]

# feature_flags (reference alembic 4d700d415774:24-52)
FEATURE_FLAGS = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("is_enabled", T.BooleanType(), False),
        T.StructField("description", T.StringType(), True),
    ]
)

DEFAULT_FLAGS = [
    (1, "chat_ui", True, "Gates the RAG chat surface"),
    (2, "multimodal_embeddings", True, "Vision embeddings for image items"),
    (3, "structured_data_extraction", False, "LLM structured extraction at ingest"),
]
