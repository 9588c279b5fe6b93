"""Canonical typed schemas.

POST_SCHEMA mirrors the reference consumer's explicit StructType
(reference: consumer/spark_streaming_job.py:92-106): a flat post record with
one nested ``location`` struct and a string event timestamp written by the
producer as ``yyyy-MM-dd HH:mm:ss`` (reference: producer/kafka_producer.py:77).

TESTDATA_TABLES lists the driver's synthetic tables (/root/testdata/sf*/,
see TESTDATA.md) — a TPC-H-ish star schema plus ``events`` (stream-shaped),
``documents`` and ``embeddings`` (LLM-pipeline extensions).
"""

from __future__ import annotations

from pyspark.sql import types as T

TIMESTAMP_FMT = "yyyy-MM-dd HH:mm:ss"

LOCATION_SCHEMA = T.StructType(
    [
        T.StructField("city", T.StringType(), True),
        T.StructField("country", T.StringType(), True),
    ]
)

# Raw post as carried on the wire (Kafka JSON value / JSON-lines files).
POST_SCHEMA = T.StructType(
    [
        T.StructField("text", T.StringType(), True),
        T.StructField("user", T.StringType(), True),
        T.StructField("platform", T.StringType(), True),
        T.StructField("user_followers", T.IntegerType(), True),
        T.StructField("likes", T.IntegerType(), True),
        T.StructField("retweets", T.IntegerType(), True),
        T.StructField("location", LOCATION_SCHEMA, True),
        T.StructField("timestamp", T.StringType(), True),
    ]
)

# Enriched post produced by operators.enrich.enrich_posts — the reference's
# stream output shape (consumer/spark_streaming_job.py:121-136) with typed
# event time added.
# Dashboard-side defaults used when normalizing untyped input
# (reference: dashboard/streamlit_app.py:203-220).
POST_DEFAULTS: dict[str, object] = {
    "text": "",
    "user": "unknown",
    "platform": "unknown",
    "sentiment_label": "neutral",
    "sentiment_score": 0.0,
    "likes": 0,
    "retweets": 0,
    "user_followers": 0,
    "city": "Unknown",
    "country": "Unknown",
}

TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
