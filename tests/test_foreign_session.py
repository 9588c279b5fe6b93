"""Regression: the reader must work on a session the repo did NOT build.

Round-1 failure mode: ``spark.sql.legacy.parquet.nanosAsLong`` was only set
by ``build_session``; a harness-supplied plain session hit
``PARQUET_TYPE_ILLEGAL`` on events.parquet (TIMESTAMP(NANOS)). Spark >= 4.1
reads the type natively as TIMESTAMP_NTZ; ``table()`` additionally retries
with the legacy conf on older Sparks. ``newSession()`` gives an isolated
SQLConf sharing the same JVM — the cheapest faithful stand-in for a foreign
session.
"""

from __future__ import annotations

from live_social_media_sentiment_trend_tracker_using_kafka_spark.sources.readers import table

from conftest import SF_SMOKE


def test_table_reads_events_on_foreign_session(spark):
    foreign = spark.newSession()
    df = table(foreign, "events", SF_SMOKE)
    # Native nanos read (>=4.1) gives TIMESTAMP_NTZ; legacy fallback converts
    # long → NTZ. Either way the column must be a microsecond timestamp type.
    assert df.schema["ts"].dataType.typeName() in {"timestamp", "timestamp_ntz"}
    assert df.count() > 0


def test_entry_runs_on_foreign_session(spark):
    import __spark_entry__ as entrymod

    foreign = spark.newSession()
    out = entrymod.entry(foreign)
    assert out.count() >= 0
