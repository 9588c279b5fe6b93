"""Tests for the dynamic-schema normalization operator (P10-P13): the
dashboard's defensive coercions over untyped/partial input."""

from __future__ import annotations

from live_social_media_sentiment_trend_tracker_using_kafka_spark.operators.normalize import normalize_posts


def test_missing_columns_get_defaults(spark):
    df = spark.createDataFrame([("hello", "2024-01-01 10:00:00")], ["text", "timestamp"])
    out = normalize_posts(df)
    row = out.collect()[0]
    assert row.platform == "unknown"
    assert row.sentiment_label == "neutral"
    assert row.likes == 0 and row.retweets == 0 and row.user_followers == 0
    assert row.city == "Unknown" and row.country == "Unknown"
    assert row.hashtags == []


def test_numeric_coercion_bad_values(spark):
    df = spark.createDataFrame(
        [("a", "12", "xx", None), ("b", "3.5", "7", "2.0")],
        ["text", "likes", "retweets", "sentiment_score"],
    )
    out = {r.text: r for r in normalize_posts(df).collect()}
    assert out["a"].likes == 12
    assert out["a"].retweets == 0          # unparseable -> default
    assert out["a"].sentiment_score == 0.0  # null -> default
    assert out["b"].retweets == 7
    assert out["b"].sentiment_score == 2.0


def test_timestamp_fallback_chain(spark):
    df = spark.createDataFrame(
        [
            ("a", None, "2024-02-02 08:00:00", None),
            ("b", "2024-01-01 10:30:00", "2024-02-02 08:00:00", None),
            ("c", None, "not a date", "2024-03-03 12:00:00"),
        ],
        ["text", "processing_timestamp", "timestamp", "created_at"],
    )
    out = {r.text: r for r in normalize_posts(df).collect()}
    assert str(out["a"].event_ts) == "2024-02-02 08:00:00"
    assert str(out["b"].event_ts) == "2024-01-01 10:30:00"   # first in chain wins
    assert str(out["c"].event_ts) == "2024-03-03 12:00:00"   # skips unparseable


def test_hashtag_cell_normalization(spark):
    df = spark.createDataFrame(
        [("a", "['x', 'y']"), ("b", "plain"), ("c", None)],
        ["text", "hashtags"],
    )
    out = {r.text: r for r in normalize_posts(df).collect()}
    assert out["a"].hashtags == ["x", "y"]   # stringified list re-parsed
    assert out["b"].hashtags == ["plain"]    # scalar -> singleton
    assert out["c"].hashtags == []           # null -> empty

    typed = spark.createDataFrame([("d", ["k"])], ["text", "hashtags"])
    assert normalize_posts(typed).collect()[0].hashtags == ["k"]


def test_numeric_coercion_through_double(spark):
    """P10 must accept decimal strings and double-typed inputs like pandas
    to_numeric — a direct string->int try_cast zeroed them."""
    df = spark.createDataFrame(
        [("3.5", 12.0, "2500000000")], ["likes", "retweets", "user_followers"]
    )
    from live_social_media_sentiment_trend_tracker_using_kafka_spark.operators.normalize import (
        normalize_posts,
    )

    row = normalize_posts(df).first()
    assert row.likes == 3  # truncates toward zero like pandas astype(int)
    assert row.retweets == 12
    # > int32 max still nulls on the int cast -> default (documented bound)
    assert row.user_followers == 0


def test_hashtag_apostrophe_cell_keeps_wellformed_tags(spark):
    df = spark.createDataFrame([("['rock'n'roll', 'ok']",)], ["hashtags"])
    from live_social_media_sentiment_trend_tracker_using_kafka_spark.operators.normalize import (
        normalize_posts,
    )

    tags = normalize_posts(df).first().hashtags
    assert "ok" in tags  # the valid tag survives the malformed neighbor
    # delimiter-anchored quotes recover the apostrophe'd tag WHOLE
    assert "rock'n'roll" in tags


def test_hashtag_cell_tag_body_may_span_newlines(spark):
    """(?s) in the extraction regex: a tag whose body contains \\n (pasted
    multi-line cells) is recovered instead of silently dropped (r4 ADVICE)."""
    from live_social_media_sentiment_trend_tracker_using_kafka_spark.operators.normalize import (
        normalize_posts,
    )

    df = spark.createDataFrame([("['multi\nline'tag', 'ok']",)], ["hashtags"])
    tags = normalize_posts(df).first().hashtags
    assert "ok" in tags
    assert "multi\nline'tag" in tags


def test_enrich_survives_malformed_timestamp(spark):
    from live_social_media_sentiment_trend_tracker_using_kafka_spark.operators.enrich import (
        enrich_posts,
    )
    from live_social_media_sentiment_trend_tracker_using_kafka_spark.schema import POST_SCHEMA

    rows = [
        ("hello world", "u", "tw", 1, 2, 3, ("c", "US"), "2024-01-01T10:00:00"),
        ("good day", "v", "tw", 1, 2, 3, ("c", "US"), "2024-01-01 10:00:00"),
    ]
    df = spark.createDataFrame(rows, POST_SCHEMA)
    got = enrich_posts(df).select("event_ts").collect()  # must not throw
    assert got[0].event_ts is None and got[1].event_ts is not None
