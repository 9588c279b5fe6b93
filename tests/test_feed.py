"""Tests for the producer-side surface: A4 banding, S7 multiline fixture
read, P14 produce-time stamp, P15 feed simulator."""

from __future__ import annotations

import json
import re

from pyspark.sql import functions as F

from live_social_media_sentiment_trend_tracker_using_kafka_spark.operators.analytics import (
    global_stats,
    mean_band_col,
)
from live_social_media_sentiment_trend_tracker_using_kafka_spark.sources.feed import (
    assign_fixture_rows,
    feed_simulator,
    stamp_produce_time,
)
from live_social_media_sentiment_trend_tracker_using_kafka_spark.sources.readers import (
    read_posts_json,
)

FIXTURE_POSTS = [
    {
        "text": "I love this new product! #amazing #happy",
        "user": "user123",
        "platform": "twitter",
        "user_followers": 1500,
        "likes": 25,
        "retweets": 5,
        "location": {"city": "New York", "country": "USA"},
    },
    {
        "text": "This service is terrible #disappointed #angry",
        "user": "user456",
        "platform": "facebook",
        "user_followers": 800,
        "likes": 2,
        "retweets": 0,
        "location": {"city": "London", "country": "UK"},
    },
]


def test_mean_band_thresholds(spark):
    df = spark.createDataFrame(
        [(0.5,), (0.1,), (0.0,), (-0.1,), (-0.5,)], ["m"]
    ).withColumn("band", mean_band_col(F.col("m")))
    got = {r.m: r.band for r in df.collect()}
    # Strict > on both boundaries, like the dashboard's chained conditionals.
    assert got[0.5] == "positive"
    assert got[0.1] == "neutral"
    assert got[0.0] == "neutral"
    assert got[-0.1] == "negative"
    assert got[-0.5] == "negative"


def test_global_stats_band_column(spark):
    df = spark.createDataFrame([(1.0,), (2.0,)], ["value"])
    row = global_stats(df, ["value"], band_on="value").collect()[0]
    assert row.total_rows == 2
    assert row.avg_value == 1.5
    assert row.value_band == "positive"


def test_multiline_fixture_read(spark, tmp_path):
    # The reference producer's fixture: ONE file holding a JSON array.
    p = tmp_path / "mock_social_media.json"
    p.write_text(json.dumps(FIXTURE_POSTS, indent=2))
    df = read_posts_json(spark, str(p), multiline=True)
    rows = df.collect()
    assert len(rows) == 2
    assert {r.platform for r in rows} == {"twitter", "facebook"}
    assert rows[0].location is not None
    # Line-mode read of the same file must NOT parse it (it's not JSONL).
    bad = read_posts_json(spark, str(p)).collect()
    assert all(r.text is None for r in bad)


def test_stamp_produce_time_format(spark):
    df = spark.createDataFrame([("a",)], ["text"])
    out = stamp_produce_time(df).collect()[0]
    assert re.fullmatch(r"\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}", out.timestamp)


def test_assign_fixture_rows_uniform_and_deterministic(spark):
    fixture = spark.createDataFrame(
        [(p["text"], p["platform"]) for p in FIXTURE_POSTS], ["text", "platform"]
    )
    ticks = spark.range(200).select(F.col("id").alias("value"))
    out = assign_fixture_rows(ticks, fixture)
    assert out.count() == 200
    counts = {r.platform: r.cnt for r in out.groupBy("platform").agg(F.count("*").alias("cnt")).collect()}
    # Pseudo-random choice hits every fixture row a non-trivial number of times.
    assert set(counts) == {"twitter", "facebook"}
    assert min(counts.values()) > 50
    # Deterministic: same ticks + seed → identical assignment.
    again = assign_fixture_rows(ticks, fixture)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_assign_fixture_rows_is_broadcast(spark):
    fixture = spark.createDataFrame([("a",), ("b",)], ["text"])
    ticks = spark.range(10).select(F.col("id").alias("value"))
    plan = assign_fixture_rows(ticks, fixture)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_feed_simulator_streams_fixture_rows(spark, tmp_path):
    fixture = spark.createDataFrame(
        [(p["text"], p["platform"]) for p in FIXTURE_POSTS], ["text", "platform"]
    )
    stream = feed_simulator(spark, fixture, rows_per_second=50)
    assert stream.isStreaming
    assert set(stream.columns) == {"text", "platform", "timestamp"}
    q = (
        stream.writeStream.format("memory")
        .queryName("feed_sim_test")
        .outputMode("append")
        .start()
    )
    try:
        import time

        deadline = time.time() + 30
        while time.time() < deadline:
            if spark.table("feed_sim_test").count() >= 5:
                break
            q.processAllAvailable()
            time.sleep(0.5)
        got = spark.table("feed_sim_test")
        assert got.count() >= 5
        texts = {r.text for r in got.select("text").distinct().collect()}
        assert texts <= {p["text"] for p in FIXTURE_POSTS}
    finally:
        q.stop()
