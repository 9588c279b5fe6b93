"""End-to-end Kafka round-trip smoke, env-gated.

The sandbox ships no Kafka broker (and no spark-sql-kafka jar), so the
tested streaming path everywhere else is the file-stream twin
(streaming/pipeline.py). When a real broker IS available — set
``KAFKA_BOOTSTRAP=host:port`` — this module exercises the genuine
S1→S3→S2 chain: produce typed posts through the Kafka sink
(sources/readers.py write_kafka), read them back through the Kafka
source (kafka_stream), decode (decode_json_value), and assert the
round-tripped rows match. Keeps the only unit-only SURVEY §2 rows
honest without faking a broker.
"""

from __future__ import annotations

import os
import uuid

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("KAFKA_BOOTSTRAP"),
    reason="no Kafka broker in this environment (set KAFKA_BOOTSTRAP=host:port to run)",
)


def test_kafka_round_trip(spark, tmp_path):
    from live_social_media_sentiment_trend_tracker_using_kafka_spark.sources.readers import (
        decode_json_value,
        kafka_stream,
        write_kafka,
    )

    bootstrap = os.environ["KAFKA_BOOTSTRAP"]
    topic = f"spark_graft_smoke_{uuid.uuid4().hex[:8]}"

    posts = spark.createDataFrame(
        [
            ("p1", "great product", "twitter", "en", "2024-01-01T00:00:00"),
            ("p2", "terrible day", "reddit", "en", "2024-01-01T00:00:01"),
        ],
        "id string, text string, platform string, lang string, timestamp string",
    )
    # batch producer path (S2)
    write_kafka(posts, topic, bootstrap_servers=bootstrap)

    # streaming source (S1) + JSON decode (S3), drained via availableNow
    stream = kafka_stream(
        spark, topic=topic, bootstrap_servers=bootstrap, starting_offsets="earliest"
    )
    decoded = decode_json_value(stream)
    q = (
        decoded.writeStream.format("memory")
        .queryName("kafka_smoke")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["id"], r["text"], r["platform"])
        for r in spark.table("kafka_smoke").collect()
    }
    assert got == {
        ("p1", "great product", "twitter"),
        ("p2", "terrible day", "reddit"),
    }
