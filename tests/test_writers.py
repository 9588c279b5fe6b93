"""Tests for the scale-layout writers: partition pruning actually prunes,
bucketed joins actually skip the exchange."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from live_social_media_sentiment_trend_tracker_using_kafka_spark.plans import plan_text
from live_social_media_sentiment_trend_tracker_using_kafka_spark.sources.readers import table
from live_social_media_sentiment_trend_tracker_using_kafka_spark.sources.writers import (
    compact,
    write_bucketed,
    write_partitioned,
)

SF = "/root/testdata/sf0.01"


def test_partitioned_write_prunes(spark, tmp_path):
    ev = table(spark, "events", SF).withColumn("day", F.to_date("ts"))
    out = str(tmp_path / "ev_part")
    write_partitioned(ev, out, ["day"])
    back = spark.read.parquet(out)
    one_day = back.filter(F.col("day") == "2024-01-03")
    assert one_day.count() == ev.filter(F.to_date("ts") == "2024-01-03").count()
    # partition pruning is visible in the scan node
    plan = plan_text(one_day)
    assert "PartitionFilters" in plan and "day" in plan.split("PartitionFilters")[1][:200], plan


def test_bucketed_join_skips_shuffle(spark, tmp_path):
    orders = table(spark, "orders", SF)
    customer = table(spark, "customer", SF)
    write_bucketed(orders, "orders_b", ["o_custkey"], num_buckets=8)
    write_bucketed(
        customer.withColumnRenamed("c_custkey", "o_custkey"), "customer_b", ["o_custkey"], num_buckets=8
    )
    try:
        a = spark.table("orders_b")
        b = spark.table("customer_b")
        # disable auto-broadcast so the join would otherwise shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        joined = a.join(b, "o_custkey")
        plan = plan_text(joined)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan  # buckets align, no shuffle
        assert joined.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")


def test_compact_controls_file_count(spark, tmp_path):
    ev = table(spark, "events", SF)
    out = str(tmp_path / "compacted")
    compact(ev, 3).write.mode("overwrite").parquet(out)
    files = [p for p in __import__("pathlib").Path(out).glob("part-*.parquet")]
    assert len(files) == 3


def test_orc_roundtrip_partitioned(spark, tmp_path):
    # format breadth: the partitioned writer + pruning path works for ORC
    # (builtin) exactly as for parquet
    from live_social_media_sentiment_trend_tracker_using_kafka_spark.sources.writers import write_partitioned
    from live_social_media_sentiment_trend_tracker_using_kafka_spark.sources.readers import table

    from conftest import SF_SMOKE

    docs = table(spark, "documents", SF_SMOKE).limit(200)
    out = str(tmp_path / "docs_orc")
    write_partitioned(docs, out, ["lang"], fmt="orc")
    back = spark.read.orc(out)
    assert back.count() == 200
    a = sorted((r.doc_id, r.n_chars) for r in docs.select("doc_id", "n_chars").collect())
    b = sorted((r.doc_id, r.n_chars) for r in back.select("doc_id", "n_chars").collect())
    assert a == b


def test_csv_posts_read_typed_and_permissive(spark, tmp_path):
    from live_social_media_sentiment_trend_tracker_using_kafka_spark.sources.readers import read_posts_csv
    from live_social_media_sentiment_trend_tracker_using_kafka_spark.schema import POST_SCHEMA

    p = tmp_path / "posts.csv"
    p.write_text(
        "text,user,platform,user_followers,likes,retweets,"
        "location_city,location_country,timestamp\n"
        "hello world,alice,twitter,100,5,2,berlin,de,2024-01-01T00:00:00\n"
        "not_an_int_row,bob,reddit,notint,1,1,paris,fr,2024-01-02T00:00:00\n"
    )
    df = read_posts_csv(spark, str(p))
    # canonical shape: same columns and types as the JSON reader
    assert df.schema == POST_SCHEMA or [f.name for f in df.schema.fields] == [
        f.name for f in POST_SCHEMA.fields
    ]
    rows = {r.user: r for r in df.collect()}
    assert rows["alice"].location.city == "berlin"
    assert rows["alice"].user_followers == 100
    # PERMISSIVE: the malformed int nulls out, the row survives
    assert rows["bob"].user_followers is None
    assert rows["bob"].location.country == "fr"
