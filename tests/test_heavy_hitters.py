"""Heavy hitters: exactness vs plain groupBy on skewed data, the candidate
superset guarantee across partitions, and the bounded candidate volume."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from live_social_media_sentiment_trend_tracker_using_kafka_spark.operators.heavy_hitters import (
    heavy_hitters,
)


def _zipf_ish(spark):
    # hot items h0/h1 cover half the data; 400 near-unique tail items
    hot = spark.range(500).select(
        F.concat(F.lit("h"), (F.col("id") % 2).cast("string")).alias("item")
    )
    tail = spark.range(500).select(
        F.concat(F.lit("t"), (F.col("id") % 400).cast("string")).alias("item")
    )
    return hot.unionAll(tail).repartition(8)


def test_exact_vs_plain_groupby(spark):
    df = _zipf_ish(spark)
    phi = 0.05
    got = [(r.item, r["count"]) for r in heavy_hitters(df, "item", phi).collect()]
    total = df.count()
    want = [
        (r.item, r["count"])
        for r in df.groupBy("item")
        .count()
        .filter(F.col("count") >= -(-phi * total // 1))
        .orderBy(F.desc("count"), F.asc("item"))
        .collect()
    ]
    assert got == want
    assert {i for i, _ in got} == {"h0", "h1"}
    assert all(c == 250 for _, c in got)


def test_heavy_item_split_across_partitions_found(spark):
    # the heavy item's rows are scattered over all partitions; per-partition
    # MG must still surface it somewhere
    df = (
        spark.range(1000)
        .select(
            F.when(F.col("id") % 10 == 0, F.lit("heavy"))
            .otherwise(F.concat(F.lit("u"), F.col("id").cast("string")))
            .alias("item")
        )
        .repartition(16)
    )
    got = {r.item for r in heavy_hitters(df, "item", phi=0.08).collect()}
    assert got == {"heavy"}


def test_no_heavy_hitters_on_uniform(spark):
    df = spark.range(1000).select(
        F.concat(F.lit("u"), (F.col("id") % 500).cast("string")).alias("item")
    )
    assert heavy_hitters(df, "item", phi=0.1).count() == 0


def test_nulls_ignored_in_candidates(spark):
    df = spark.range(100).select(
        F.when(F.col("id") % 2 == 0, F.lit("x")).otherwise(F.lit(None)).alias("item")
    )
    rows = heavy_hitters(df, "item", phi=0.3).collect()
    assert [r.item for r in rows] == ["x"]


def test_phi_validation(spark):
    df = spark.range(10).select(F.lit("a").alias("item"))
    with pytest.raises(ValueError):
        heavy_hitters(df, "item", phi=0.0)


def test_threshold_uses_decimal_not_float(spark):
    """phi=0.07 on N=100: float64 0.07*100 = 7.000000000000001 -> ceil 8
    would drop the boundary item occurring exactly 7 times."""
    from live_social_media_sentiment_trend_tracker_using_kafka_spark.operators.heavy_hitters import (
        heavy_hitters,
    )

    rows = [("hot",)] * 7 + [(f"x{i}",) for i in range(93)]
    df = spark.createDataFrame(rows, ["item"])
    got = {r.item: r["count"] for r in heavy_hitters(df, "item", phi=0.07).collect()}
    assert got == {"hot": 7}


def test_null_items_excluded_consistently(spark):
    from live_social_media_sentiment_trend_tracker_using_kafka_spark.operators.heavy_hitters import (
        heavy_hitters,
    )

    rows = [("a",)] * 6 + [(None,)] * 10 + [(f"x{i}",) for i in range(4)]
    df = spark.createDataFrame(rows, ["item"])
    # N = 10 non-null rows; a (6) >= ceil(0.5*10); nulls never reported
    got = {r.item: r["count"] for r in heavy_hitters(df, "item", phi=0.5).collect()}
    assert got == {"a": 6}
