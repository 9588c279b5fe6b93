"""Property-based tests (hypothesis): randomized inputs against independent
reference implementations. Example counts are kept small — every example
runs Spark jobs — but each run explores fresh corners deterministically
(derandomize) so CI stays stable.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import given, settings, HealthCheck, strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from live_social_media_sentiment_trend_tracker_using_kafka_spark.operators.asof import asof_join
from live_social_media_sentiment_trend_tracker_using_kafka_spark.operators.heavy_hitters import (
    heavy_hitters,
)
from live_social_media_sentiment_trend_tracker_using_kafka_spark.operators.skew import (
    salted_group_count,
)

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

BASE = dt.datetime(2024, 1, 1)

LEFT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("k", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
    ]
)
RIGHT_SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("px", T.LongType(), False),
    ]
)

keys = st.sampled_from(["a", "b", "c"])
seconds = st.integers(min_value=0, max_value=120)


@settings(**SETTINGS)
@given(
    left=st.lists(st.tuples(keys, seconds), min_size=1, max_size=12),
    right=st.lists(st.tuples(keys, seconds), min_size=1, max_size=12),
)
def test_asof_matches_pandas_merge_asof(spark, left, right):
    # dedupe right on (k, ts) — ties are undefined in both engines
    right = list({(k, s): None for k, s in right}.keys())
    lrows = [(i, k, BASE + dt.timedelta(seconds=s)) for i, (k, s) in enumerate(left)]
    rrows = [(k, BASE + dt.timedelta(seconds=s), 1000 + i) for i, (k, s) in enumerate(right)]
    ldf = spark.createDataFrame(lrows, LEFT_SCHEMA)
    rdf = spark.createDataFrame(rrows, RIGHT_SCHEMA)
    got = {r.id: r.r_px for r in asof_join(ldf, rdf, "k").collect()}

    lpd = pd.DataFrame(lrows, columns=["id", "k", "ts"]).sort_values("ts", kind="stable")
    rpd = pd.DataFrame(rrows, columns=["k", "ts", "px"]).sort_values("ts", kind="stable")
    merged = pd.merge_asof(lpd, rpd, on="ts", by="k", direction="backward")
    want = {
        int(r.id): (None if pd.isna(r.px) else int(r.px)) for r in merged.itertuples()
    }
    assert got == want


@settings(**SETTINGS)
@given(
    items=st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=60),
    phi_pct=st.integers(min_value=5, max_value=60),
)
def test_heavy_hitters_matches_exact(spark, items, phi_pct):
    phi = phi_pct / 100.0
    df = spark.createDataFrame([(x,) for x in items], ["item"])
    got = {(r.item, r["count"]) for r in heavy_hitters(df, "item", phi).collect()}
    counts = pd.Series(items).value_counts()
    thresh = -(-phi * len(items) // 1)  # ceil
    want = {(k, int(v)) for k, v in counts.items() if v >= thresh}
    assert got == want


@settings(**SETTINGS)
@given(
    rows=st.lists(st.tuples(st.sampled_from("xyz"), st.integers(0, 999)),
                  min_size=1, max_size=40),
    buckets=st.integers(min_value=1, max_value=8),
)
def test_salted_count_matches_plain(spark, rows, buckets):
    df = spark.createDataFrame(rows, ["k", "v"])
    got = {
        (r.k, r["count"])
        for r in salted_group_count(df, ["k"], salt_buckets=buckets, det_col="v").collect()
    }
    want = {(r.k, r["count"]) for r in df.groupBy("k").count().collect()}
    assert got == want
