"""As-of join semantics: inclusive vs strict boundaries, no-match nulls,
carry-forward across multiple right rows, key isolation — plus oracle parity
via the contract query (tests/test_oracle_parity.py covers sf0.001)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import types as T

from live_social_media_sentiment_trend_tracker_using_kafka_spark.operators.asof import asof_join

TS = lambda s: dt.datetime.fromisoformat(s)

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
        T.StructField("px", T.DoubleType(), False),
    ]
)


def _fixture(spark):
    left = spark.createDataFrame(
        [
            (1, "a", TS("2024-01-01 10:00:00")),  # before any right row
            (2, "a", TS("2024-01-01 10:05:00")),  # equal to right ts
            (3, "a", TS("2024-01-01 10:20:00")),  # after two right rows
            (4, "b", TS("2024-01-01 10:30:00")),  # other key
            (5, "c", TS("2024-01-01 10:30:00")),  # key with no right rows
        ],
        LEFT_SCHEMA,
    )
    right = spark.createDataFrame(
        [
            ("a", TS("2024-01-01 10:05:00"), 1.0),
            ("a", TS("2024-01-01 10:10:00"), 2.0),
            ("b", TS("2024-01-01 10:00:00"), 9.0),
        ],
        RIGHT_SCHEMA,
    )
    return left, right


def test_asof_inclusive(spark):
    left, right = _fixture(spark)
    got = {r.id: (r.r_px, r.r_ts) for r in asof_join(left, right, "k").collect()}
    assert got[1] == (None, None)                          # nothing at-or-before
    assert got[2] == (1.0, TS("2024-01-01 10:05:00"))      # equal ts matches
    assert got[3] == (2.0, TS("2024-01-01 10:10:00"))      # latest of two
    assert got[4] == (9.0, TS("2024-01-01 10:00:00"))      # key isolation
    assert got[5] == (None, None)                          # no right rows for key


def test_asof_strict_excludes_equal_ts(spark):
    left, right = _fixture(spark)
    got = {r.id: r.r_px for r in asof_join(left, right, "k", strict=True).collect()}
    assert got[2] is None   # 10:05 right row no longer visible at left 10:05
    assert got[3] == 2.0    # strictly-earlier rows still match


def test_asof_null_keys_and_ts_never_match(spark):
    """SQL equality never matches NULL: a null-key left row gets a null
    payload (not a match with a null-key right row), and null-ts right rows
    are ignored entirely."""
    left = spark.createDataFrame(
        [(1, None, TS("2024-01-01 10:10:00")), (2, "a", TS("2024-01-01 10:10:00"))],
        T.StructType(
            [
                T.StructField("id", T.LongType(), False),
                T.StructField("k", T.StringType(), True),
                T.StructField("ts", T.TimestampType(), False),
            ]
        ),
    )
    right = spark.createDataFrame(
        [
            (None, TS("2024-01-01 10:00:00"), 5.0),   # null key: never matches
            ("a", None, 7.0),                          # null ts: never matches
            ("a", TS("2024-01-01 10:05:00"), 1.0),
        ],
        T.StructType(
            [
                T.StructField("k", T.StringType(), True),
                T.StructField("ts", T.TimestampType(), True),
                T.StructField("px", T.DoubleType(), False),
            ]
        ),
    )
    got = {r.id: r.r_px for r in asof_join(left, right, "k").collect()}
    assert got[1] is None
    assert got[2] == 1.0


def test_asof_preserves_left_rows_and_columns(spark):
    left, right = _fixture(spark)
    out = asof_join(left, right, "k")
    assert out.count() == left.count()
    assert out.columns == ["id", "k", "ts", "r_ts", "r_px"]


def test_asof_forward_strict_inclusive_and_tolerance(spark):
    """Forward as-of: inclusive matches an equal-ts right row, strict
    skips to the next one, and the tolerance nulls the payload without
    dropping the left row."""
    import datetime as dt

    from live_social_media_sentiment_trend_tracker_using_kafka_spark.operators.asof import (
        asof_join_forward,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame(
        [(1, 7, t0), (2, 7, t0 + dt.timedelta(hours=5)), (3, 8, t0)],
        "lid long, user_id long, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [
            (7, t0, 10.0),                            # equal-ts row for user 7
            (7, t0 + dt.timedelta(hours=2), 20.0),    # 2h later
            (8, t0 + dt.timedelta(days=3), 30.0),     # beyond tolerance for user 8
        ],
        "user_id long, ts timestamp_ntz, v double",
    )
    inc = {r["lid"]: r for r in asof_join_forward(
        left, right, "user_id", tolerance="1 DAY").collect()}
    assert inc[1]["r_v"] == 10.0            # inclusive: equal ts matches
    strict = {r["lid"]: r for r in asof_join_forward(
        left, right, "user_id", strict=True, tolerance="1 DAY").collect()}
    assert strict[1]["r_v"] == 20.0         # strict: skips the equal-ts row
    assert strict[2]["r_v"] is None         # user 7 at +5h: no later purchase... 
    assert strict[3]["r_v"] is None         # match exists at +3d but horizon nulls it
    assert strict[3]["r_ts"] is None
    assert len(strict) == 3                 # every left row survives


def test_asof_tie_break_on_right_payload_is_deterministic(spark):
    """Multiple right rows sharing (key, ts): the window now orders on the
    payload struct too, so backward keeps the LARGEST payload and forward
    the SMALLEST — stable run-to-run instead of partition-order luck."""
    from live_social_media_sentiment_trend_tracker_using_kafka_spark.operators.asof import (
        asof_join_forward,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame([("u", t0)], "k string, ts timestamp")
    right = spark.createDataFrame(
        [("u", t0, v) for v in ("b", "c", "a")], "k string, ts timestamp, v string"
    )
    for _ in range(3):
        back = asof_join(left, right, "k").collect()[0]
        fwd = asof_join_forward(left, right, "k").collect()[0]
        assert back["r_v"] == "c"  # largest (ts, v) struct wins backward
        assert fwd["r_v"] == "a"  # smallest wins forward


def test_asof_map_payload_raises_named_error(spark):
    """A MapType payload column can't ride through the deterministic `_r`
    tie-break (Spark can't order maps); the operator must name the column
    in a ValueError instead of dying later with an AnalysisException."""
    import pytest

    from live_social_media_sentiment_trend_tracker_using_kafka_spark.operators.asof import (
        asof_join_forward,
    )

    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame([("u", t0)], "k string, ts timestamp")
    right = spark.createDataFrame(
        [("u", t0, {"a": 1})], "k string, ts timestamp, props map<string,int>"
    )
    with pytest.raises(ValueError, match="props"):
        asof_join(left, right, "k")
    with pytest.raises(ValueError, match="props"):
        asof_join_forward(left, right, "k")
    # nested: map inside a struct is also named with its path
    right2 = right.selectExpr("k", "ts", "named_struct('inner', props) AS wrap")
    with pytest.raises(ValueError, match="wrap.inner"):
        asof_join(left, right2, "k")
    # excluding the offending column via right_cols works
    right3 = right.withColumn("px", right["ts"].cast("long"))
    assert asof_join(left, right3, "k", right_cols=["ts", "px"]).count() == 1
