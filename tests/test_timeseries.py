"""time_bucket_gapfill: spine density, zero/LOCF/linear fills, per-series
partitioning, and argument validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from live_social_media_sentiment_trend_tracker_using_kafka_spark.operators.timeseries import (
    time_bucket_gapfill,
)


def _series(spark, rows):
    return spark.createDataFrame(rows, "key string, ts string, v double").select(
        "key", F.col("ts").cast("timestamp_ntz").alias("ts"), "v"
    )


@pytest.fixture(scope="module")
def sparse(spark):
    # observations at hours 0, 3 and 4; hours 1-2 are gaps
    return _series(
        spark,
        [
            ("a", "2024-05-01 00:10:00", 10.0),
            ("a", "2024-05-01 03:20:00", 40.0),
            ("a", "2024-05-01 04:05:00", 50.0),
        ],
    )


def _run(df, fill, pcols=None):
    return time_bucket_gapfill(
        df,
        ts_col="ts",
        width_seconds=3600,
        aggs={"n": F.count(F.lit(1)), "avg_v": F.avg("v")},
        fill=fill,
        partition_cols=pcols,
    )


def test_spine_is_dense_and_counts_zero_fill(spark, sparse):
    rows = _run(sparse, {"n": "zero"}).collect()
    assert [r.n for r in rows] == [1, 0, 0, 1, 1]
    assert rows[0].bucket.isoformat() == "2024-05-01T00:00:00"
    assert rows[-1].bucket.isoformat() == "2024-05-01T04:00:00"


def test_locf_carries_last_observation(spark, sparse):
    rows = _run(sparse, {"avg_v": "locf"}).collect()
    assert [r.avg_v for r in rows] == [10.0, 10.0, 10.0, 40.0, 50.0]


def test_linear_interpolates_between_observations(spark, sparse):
    rows = _run(sparse, {"avg_v": "linear"}).collect()
    assert [r.avg_v for r in rows] == [10.0, 20.0, 30.0, 40.0, 50.0]


def test_none_fill_leaves_gaps_null(spark, sparse):
    rows = _run(sparse, {}).collect()
    assert [r.avg_v for r in rows] == [10.0, None, None, 40.0, 50.0]


def test_partitioned_series_have_independent_spines(spark):
    df = _series(
        spark,
        [
            ("a", "2024-05-01 00:00:00", 1.0),
            ("a", "2024-05-01 02:00:00", 3.0),
            ("b", "2024-05-01 05:00:00", 5.0),
        ],
    )
    rows = _run(df, {"avg_v": "linear"}, pcols=["key"]).collect()
    a = [(r.key, r.avg_v) for r in rows if r.key == "a"]
    b = [(r.key, r.avg_v) for r in rows if r.key == "b"]
    assert [v for _, v in a] == [1.0, 2.0, 3.0]
    assert len(b) == 1  # single observation: spine is one bucket, no bleed


def test_null_ts_rows_ignored(spark):
    df = _series(spark, [("a", None, 9.0), ("a", "2024-05-01 00:00:00", 1.0)])
    rows = _run(df, {"n": "zero"}).collect()
    assert len(rows) == 1 and rows[0].n == 1


def test_validation_errors(spark, sparse):
    with pytest.raises(ValueError, match="at least one aggregate"):
        time_bucket_gapfill(sparse, aggs={})
    with pytest.raises(ValueError, match="not in aggs"):
        _run(sparse, {"nope": "zero"})
    with pytest.raises(ValueError, match="unknown fill"):
        _run(sparse, {"n": "bogus"})


def test_registry_query_smoke(spark):
    rows = entrymod.q_time_series_gapfill(spark, "/root/testdata/sf0.001").collect()
    assert rows
    # spine must be strictly hourly-dense between first and last bucket
    hours = (rows[-1].bucket - rows[0].bucket).total_seconds() / 3600
    assert len(rows) == int(hours) + 1
    assert any(r.n_events == 0 for r in rows), "no gaps at smoke SF — fill untested"


def test_flat_baseline_spike_is_flagged(spark):
    """Zero-variance trailing baseline (flat series) must flag a departure,
    not return NULL — the canonical post-quiet-period spike."""
    from live_social_media_sentiment_trend_tracker_using_kafka_spark.operators.timeseries import (
        with_rolling_stats,
    )

    rows = [("a", f"2024-05-01 {h:02d}:30:00", 5.0) for h in range(6)] + [
        ("a", "2024-05-01 06:30:00", 500.0)
    ]
    df = _series(spark, rows)
    hourly = _run(df, {"avg_v": "zero"})
    out = with_rolling_stats(hourly, "avg_v", window_buckets=4).collect()
    assert out[-1].is_anomaly is True
    # flat mid-series points are explicitly not anomalous (False, not None)
    assert out[3].is_anomaly is False


def test_value_trend_slope_matches_builtin_regr(spark):
    """The closed-form sums ARE ordinary least squares: agree with Spark's
    built-in regr_slope/regr_intercept to the operator's own 6-dp rounding
    granularity on real data (the operator avoids the built-ins only for
    cross-engine rounding determinism)."""
    from live_social_media_sentiment_trend_tracker_using_kafka_spark.operators.timeseries import (
        value_trend_slope,
    )

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    got = {
        r["event_type"]: r
        for r in value_trend_slope(events).collect()
    }
    x = F.datediff(F.col("ts").cast("date"), F.to_date(F.lit("2024-01-01"))).cast(
        "double"
    )
    daily = events.groupBy(F.col("event_type"), x.alias("x")).agg(
        F.avg("value").alias("y")
    )
    ref = {
        r["event_type"]: r
        for r in daily.groupBy("event_type")
        .agg(
            F.regr_slope("y", "x").alias("slope"),
            F.regr_intercept("y", "x").alias("intercept"),
        )
        .collect()
    }
    assert set(got) == set(ref) and len(got) == 5
    for et, r in ref.items():
        # operator output is rounded to 6 dp -> half-step tolerance
        assert abs(got[et]["trend_slope"] - r["slope"]) < 5.1e-7, et
        assert abs(got[et]["trend_intercept"] - r["intercept"]) < 5.1e-7, et


def test_value_trend_slope_exact_on_synthetic_line(spark):
    """y = 2x + 3 over 4 days reproduces slope 2, intercept 3 exactly; a
    group with within-day scatter regresses the daily MEANS, not raw rows."""
    from live_social_media_sentiment_trend_tracker_using_kafka_spark.operators.timeseries import (
        value_trend_slope,
    )

    rows = [("up", f"2024-01-0{d+1} 10:00:00", 2.0 * d + 3.0) for d in range(4)]
    # 'flat': two rows per day whose mean is constant 5.0 -> slope 0
    rows += [
        ("flat", "2024-01-01 01:00:00", 4.0),
        ("flat", "2024-01-01 02:00:00", 6.0),
        ("flat", "2024-01-02 01:00:00", 9.0),
        ("flat", "2024-01-02 02:00:00", 1.0),
    ]
    df = spark.createDataFrame(rows, "event_type string, ts string, value double").select(
        "event_type", F.col("ts").cast("timestamp_ntz").alias("ts"), "value"
    )
    out = {r["event_type"]: r for r in value_trend_slope(df).collect()}
    assert out["up"]["trend_slope"] == 2.0
    assert out["up"]["trend_intercept"] == 3.0
    assert out["up"]["n_days"] == 4
    assert out["flat"]["trend_slope"] == 0.0
    assert out["flat"]["trend_intercept"] == 5.0


def test_interarrival_stats_exact_moments(spark):
    """u1 gaps arriving at click: 60 s and 180 s -> mean 120, population
    std 60, cv 0.5; the first event per user contributes no gap; gaps
    attribute to the ARRIVING event's type."""
    import datetime as dt

    from live_social_media_sentiment_trend_tracker_using_kafka_spark.operators.timeseries import (
        interarrival_stats,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (0, t0, "u1", "view", 1.0),
        (1, t0 + dt.timedelta(seconds=60), "u1", "click", 1.0),
        (2, t0 + dt.timedelta(seconds=240), "u1", "click", 1.0),
        (3, t0, "u2", "view", 1.0),  # single event — no gap
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id string, event_type string, value double",
    )
    out = {r.event_type: r for r in interarrival_stats(df).collect()}
    assert set(out) == {"click"}
    r = out["click"]
    assert r.n_gaps == 2
    assert r.mean_gap_s == 120.0
    assert r.stddev_gap_s == 60.0
    assert r.burstiness_cv == 0.5


def test_weekly_revenue_growth_monday_weeks_and_deltas(spark):
    """Ship dates on a Sunday and the following Monday land in different
    Monday-start weeks; pct_change is the exact relative delta and NULL
    for the first week."""
    import datetime as dt

    from live_social_media_sentiment_trend_tracker_using_kafka_spark.operators.timeseries import (
        weekly_revenue_growth,
    )

    li = spark.createDataFrame(
        [
            (dt.datetime(2024, 1, 7), 100.0, 0.0),   # Sunday -> week of Jan 1
            (dt.datetime(2024, 1, 8), 150.0, 0.0),   # Monday -> week of Jan 8
            (dt.datetime(2024, 1, 10), 50.0, 0.5),   # same week, 25.0 net
        ],
        "l_shipdate timestamp_ntz, l_extendedprice double, l_discount double",
    )
    out = weekly_revenue_growth(li).collect()
    assert [r.week_start.date().isoformat() for r in out] == ["2024-01-01", "2024-01-08"]
    assert [r.revenue for r in out] == [100.0, 175.0]
    assert out[0].pct_change is None
    assert out[1].pct_change == 0.75


def test_profile_columns_nulls_distincts_fill_rate(spark):
    """Crafted nulls (the sf tables are dense, so the driver row alone
    would leave the null branch untested): 1 of 4 a-values null, all b
    null, c constant."""
    from live_social_media_sentiment_trend_tracker_using_kafka_spark.operators.analytics import (
        profile_columns,
    )

    df = spark.createDataFrame(
        [(1, None, "x"), (2, None, "x"), (None, None, "x"), (2, None, "x")],
        "a int, b string, c string",
    )
    out = {r.col_name: r for r in profile_columns(df, ["a", "b", "c"]).collect()}
    assert (out["a"].n_rows, out["a"].n_null, out["a"].n_distinct) == (4, 1, 2)
    assert out["a"].fill_rate == 0.75
    assert (out["b"].n_null, out["b"].n_distinct, out["b"].fill_rate) == (4, 0, 0.0)
    assert (out["c"].n_null, out["c"].n_distinct, out["c"].fill_rate) == (0, 1, 1.0)


def test_seasonality_index_hand_computed(spark):
    """Two Mondays averaging 3/day vs one Tuesday at 6: overall daily
    mean is 4, so Monday's index is 0.75 and Tuesday's 1.5."""
    import datetime as dt

    from live_social_media_sentiment_trend_tracker_using_kafka_spark.operators.timeseries import (
        seasonality_index,
    )

    rows = []
    # Mondays 2024-01-01 (2 events) and 2024-01-08 (4 events)
    for i in range(2):
        rows.append(("a", dt.datetime(2024, 1, 1, 10, i)))
    for i in range(4):
        rows.append(("a", dt.datetime(2024, 1, 8, 10, i)))
    # Tuesday 2024-01-02 (6 events)
    for i in range(6):
        rows.append(("a", dt.datetime(2024, 1, 2, 10, i)))
    df = spark.createDataFrame(rows, "event_type string, ts timestamp_ntz")
    out = {r["dow"]: r for r in seasonality_index(df).collect()}
    assert set(out) == {1, 2}
    assert out[1]["n_days"] == 2 and out[1]["avg_daily"] == 3.0
    assert out[1]["seasonal_index"] == 0.75
    assert out[2]["seasonal_index"] == 1.5


def test_cusum_changepoint_finds_level_shift(spark):
    """Daily counts 1,1,1,5,5,5: the CUSUM magnitude peaks at the last
    low day (2024-01-03), right before the level shift."""
    import datetime as dt

    from live_social_media_sentiment_trend_tracker_using_kafka_spark.operators.timeseries import (
        cusum_changepoints,
    )

    rows = []
    for d, cnt in enumerate([1, 1, 1, 5, 5, 5]):
        for i in range(cnt):
            rows.append(("a", dt.datetime(2024, 1, 1 + d, 9, i)))
    df = spark.createDataFrame(rows, "event_type string, ts timestamp_ntz")
    r = cusum_changepoints(df).collect()[0]
    assert r["change_day"] == dt.datetime(2024, 1, 3)
    assert r["mean_daily"] == 3.0
    # CUSUM at day 3: running 3 - 3*3 = -6 -> |.| = 6
    assert r["max_abs_cusum"] == 6.0
    assert r["n_days"] == 6
