"""Salted aggregation/join equivalence: the skew transformations must be
invisible in the results, and the salted plan must actually spread the hot
key (asserted on the salt column's distribution, and on plan shape)."""

from __future__ import annotations

from pyspark.sql import functions as F

from live_social_media_sentiment_trend_tracker_using_kafka_spark.operators.skew import (
    salted_group_agg,
    salted_group_count,
    salted_join,
)


def _skewed(spark):
    # key "hot" holds 90% of rows
    hot = spark.range(900).select(
        F.lit("hot").alias("k"), F.col("id").alias("v")
    )
    rest = spark.range(100).select(
        F.concat(F.lit("k"), (F.col("id") % 10).cast("string")).alias("k"),
        F.col("id").alias("v"),
    )
    return hot.unionAll(rest)


def test_salted_group_count_equals_plain(spark):
    df = _skewed(spark)
    got = {r.k: r["count"] for r in salted_group_count(df, ["k"], det_col="v").collect()}
    want = {r.k: r["count"] for r in df.groupBy("k").count().collect()}
    assert got == want


def test_salted_group_agg_sum_avg(spark):
    df = _skewed(spark)
    got = salted_group_agg(
        df,
        ["k"],
        partial_aggs=[F.sum("v").alias("_s"), F.count(F.lit(1)).alias("_c")],
        final_aggs=[
            F.sum("_s").alias("total"),
            (F.sum("_s") / F.sum("_c")).alias("mean"),
        ],
        det_col="v",
    )
    want = df.groupBy("k").agg(
        F.sum("v").alias("total"), F.avg("v").alias("mean")
    )
    g = {r.k: (r.total, round(r.mean, 9)) for r in got.collect()}
    w = {r.k: (r.total, round(r.mean, 9)) for r in want.collect()}
    assert g == w


def test_salt_actually_spreads_hot_key(spark):
    df = _skewed(spark)
    n_buckets = (
        df.withColumn("_salt", F.pmod(F.xxhash64("v"), F.lit(16)).cast("int"))
        .filter(F.col("k") == "hot")
        .select("_salt")
        .distinct()
        .count()
    )
    assert n_buckets == 16


def test_salted_join_equals_plain(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [("hot", 1.5)] + [(f"k{i}", float(i)) for i in range(10)], ["k", "w"]
    )
    got = salted_join(big, small, "k", salt_buckets=4, det_col="v")
    want = big.join(small, "k")
    assert got.count() == want.count() == 1000
    g = sorted((r.k, r.v, r.w) for r in got.collect())
    w = sorted((r.k, r.v, r.w) for r in want.collect())
    assert g == w


def test_salted_join_rejects_small_side_preserving_modes(spark):
    import pytest

    big = _skewed(spark)
    small = spark.createDataFrame([("hot", 1.5)], ["k", "w"])
    # right/full/anti would surface the salt-replicated small rows
    for how in ("right", "full", "left_anti", "left_semi"):
        with pytest.raises(ValueError):
            salted_join(big, small, "k", how=how)


def test_salted_join_left_outer(spark):
    big = _skewed(spark)
    small = spark.createDataFrame([("hot", 1.5)], ["k", "w"])
    got = salted_join(big, small, "k", salt_buckets=4, how="left", det_col="v")
    assert got.count() == 1000
    assert got.filter(F.col("w").isNull()).count() == 100


def test_salted_distinct_equals_plain(spark):
    df = _skewed(spark)  # 100 'hot' + 900 spread keys, v unique per row
    from live_social_media_sentiment_trend_tracker_using_kafka_spark.operators.skew import (
        salted_distinct,
    )

    got = sorted(r.k for r in salted_distinct(df, ["k"], 8, det_col="v").collect())
    want = sorted(r.k for r in df.select("k").distinct().collect())
    assert got == want
    # multi-column dedup keeps per-key multiplicity 1
    got2 = salted_distinct(df, ["k", "v"], 8, det_col="v")
    assert got2.count() == df.select("k", "v").distinct().count()
    assert got2.columns == ["k", "v"]


def test_key_skew_audit_hand_computed(spark):
    """Counts/share/skew_vs_mean on a 3-key toy table: 6+3+1 rows ->
    total 10, mean 10/3; ordering is n_rows desc with the key tiebreak."""
    from live_social_media_sentiment_trend_tracker_using_kafka_spark.operators.skew import (
        key_skew_audit,
    )

    rows = [("a",)] * 6 + [("b",)] * 3 + [("c",)] * 1
    df = spark.createDataFrame(rows, "k string")
    out = [tuple(r) for r in key_skew_audit(df, ["k"]).collect()]
    assert out == [
        ("a", 6, 0.6, 1.8),
        ("b", 3, 0.3, 0.9),
        ("c", 1, 0.1, 0.3),
    ]


def test_key_skew_audit_top_k_and_tiebreak(spark):
    """k=2 keeps the heaviest two; equal counts break ties on the key."""
    from live_social_media_sentiment_trend_tracker_using_kafka_spark.operators.skew import (
        key_skew_audit,
    )

    rows = [("z",)] * 2 + [("y",)] * 2 + [("x",)] * 5
    df = spark.createDataFrame(rows, "k string")
    out = key_skew_audit(df, ["k"], k=2).collect()
    assert [(r["k"], r["n_rows"]) for r in out] == [("x", 5), ("y", 2)]


def test_concentration_deciles_all_ties_lump_into_one(spark):
    """Four keys with identical counts: every boundary equals the count, so
    no key strictly exceeds any boundary — one decile-1 row holding 100%."""
    from live_social_media_sentiment_trend_tracker_using_kafka_spark.operators.skew import (
        concentration_deciles,
    )

    df = spark.createDataFrame(
        [(u, i) for u in ("a", "b", "c", "d") for i in range(3)],
        "user_id string, x int",
    )
    out = concentration_deciles(df, ["user_id"]).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.decile, r.n_keys, r.n_rows) == (1, 4, 12)
    assert (r.row_share, r.cum_share_from_top) == (1.0, 1.0)


def test_concentration_deciles_invariants_and_top_heaviness(spark):
    """Counts 1..10 over ten keys: rows conserve, shares sum to 1, the
    bottom row's cumulative share is exactly 1, and the heaviest decile's
    keys hold more rows per key than the lightest's."""
    from live_social_media_sentiment_trend_tracker_using_kafka_spark.operators.skew import (
        concentration_deciles,
    )

    rows = [(f"u{k}", i) for k in range(1, 11) for i in range(k)]
    df = spark.createDataFrame(rows, "user_id string, x int")
    out = concentration_deciles(df, ["user_id"]).collect()
    assert sum(r.n_rows for r in out) == len(rows)
    assert sum(r.n_keys for r in out) == 10
    assert abs(sum(r.row_share for r in out) - 1.0) < 1e-5
    assert out[0].decile > out[-1].decile  # ordered heaviest first
    assert out[-1].cum_share_from_top == 1.0
    assert out[0].n_rows / out[0].n_keys > out[-1].n_rows / out[-1].n_keys
