"""Semantic unit tests for relational operators (the plan-shape claims
live in test_plans.py; oracle parity in test_oracle_parity.py /
the driver contract)."""

from pyspark.sql import functions as F  # noqa: F401

from live_social_media_sentiment_trend_tracker_using_kafka_spark.operators.relational import (
    bracket_revenue,
)


def test_bracket_revenue_hand_computed(spark):
    """Each line item lands in the bracket whose brand/size/quantity all
    match; out-of-window quantities and non-bracket brands drop; revenue
    is sum(extendedprice * (1 - discount)) rounded to 2 dp."""
    part = spark.createDataFrame(
        [
            (1, "Brand#12", 10),   # small bracket (size <= 15)
            (2, "Brand#23", 20),   # medium bracket (size <= 25)
            (3, "Brand#5", 30),    # large bracket (size <= 35)
            (4, "Brand#9", 5),     # brand outside every bracket
            (5, "Brand#12", 40),   # size outside the small bracket
        ],
        "p_partkey long, p_brand string, p_size int",
    )
    li = spark.createDataFrame(
        [
            (1, 10.0, 100.0, 0.1),   # small: qty 1-15 ok -> 90.00
            (1, 20.0, 100.0, 0.0),   # qty 20 outside small -> dropped
            (2, 15.0, 200.0, 0.25),  # medium: qty 10-30 ok -> 150.00
            (3, 30.0, 50.0, 0.0),    # large: qty 20-50 ok -> 50.00
            (3, 45.0, 10.0, 0.5),    # large again -> 5.00
            (4, 10.0, 999.0, 0.0),   # brand not in any bracket -> dropped
            (5, 10.0, 999.0, 0.0),   # size 40 > 15 -> dropped
        ],
        "l_partkey long, l_quantity double, l_extendedprice double, l_discount double",
    )
    out = {r["bracket"]: r for r in bracket_revenue(li, part).collect()}
    assert set(out) == {"bracket_small", "bracket_medium", "bracket_large"}
    assert (out["bracket_small"]["n_items"], out["bracket_small"]["revenue"]) == (1, 90.0)
    assert (out["bracket_medium"]["n_items"], out["bracket_medium"]["revenue"]) == (1, 150.0)
    assert (out["bracket_large"]["n_items"], out["bracket_large"]["revenue"]) == (2, 55.0)
