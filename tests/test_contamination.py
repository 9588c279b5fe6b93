"""Unit tests for benchmark decontamination (operators/contamination.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from live_social_media_sentiment_trend_tracker_using_kafka_spark.operators import contamination

BENCH_TEXT = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
CLEAN_TEXT = "one two three four five six seven eight nine ten eleven"
# shares the first 7 words with BENCH_TEXT, then diverges
PARTIAL_TEXT = "alpha beta gamma delta epsilon zeta eta unrelated words here now"


def _frames(spark):
    cand = spark.createDataFrame(
        [(1, BENCH_TEXT), (2, CLEAN_TEXT), (3, PARTIAL_TEXT), (4, "tiny")],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame([(100, BENCH_TEXT)], ["doc_id", "text"])
    return cand, bench


def test_contamination_fractions(spark):
    cand, bench = _frames(spark)
    rows = {
        r["doc_id"]: r
        for r in contamination.contamination_stats(cand, bench, n=5).collect()
    }
    # doc 1 is an exact copy: every 5-gram contaminated
    assert rows[1]["contam_frac"] == 1.0
    assert rows[1]["n_contaminated"] == rows[1]["n_grams"]
    # doc 2 shares nothing
    assert rows[2]["contam_frac"] == 0.0
    # doc 3: 11 tokens → 7 5-grams, of which the first 3 come from BENCH_TEXT
    assert rows[3]["n_grams"] == 7
    assert rows[3]["n_contaminated"] == 3
    # doc 4 ("tiny"): shorter than n → one short gram, not in benchmark
    assert rows[4]["n_grams"] == 1 and rows[4]["n_contaminated"] == 0


def test_hash_and_string_keys_agree(spark):
    cand, bench = _frames(spark)
    a = sorted(
        contamination.contamination_stats(cand, bench, n=5, use_hash=True).collect()
    )
    b = sorted(
        contamination.contamination_stats(cand, bench, n=5, use_hash=False).collect()
    )
    assert a == b


def test_decontaminate(spark):
    cand, bench = _frames(spark)
    kept = sorted(
        r["doc_id"]
        for r in contamination.decontaminate(cand, bench, n=5, max_frac=0.5).collect()
    )
    # doc 1 (frac 1.0) dropped; doc 3 (3/7 ≈ 0.43) kept; docs 2 and 4 kept
    assert kept == [2, 3, 4]


def test_empty_benchmark_keeps_everything(spark):
    cand, _ = _frames(spark)
    bench = spark.createDataFrame([], "doc_id long, text string")
    assert contamination.decontaminate(cand, bench).count() == cand.count()
    stats = contamination.contamination_stats(cand, bench)
    assert stats.agg(F.sum("n_contaminated")).head()[0] == 0
