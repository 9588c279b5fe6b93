"""Semantics tests for dataset-selection operators (operators/sampling.py).

The oracle parity tests (test_oracle_parity) already hash-check values; here
we pin the PROPERTIES the operators promise: determinism, budget bounds,
priority keep-rules, and split stability.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from live_social_media_sentiment_trend_tracker_using_kafka_spark.operators import sampling
from live_social_media_sentiment_trend_tracker_using_kafka_spark.sources.readers import table

from conftest import SF_SMOKE


def test_hash_split_is_deterministic_and_total(spark):
    docs = table(spark, "documents", SF_SMOKE)
    a = sampling.hash_split(docs).orderBy("doc_id").collect()
    b = sampling.hash_split(docs.repartition(7)).orderBy("doc_id").collect()
    assert [(r.doc_id, r.split) for r in a] == [(r.doc_id, r.split) for r in b]
    assert len(a) == docs.count()
    assert {r.split for r in a} <= {"train", "val", "test"}


def test_hash_split_fractions_roughly_hold(spark):
    docs = table(spark, "documents", SF_SMOKE)
    n = docs.count()
    counts = {r.split: r.n for r in sampling.hash_split(docs).groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts.get("train", 0) / n > 0.8  # 90% nominal, wide tolerance at small n


def test_split_thresholds_validation():
    with pytest.raises(ValueError):
        sampling.split_thresholds({"train": 0.5, "val": 0.1})


def test_token_budget_mix_respects_budgets(spark):
    docs = table(spark, "documents", SF_SMOKE)
    budgets = {"src0": 400, "src1": 150}
    out = sampling.token_budget_mix(docs, budgets).collect()
    per_source: dict[str, int] = {}
    for r in out:
        per_source[r.source] = max(per_source.get(r.source, 0), r.cum_tokens)
    for src, cap in budgets.items():
        assert per_source.get(src, 0) <= cap
    assert {r.source for r in out} <= set(budgets)
    # deterministic under repartition
    again = sampling.token_budget_mix(docs.repartition(5), budgets).collect()
    assert sorted((r.doc_id, r.cum_tokens) for r in out) == sorted(
        (r.doc_id, r.cum_tokens) for r in again
    )


def test_quality_percentile_filter_keeps_at_least_half_per_lang(spark):
    docs = table(spark, "documents", SF_SMOKE)
    kept = sampling.quality_percentile_filter(docs, pct=0.5)
    totals = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    kept_counts = {r.lang: r.n for r in kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    for lang, total in totals.items():
        # >= pct of each group survives a pct-percentile cutoff (ties can
        # push it higher, never lower)
        assert kept_counts.get(lang, 0) >= total // 2, lang
    # every kept row clears its own cutoff by construction
    assert kept.filter(F.col("quality_score") < F.col("cutoff")).count() == 0


def test_quality_percentile_filter_approx_path_runs(spark):
    docs = table(spark, "documents", SF_SMOKE)
    exact = sampling.quality_percentile_filter(docs, pct=0.5, approx=False)
    approx = sampling.quality_percentile_filter(docs, pct=0.5, approx=True)
    # t-digest at this size is exact-ish; allow small divergence
    assert abs(exact.count() - approx.count()) <= docs.count() * 0.05


def test_priority_source_dedup_keep_rules(spark):
    rows = [
        (1, "web", "same text here"),
        (2, "curated", "same text here"),
        (3, "web", "same text here"),
        (4, "web", "unique text"),
        (5, "scrape", "other  TEXT"),
        (6, "web", "other text"),  # fingerprint-equal to 5 after normalize
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    kept = {r.doc_id: r for r in sampling.priority_source_dedup(df, priority=["curated", "web"]).collect()}
    assert set(kept) == {2, 4, 6}       # curated beats web; web beats scrape
    assert kept[2].dup_count == 3
    assert kept[6].dup_count == 2


def test_hash_split_degenerate_zero_fraction_tail(spark):
    docs = table(spark, "documents", SF_SMOKE)
    out = sampling.hash_split(docs, {"all": 1.0, "none": 0.0})
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts.get("all", 0) == docs.count()
    assert counts.get("none", 0) == 0


def test_token_budget_mix_chunked_equals_single_window(spark):
    """The md5-prefix-chunked running sum must reproduce the naive
    one-window-per-source cumulative sum EXACTLY (order-preserving chunk
    key + offsets), at any chunk granularity."""
    docs = table(spark, "documents", SF_SMOKE)
    budgets = {"src0": 400, "src1": 150, "src2": 999999}
    fine = sampling.token_budget_mix(docs, budgets, chunks=256).collect()
    coarse = sampling.token_budget_mix(docs, budgets, chunks=1).collect()
    key = lambda rows: sorted((r.doc_id, r.source, r.n_tokens, r.cum_tokens) for r in rows)
    assert key(fine) == key(coarse)


def test_temperature_mix_alpha_extremes(spark):
    from live_social_media_sentiment_trend_tracker_using_kafka_spark.operators.sampling import (
        temperature_mix,
    )

    rows = [(i, "big" if i < 90 else "small") for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    # alpha=1: proportional -> quotas 90%/10% of 50
    prop = temperature_mix(df, "source", alpha=1.0, total_docs=50).groupBy("source").count()
    got = {r.source: r["count"] for r in prop.collect()}
    assert got == {"big": 45, "small": 5}
    # alpha=0: uniform by group -> 25 each (small capped by its 10 rows)
    uni = temperature_mix(df, "source", alpha=0.0, total_docs=50).groupBy("source").count()
    got = {r.source: r["count"] for r in uni.collect()}
    assert got == {"big": 25, "small": 10}  # rank cap: can't sample more than exists
    # determinism: same pick twice
    a = sorted(r.doc_id for r in temperature_mix(df, "source", 0.5, 40).collect())
    b = sorted(r.doc_id for r in temperature_mix(df, "source", 0.5, 40).collect())
    assert a == b
