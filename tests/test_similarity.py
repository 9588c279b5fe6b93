"""Unit tests for similarity search: exact top-k vs ANN recall, and
embedding-cosine near-dup with constructed near-duplicate fixtures (the
driver testdata has no high-cosine pairs — max pairwise cosine ≈ 0.51 — so
the rows-only contract queries legitimately return 0 rows there)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import types as T

from live_social_media_sentiment_trend_tracker_using_kafka_spark.operators import similarity

DIM = 16
SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), False),
    ]
)


def _fixture(spark):
    rng = np.random.RandomState(42)
    base = rng.normal(size=(20, DIM))
    rows = [(i, base[i].tolist()) for i in range(20)]
    # 100/101: tiny perturbations of row 0 → cosine ≈ 1 with it and each other
    rows.append((100, (base[0] + rng.normal(scale=0.01, size=DIM)).tolist()))
    rows.append((101, (base[0] + rng.normal(scale=0.01, size=DIM)).tolist()))
    return spark.createDataFrame(rows, SCHEMA), base


def test_brute_force_topk_exact(spark):
    df, base = _fixture(spark)
    out = similarity.brute_force_topk(df.filter("vec_id != 0"), base[0].tolist(), k=3)
    rows = out.collect()
    assert [r.vec_id for r in rows[:2]] in ([100, 101], [101, 100])
    assert rows[0].cosine > 0.99
    # descending, deterministic tiebreak
    cos = [r.cosine for r in rows]
    assert cos == sorted(cos, reverse=True)


def test_lsh_topk_finds_near_neighbors(spark):
    df, base = _fixture(spark)
    out = similarity.lsh_topk(df.filter("vec_id != 0"), base[0].tolist(), k=3, num_planes=6)
    got = {r.vec_id for r in out.collect()}
    # the two perturbed copies collide with the query bucket (multi-probe)
    assert {100, 101} <= got


def test_cosine_near_duplicate_pairs(spark):
    df, _ = _fixture(spark)
    out = similarity.cosine_near_duplicate_pairs(df, threshold=0.95, dim=DIM, num_planes=6)
    pairs = {(r.id_a, r.id_b) for r in out.collect()}
    assert (0, 100) in pairs and (0, 101) in pairs and (100, 101) in pairs
    # no false positives among the random vectors
    assert all(a in (0, 100, 101) and b in (0, 100, 101) for a, b in pairs)


def test_cosine_near_dups_empty_on_random(spark):
    df, _ = _fixture(spark)
    out = similarity.cosine_near_duplicate_pairs(
        df.filter("vec_id < 90"), threshold=0.95, dim=DIM, num_planes=6
    )
    assert out.count() == 0
