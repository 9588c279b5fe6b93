"""Parity tests: Arrow-vectorized kernels must equal their Catalyst twins.

The kernels (functions/kernels.py) are pure performance rewrites — same
math, vectorized through Arrow. These tests pin the equivalence on real
testdata so a kernel regression can't silently change near-dup answers.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from live_social_media_sentiment_trend_tracker_using_kafka_spark.functions import fingerprint as fpmod
from live_social_media_sentiment_trend_tracker_using_kafka_spark.functions.kernels import (
    make_winnow_udf,
    simhash_udf,
)
from live_social_media_sentiment_trend_tracker_using_kafka_spark.operators import dedup, similarity
from live_social_media_sentiment_trend_tracker_using_kafka_spark.sources.readers import table

from conftest import SF_SMOKE


def test_simhash_kernel_matches_catalyst(spark):
    docs = table(spark, "documents", SF_SMOKE)
    hashes = F.transform(dedup.word_tokens_col(F.col("text")), lambda t: F.xxhash64(t))
    both = docs.select(
        "doc_id",
        dedup.simhash_col(F.col("text")).alias("catalyst"),
        simhash_udf()(hashes).alias("arrow"),
    )
    bad = both.filter(F.col("catalyst") != F.col("arrow")).count()
    assert bad == 0


def test_simhash_signatures_paths_agree(spark):
    docs = table(spark, "documents", SF_SMOKE)
    a = dedup.simhash_signatures(docs, arrow=True).orderBy("doc_id").collect()
    c = dedup.simhash_signatures(docs, arrow=False).orderBy("doc_id").collect()
    assert [(r.doc_id, r.simhash) for r in a] == [(r.doc_id, r.simhash) for r in c]


def test_winnow_kernel_matches_catalyst(spark):
    docs = table(spark, "documents", SF_SMOKE)
    catalyst = fpmod.winnow_col(fpmod.kgram_hashes_col(F.col("text")))
    arrow = make_winnow_udf()(fpmod._normalize(F.col("text")))
    both = docs.select(
        "doc_id",
        F.array_sort(catalyst).alias("c"),
        F.array_sort(arrow).alias("a"),
    )
    bad = both.filter(F.col("c") != F.col("a")).count()
    assert bad == 0


def test_winnow_kernel_edge_cases(spark):
    rows = [(0, ""), (1, "ab"), (2, "abcdefg"), (3, "abcdefgh"), (4, "!!! ??"), (5, None)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    catalyst = fpmod.winnow_col(fpmod.kgram_hashes_col(F.col("text")))
    arrow = make_winnow_udf()(fpmod._normalize(F.col("text")))
    got = df.select(
        "doc_id", F.array_sort(catalyst).alias("c"), F.array_sort(arrow).alias("a")
    ).collect()
    for r in got:
        assert (r.c or []) == (r.a or []), f"doc {r.doc_id}: {r.c} vs {r.a}"


def test_srp_buckets_match_signature_col(spark):
    emb = table(spark, "embeddings", SF_SMOKE)
    planes = [similarity._hyperplanes(64, 8, 7 + t) for t in range(4)]
    from live_social_media_sentiment_trend_tracker_using_kafka_spark.functions.kernels import (
        make_srp_buckets_udf,
    )

    srp = make_srp_buckets_udf(planes)
    per_table = [
        similarity.signature_col(F.col("embedding"), p).alias(f"t{t}")
        for t, p in enumerate(planes)
    ]
    both = emb.select("vec_id", srp(F.col("embedding")).alias("arrow"), *per_table)
    rows = both.collect()
    for r in rows:
        assert list(r.arrow) == [r.t0, r.t1, r.t2, r.t3], f"vec {r.vec_id}"
