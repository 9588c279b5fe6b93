"""Unit tests for the exact Jaccard similarity join (prefix filtering),
winnowing fingerprints, and the IVF ANN tier.

The simjoin tests verify the prefix+length filters admit no false negatives
by comparing against a brute-force all-pairs computation over the SAME
shingle sets the operator uses. The winnowing tests check the algorithm's
published guarantees (Schleimer et al. 2003): shared substrings of length
k + window - 1 share a fingerprint, and fingerprints are invariant to
whitespace/punctuation edits. The IVF tests check exactness at
nprobe == n_clusters and recall of planted near-duplicates at nprobe == 1.
"""

from __future__ import annotations

from itertools import combinations

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from live_social_media_sentiment_trend_tracker_using_kafka_spark.functions.fingerprint import (
    fingerprint_containment_pairs,
    winnow_fingerprints,
)
from live_social_media_sentiment_trend_tracker_using_kafka_spark.operators import similarity
from live_social_media_sentiment_trend_tracker_using_kafka_spark.operators.dedup import (
    word_shingles_col,
)
from live_social_media_sentiment_trend_tracker_using_kafka_spark.operators.simjoin import (
    jaccard_similarity_join,
)

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
    ]
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "the quick brown fox jumps over the lazy dog near the river bend"),  # near-dup of 1
    (3, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup of 1
    (4, "a completely different document about spark catalyst optimizer internals"),
    (5, "spark catalyst optimizer internals are a completely different topic here"),
    (6, "!!! ..."),  # no tokens -> excluded
    (7, "one two"),  # fewer tokens than the shingle width
    (8, None),
]


def _brute_force_pairs(spark, docs, threshold, n=3):
    """All-pairs Jaccard over the operator's own shingle definition."""
    df = spark.createDataFrame(docs, DOC_SCHEMA)
    rows = df.select("doc_id", word_shingles_col(F.col("text"), n).alias("s")).collect()
    sets = {r.doc_id: set(r.s) for r in rows if r.s}
    out = set()
    for a, b in combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        if inter and inter / (len(sets[a]) + len(sets[b]) - inter) >= threshold:
            out.add((a, b))
    return out


@pytest.mark.parametrize("threshold", [0.3, 0.5, 0.8, 1.0])
def test_simjoin_matches_brute_force(spark, threshold):
    df = spark.createDataFrame(DOCS, DOC_SCHEMA)
    got = {
        (r.id_a, r.id_b)
        for r in jaccard_similarity_join(df, threshold=threshold).collect()
    }
    assert got == _brute_force_pairs(spark, DOCS, threshold)


def test_simjoin_exact_dup_scores_one(spark):
    df = spark.createDataFrame(DOCS, DOC_SCHEMA)
    rows = {(r.id_a, r.id_b): r.jaccard for r in jaccard_similarity_join(df, threshold=0.5).collect()}
    assert rows[(1, 3)] == 1.0


def test_simjoin_threshold_validation(spark):
    df = spark.createDataFrame(DOCS, DOC_SCHEMA)
    with pytest.raises(ValueError):
        jaccard_similarity_join(df, threshold=0.0)


def _fps(spark, docs):
    df = spark.createDataFrame(docs, DOC_SCHEMA)
    out = winnow_fingerprints(df, k=8, window=8)
    res = {}
    for r in out.collect():
        res.setdefault(r.doc_id, set()).add(r.fingerprint)
    return res


def test_winnow_shared_substring_shares_fingerprint(spark):
    # Docs share a normalized substring far longer than k + window - 1 = 15,
    # embedded in different surroundings -> must share >= 1 fingerprint.
    shared = "thequickbrownfoxjumpsoverthelazydog"
    fps = _fps(
        spark,
        [(1, f"AAAA {shared} BBBB"), (2, f"zzzz-9 {shared} other tail text")],
    )
    assert fps[1] & fps[2]


def test_winnow_invariant_to_whitespace_and_punct(spark):
    fps = _fps(
        spark,
        [
            (1, "The quick brown fox jumps over the lazy dog"),
            (2, "the,quick;BROWN!!  fox    jumps-over_the lazy ... dog"),
        ],
    )
    assert fps[1] == fps[2]


def test_winnow_degenerate_lengths(spark):
    fps = _fps(
        spark,
        [
            (1, "abc"),  # < k normalized chars -> no fingerprints
            (2, "abcdefgh"),  # exactly k chars -> one k-gram -> one fingerprint
            (3, ""),
            (4, None),
        ],
    )
    assert 1 not in fps and 3 not in fps and 4 not in fps
    assert len(fps[2]) == 1


def test_winnow_density_bound(spark):
    # Winnowing keeps at most one fingerprint per window position: the
    # fingerprint count can never exceed the number of windows.
    text = "the quick brown fox jumps over the lazy dog " * 20
    df = spark.createDataFrame([(1, text)], DOC_SCHEMA)
    n_norm = len("".join(c for c in text.lower() if c.isalnum()))
    n_hashes = n_norm - 8 + 1
    n_windows = n_hashes - 8 + 1
    count = winnow_fingerprints(df, k=8, window=8).count()
    assert 0 < count <= n_windows


def test_containment_finds_pasted_doc(spark):
    # Doc 1 is pasted verbatim inside doc 2's much longer text: containment
    # must be ~1.0 even though Jaccard of their fingerprint sets is low.
    short = "winnowing fingerprints survive insertions and reordering of text"
    long_parts = [
        "completely unrelated preamble about distributed query planning and shuffles",
        short,
        "followed by a long discussion of broadcast joins partition pruning and "
        "adaptive execution in modern engines with many more unrelated words",
    ]
    docs = [(1, short), (2, " ".join(long_parts)), (3, "nothing in common here at all")]
    df = spark.createDataFrame(docs, DOC_SCHEMA)
    rows = {(r.id_a, r.id_b): r.containment
            for r in fingerprint_containment_pairs(df, threshold=0.5).collect()}
    assert (1, 2) in rows and rows[(1, 2)] >= 0.9
    assert all({a, b} == {1, 2} for a, b in rows)


def test_containment_hot_fingerprint_cap(spark):
    # With max_df=1 every fingerprint is "hot" (appears in both copies) and
    # is dropped -> no pairs survive; sanity-check the boilerplate cap wiring.
    docs = [(1, "identical text for the df cap check"), (2, "identical text for the df cap check")]
    df = spark.createDataFrame(docs, DOC_SCHEMA)
    assert fingerprint_containment_pairs(df, threshold=0.1, max_df=1).count() == 0
    assert fingerprint_containment_pairs(df, threshold=0.99, max_df=2).count() == 1


EMB_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), False),
    ]
)
DIM = 16


def _emb_fixture(spark):
    rng = np.random.RandomState(42)
    base = rng.normal(size=(40, DIM))
    rows = [(i, base[i].tolist()) for i in range(40)]
    rows.append((100, (base[0] + rng.normal(scale=0.01, size=DIM)).tolist()))
    rows.append((101, (base[0] + rng.normal(scale=0.01, size=DIM)).tolist()))
    return spark.createDataFrame(rows, EMB_SCHEMA), base


def test_ivf_exact_when_probing_all_clusters(spark):
    df, base = _emb_fixture(spark)
    q = base[0].tolist()
    exact = similarity.brute_force_topk(df.filter("vec_id != 0"), q, k=5).collect()
    ivf = similarity.ivf_topk(
        df.filter("vec_id != 0"), q, k=5, n_clusters=4, nprobe=4
    ).collect()
    assert [(r.vec_id, r.cosine) for r in ivf] == [(r.vec_id, r.cosine) for r in exact]


def test_ivf_recall_of_planted_near_dups(spark):
    df, base = _emb_fixture(spark)
    q = base[0].tolist()
    # cosine(100, q) ~ cosine(101, q) ~ 1 -> they sit in the query's nearest
    # cluster; a single-probe search must still surface both.
    got = {
        r.vec_id
        for r in similarity.ivf_topk(
            df.filter("vec_id != 0"), q, k=3, n_clusters=4, nprobe=1
        ).collect()
    }
    assert {100, 101} <= got
