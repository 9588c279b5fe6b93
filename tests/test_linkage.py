"""Semantics tests for entity resolution (operators/linkage.py):
blocking recall/cost contract, distance budget, best-match pick.
"""

from __future__ import annotations

from live_social_media_sentiment_trend_tracker_using_kafka_spark.operators import linkage


def _frames(spark):
    clean = spark.createDataFrame(
        [
            ("us", "b1", 1, "acme corp"),
            ("us", "b1", 2, "acme gorp"),
            ("us", "b2", 3, "zenith llc"),
            ("de", "b1", 4, "acme corp"),
        ],
        ["country", "blk", "cid", "cname"],
    )
    dirty = spark.createDataFrame(
        [
            ("us", "b1", 101, "acme corp."),   # dist 1 to cid 1, dist 2 to cid 2
            ("us", "b2", 102, "zenth llc"),    # dist 1 to cid 3
            ("us", "b1", 103, "completely different"),  # no match within 2
            ("us", "b9", 104, "acme corp"),    # exact name, but block miss
        ],
        ["country", "blk", "did", "dname"],
    )
    return dirty, clean


def test_best_match_minimizes_distance_then_id(spark):
    dirty, clean = _frames(spark)
    out = {
        r.did: (r.cid, r.distance)
        for r in linkage.blocked_edit_resolve(
            dirty, clean, ["country", "blk"], "did", "dname", "cid", "cname", 2
        ).collect()
    }
    assert out[101] == (1, 1)  # both candidates qualify; min (dist, cid) wins
    assert out[102] == (3, 1)


def test_over_budget_and_block_miss_are_absent(spark):
    dirty, clean = _frames(spark)
    out = linkage.blocked_edit_resolve(
        dirty, clean, ["country", "blk"], "did", "dname", "cid", "cname", 2
    )
    dids = {r.did for r in out.collect()}
    assert 103 not in dids  # levenshtein > 2
    assert 104 not in dids  # blocking key disagrees — unmatchable by contract


def test_blocking_respects_every_block_column(spark):
    dirty, clean = _frames(spark)
    # same blk value exists under country 'de'; dirty rows are all 'us',
    # so the de row must never surface as a match
    out = linkage.blocked_edit_resolve(
        dirty, clean, ["country", "blk"], "did", "dname", "cid", "cname", 2
    )
    assert all(r.cid != 4 for r in out.collect())


def test_tie_on_distance_breaks_on_clean_id(spark):
    clean = spark.createDataFrame(
        [("b", 7, "aaax"), ("b", 5, "aaay")], ["blk", "cid", "cname"]
    )
    dirty = spark.createDataFrame([("b", 1, "aaaz")], ["blk", "did", "dname"])
    out = linkage.blocked_edit_resolve(
        dirty, clean, ["blk"], "did", "dname", "cid", "cname", 2
    ).collect()
    assert len(out) == 1 and out[0].cid == 5 and out[0].distance == 1
