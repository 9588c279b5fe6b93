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


def test_hot_block_guard_is_recall_exact_and_warns(spark):
    """Force the hot-block gate with a tiny cap: the length-banded split
    must return EXACTLY the ungated result (the Levenshtein length bound
    makes banding lossless), including matches whose length difference
    equals the full budget (one band apart), and it must warn."""
    import warnings

    dirty, clean = _frames(spark)
    # add a budget-edge pair inside the hot block: len diff == 2 == budget
    clean2 = clean.union(
        spark.createDataFrame([("us", "b1", 5, "acme corp xy")], clean.columns)
    )
    dirty2 = dirty.union(
        spark.createDataFrame([("us", "b1", 105, "acme corp xyzz")], dirty.columns)
    )
    args = (dirty2, clean2, ["country", "blk"], "did", "dname", "cid", "cname", 2)
    ungated = {
        (r.did, r.cid, r.distance)
        for r in linkage.blocked_edit_resolve(*args, max_block_pairs=None).collect()
    }
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        gated = {
            (r.did, r.cid, r.distance)
            for r in linkage.blocked_edit_resolve(*args, max_block_pairs=1).collect()
        }
    assert gated == ungated
    assert any("max_block_pairs" in str(x.message) for x in w)
    # the budget-edge pair survived the banding (did 105 -> cid 5, dist 2)
    assert (105, 5, 2) in gated


def test_cold_path_runs_no_guard_jobs_or_warnings(spark):
    import warnings

    dirty, clean = _frames(spark)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = linkage.blocked_edit_resolve(
            dirty, clean, ["country", "blk"], "did", "dname", "cid", "cname", 2
        ).collect()
    assert len(out) == 2
    assert not [x for x in w if "max_block_pairs" in str(x.message)]


def test_same_length_hot_block_still_exact(spark):
    """Banding cannot split a same-length pile, but results must still be
    exact (the guard degrades to the plain within-block pairing)."""
    clean = spark.createDataFrame(
        [("us", i, f"name{i:04d}") for i in range(20)], ["blk", "cid", "cname"]
    )
    dirty = spark.createDataFrame(
        [("us", 100 + i, f"nxme{i:04d}") for i in range(20)], ["blk", "did", "dname"]
    )
    args = (dirty, clean, ["blk"], "did", "dname", "cid", "cname", 2)
    ungated = {
        (r.did, r.cid, r.distance)
        for r in linkage.blocked_edit_resolve(*args, max_block_pairs=None).collect()
    }
    import warnings

    with warnings.catch_warnings(record=True):
        warnings.simplefilter("always")
        gated = {
            (r.did, r.cid, r.distance)
            for r in linkage.blocked_edit_resolve(*args, max_block_pairs=10).collect()
        }
    assert gated == ungated and len(gated) == 20


def test_refine_cols_split_hot_blocks_only(spark):
    """refine_cols must refine ONLY hot blocks: a cold block whose pair
    would be lost under the refined key must still match, while the hot
    block's quadratic is cut and its true matches survive (the probe's
    corruption model keeps refine attributes stable)."""
    import warnings

    # hot block "h": 20x20 same-length names, each dirty has one true
    # match; refine digit (id % 10) is stable across corruption
    clean_rows = [("h", i % 10, i, f"name{i:04d}") for i in range(20)]
    dirty_rows = [("h", i % 10, 100 + i, f"nxme{i:04d}") for i in range(20)]
    # cold block "c": refine digit DIFFERS between the pair (would be
    # unmatchable under a global refined key) - must still match
    clean_rows.append(("c", 3, 900, "zenith llc"))
    dirty_rows.append(("c", 7, 901, "zenth llc"))
    clean = spark.createDataFrame(clean_rows, ["blk", "digit", "cid", "cname"])
    dirty = spark.createDataFrame(dirty_rows, ["blk", "digit", "did", "dname"])
    args = (dirty, clean, ["blk"], "did", "dname", "cid", "cname", 2)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = {
            (r.did, r.cid)
            for r in linkage.blocked_edit_resolve(
                *args, max_block_pairs=10, refine_cols=["digit"]
            ).collect()
        }
    assert any("refine_cols" in str(x.message) for x in w)
    assert (901, 900) in out  # cold block untouched by refinement
    assert {(100 + i, i) for i in range(20)} <= out


def test_total_gate_fires_despite_hot_block(spark):
    """One hot block must not exempt distributed cold saturation: when the
    residual cold volume exceeds max_total_pairs, every block is refined
    (r11 ADVICE — the old elif skipped the total gate whenever any hot
    block existed). Results stay exact (banding is lossless)."""
    import warnings

    # hot block "h" (6x6 > max_block_pairs=25) + 8 cold blocks of 3x3
    # (cold residual 72 > max_total_pairs=50)
    clean_rows = [("h", i, f"name{i:04d}") for i in range(6)]
    dirty_rows = [("h", 100 + i, f"nxme{i:04d}") for i in range(6)]
    for b in range(8):
        clean_rows += [(f"c{b}", 200 + b * 10 + j, f"blk{b}n{j:03d}") for j in range(3)]
        dirty_rows += [(f"c{b}", 300 + b * 10 + j, f"blk{b}x{j:03d}") for j in range(3)]
    clean = spark.createDataFrame(clean_rows, ["blk", "cid", "cname"])
    dirty = spark.createDataFrame(dirty_rows, ["blk", "did", "dname"])
    args = (dirty, clean, ["blk"], "did", "dname", "cid", "cname", 2)
    ungated = {
        (r.did, r.cid, r.distance)
        for r in linkage.blocked_edit_resolve(*args, max_block_pairs=None).collect()
    }
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        gated = {
            (r.did, r.cid, r.distance)
            for r in linkage.blocked_edit_resolve(
                *args, max_block_pairs=25, max_total_pairs=50
            ).collect()
        }
    assert gated == ungated
    assert any("outside hot blocks" in str(x.message) for x in w)


def test_hot_key_fetch_cap_truncation_refines_all(spark, monkeypatch):
    """More hot keys than the bounded fetch can carry must never leave the
    overflow unrefined silently (r11 ADVICE): the guard falls back to
    refining every block and warns."""
    import warnings

    monkeypatch.setattr(linkage, "_HOT_KEY_FETCH_CAP", 2)
    # 4 hot blocks of 3x3 = 9 > max_block_pairs=4 each
    clean_rows = [(f"h{b}", b * 10 + j, f"b{b}name{j:03d}") for b in range(4) for j in range(3)]
    dirty_rows = [(f"h{b}", 100 + b * 10 + j, f"b{b}nxme{j:03d}") for b in range(4) for j in range(3)]
    clean = spark.createDataFrame(clean_rows, ["blk", "cid", "cname"])
    dirty = spark.createDataFrame(dirty_rows, ["blk", "did", "dname"])
    args = (dirty, clean, ["blk"], "did", "dname", "cid", "cname", 2)
    ungated = {
        (r.did, r.cid, r.distance)
        for r in linkage.blocked_edit_resolve(*args, max_block_pairs=None).collect()
    }
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        gated = {
            (r.did, r.cid, r.distance)
            for r in linkage.blocked_edit_resolve(*args, max_block_pairs=4).collect()
        }
    assert gated == ungated
    assert any("hot-key fetch" in str(x.message) for x in w)
