"""Bucketized range (interval-containment) join: facts at time ``ts``
joined to intervals ``[lo, hi]`` — without a cartesian product.

Spark has no native range join: a raw ``ts BETWEEN lo AND hi`` predicate
plans as BroadcastNestedLoopJoin (small side) or CartesianProduct (big-big)
— O(n·m) compares, a non-starter at 100 TB. The public fix (Databricks'
range-join bin optimization; the "bucketed interval join" in time-series
engines) turns containment into an EQUI-join on a time bucket:

1. Pick a bucket width W (auto: the mean interval span, so a typical
   interval overlaps ~2 buckets).
2. Each fact row maps to ONE bucket: floor(epoch(ts)/W).
3. Each interval replicates to every bucket it overlaps:
   explode(sequence(floor(epoch(lo)/W), floor(epoch(hi)/W))) — span/W + 1
   rows, bounded by design when W tracks the span distribution.
4. Equi-join on bucket (plus any caller equi keys) and re-check the exact
   containment predicate on the matches.

Cost: one shuffle of facts + one of replicated intervals, both on the
bucket key — linear in input + output; AQE's skew-join splits any hot
bucket. Every timestamp is reduced to seconds with ``timestampdiff`` from a
fixed NTZ reference, which is timezone-free for TIMESTAMP_NTZ inputs on any
session (verified under UTC / Asia/Kolkata / America/New_York).

Reference parity: the reference engine has no interval operator at all —
this belongs to the §2.8 extension mandate (attach training telemetry /
events to experiment windows, promo periods, maintenance intervals).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_EPOCH_REF = "TIMESTAMP_NTZ'1970-01-01 00:00:00'"


def _epoch_seconds(col: str) -> Column:
    """Seconds since the fixed NTZ epoch — tz-free for NTZ columns (plain
    TIMESTAMP columns coerce per session tz, so keep inputs in NTZ; see
    sources/readers.py normalize_ts)."""
    return F.expr(f"timestampdiff(SECOND, {_EPOCH_REF}, {col})")


def auto_bucket_seconds(intervals: DataFrame, lo_col: str, hi_col: str) -> int:
    """Mean interval span in seconds (>= 1) — one tiny aggregate collected
    to the driver (a bounded scalar fit, same contract as
    similarity.srp_parameters). A width near the mean span keeps interval
    replication ~2 rows per interval while keeping fact buckets selective.
    Inverted intervals (lo > hi — corrupt rows that can never match) are
    excluded from the average so they cannot drag the width toward zero
    and blow up replication of the valid intervals."""
    span_col = _epoch_seconds(hi_col) - _epoch_seconds(lo_col)
    row = intervals.filter(span_col >= 0).select(
        F.avg(span_col).alias("mean_span")
    ).first()
    span = row["mean_span"] if row and row["mean_span"] is not None else None
    return max(int(span), 1) if span else 3600


def bucketed_range_join(
    facts: DataFrame,
    intervals: DataFrame,
    fact_ts: str = "ts",
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_seconds: int | None = None,
    equi_keys: list[str] | None = None,
    closed: str = "both",
    how: str = "inner",
) -> DataFrame:
    """Join fact rows to every interval containing their timestamp.

    Output columns: all fact columns, then all interval columns (callers
    project). ``equi_keys`` are column names present on BOTH sides that must
    also match (joined by equality and emitted once, from the fact side).
    ``closed``: "both" = lo <= ts <= hi, "left" = lo <= ts < hi.
    ``how``: "inner" or "left" (left keeps matchless facts with null
    interval columns via an add-back anti-join — still no cartesian).

    Null ``ts``/``lo``/``hi`` rows never match (SQL comparison semantics);
    with ``how="left"`` null-ts facts survive with null interval columns.
    """
    if closed not in ("both", "left"):
        raise ValueError("closed must be 'both' or 'left'")
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    eks = equi_keys or []
    w = bucket_seconds if bucket_seconds is not None else auto_bucket_seconds(
        intervals, lo_col, hi_col
    )
    if w < 1:
        raise ValueError("bucket_seconds must be >= 1")

    overlap = set(facts.columns) & set(intervals.columns) - set(eks)
    if overlap:
        raise ValueError(
            f"ambiguous columns on both sides (rename first): {sorted(overlap)}"
        )

    f_b = facts.withColumn("_rj_bucket", F.floor(_epoch_seconds(fact_ts) / F.lit(w)))
    # Inverted intervals can never contain a point, but F.sequence(hi_b,
    # lo_b) would silently DESCEND and replicate them span-wide — drop them
    # before the explode.
    i_b = intervals.filter(F.col(lo_col) <= F.col(hi_col)).withColumn(
        "_rj_bucket",
        F.explode(
            F.sequence(
                F.floor(_epoch_seconds(lo_col) / F.lit(w)),
                F.floor(_epoch_seconds(hi_col) / F.lit(w)),
            )
        ),
    )
    upper = (
        F.col(fact_ts) <= F.col(hi_col) if closed == "both" else F.col(fact_ts) < F.col(hi_col)
    )
    cond = (F.col(fact_ts) >= F.col(lo_col)) & upper
    joined = (
        f_b.join(i_b, ["_rj_bucket", *eks])
        .filter(cond)
        .drop("_rj_bucket")
    )
    if how == "inner":
        return joined
    # left: add back facts with no containing interval, null interval cols.
    # The anti-join must be NULL-SAFE on every fact column — plain equality
    # would treat a matched row carrying any NULL as unmatched and emit it
    # twice.
    matched_keys = joined.select(*facts.columns)
    f, m = facts.alias("_rj_f"), matched_keys.alias("_rj_m")
    anti_cond = None
    for c in facts.columns:
        eq = F.col(f"_rj_f.{c}").eqNullSafe(F.col(f"_rj_m.{c}"))
        anti_cond = eq if anti_cond is None else (anti_cond & eq)
    unmatched = f.join(m, anti_cond, "left_anti")
    null_ivals = [
        F.lit(None).cast(dict(intervals.dtypes)[c]).alias(c)
        for c in intervals.columns
        if c not in eks
    ]
    return joined.unionByName(unmatched.select("*", *null_ivals))
