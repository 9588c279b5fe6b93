"""Skew-mitigation utilities: salted aggregation and salted joins.

AQE's skew-join splitting (on in session.py) handles most runtime skew, but
two shapes still need explicit salting at 100 TB:

- **groupBy on a hot key** (one key = 10% of all rows): the partial/map-side
  aggregate already compresses per-partition duplicates, but a single
  reducer still receives the hot key's partial rows from every map task and,
  worse, any *high-cardinality agg state* (collect_list/set, exact distinct)
  concentrates on one task. ``salted_group_agg`` runs the same aggregation
  in two stages over ``key × salt``.
- **shuffle join against a hot key** when the other side is too big to
  broadcast: AQE can split the hot partition only if both sides' matching
  blocks can be replicated; pre-salting (``salted_join``) makes the
  replication explicit — the big side scatters over ``salt`` buckets, the
  other side is exploded ``salt``-fold so every bucket can join locally.

Both transformations are semantics-preserving (tests assert equality with
the unsalted plan); salt is a deterministic hash of a unique column when
given (reproducible) or ``rand()`` otherwise.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fan_out(df: DataFrame, min_factor: int = 1) -> DataFrame:
    """Guarantee enough partitions for CPU-bound per-row work.

    A small local parquet file scans as ONE split, so signature/fingerprint
    kernels (~1 ms/doc) run on a single core while 31 idle — measured 4-10×
    of several operators' wall time at sf0.1. On any real deployment the
    scan already has >= defaultParallelism splits and this is a NO-OP (no
    shuffle inserted); only under-partitioned inputs get a round-robin
    repartition. Never call it on a path that doesn't do heavy per-row
    compute — an unconditional repartition of a 100 TB scan would be the
    bug, which is why this is opt-in per operator and not in ``table()``.
    """
    target = df.sparkSession.sparkContext.defaultParallelism * min_factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def _salt_col(salt_buckets: int, det_col: str | None) -> Column:
    if det_col is not None:
        return F.pmod(F.xxhash64(F.col(det_col)), F.lit(salt_buckets)).cast("int")
    return (F.rand(seed=7) * salt_buckets).cast("int")


def salted_group_count(
    df: DataFrame,
    key_cols: list[str],
    salt_buckets: int = 16,
    det_col: str | None = None,
) -> DataFrame:
    """Two-stage count: groupBy(key, salt) → groupBy(key) sum.

    Stage 1 spreads a hot key over ``salt_buckets`` reducers; stage 2
    combines ``salt_buckets`` rows per key — negligible. Output equals
    ``df.groupBy(*key_cols).count()``.
    """
    return (
        df.withColumn("_salt", _salt_col(salt_buckets, det_col))
        .groupBy(*key_cols, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
        .groupBy(*key_cols)
        .agg(F.sum("_partial").alias("count"))
    )


def salted_group_agg(
    df: DataFrame,
    key_cols: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    salt_buckets: int = 16,
    det_col: str | None = None,
) -> DataFrame:
    """General two-stage aggregation over a salted key.

    ``partial_aggs`` run per (key, salt); ``final_aggs`` combine the partials
    per key and must reference the partial alias names. Only works for
    algebraic aggregates (sum/count/min/max, or avg decomposed as
    sum+count) — exactly the ones whose state a hot key concentrates.
    """
    return (
        df.withColumn("_salt", _salt_col(salt_buckets, det_col))
        .groupBy(*key_cols, "_salt")
        .agg(*partial_aggs)
        .groupBy(*key_cols)
        .agg(*final_aggs)
    )


def salted_distinct(
    df: DataFrame,
    cols: list[str],
    salt_buckets: int = 16,
    det_col: str | None = None,
) -> DataFrame:
    """Two-stage dedup of ``cols``: distinct(cols + salt) → distinct(cols).

    The hot-key case for `.distinct()` at 100 TB: one power key (a bot
    user's billions of same-day events) funnels every one of its rows
    through a single reducer in the dedup shuffle. Stage 1 dedups on
    (cols, salt) so the hot key's rows spread over ``salt_buckets``
    reducers; stage 2 dedups the ≤ ``salt_buckets`` surviving rows per key
    — a shuffle of (distinct × salt_buckets) rows at most, usually ~distinct.
    ``det_col`` should vary WITHIN a (cols) group (e.g. the event id) so the
    salt actually spreads the hot key; output equals
    ``df.select(*cols).distinct()`` (asserted in tests/test_skew.py).
    """
    return (
        df.withColumn("_salt", _salt_col(salt_buckets, det_col))
        .select(*cols, "_salt")
        .distinct()
        .drop("_salt")
        .distinct()
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key_col: str,
    salt_buckets: int = 16,
    how: str = "inner",
    det_col: str | None = None,
) -> DataFrame:
    """Equi-join where ``big``'s ``key_col`` is skewed and ``small`` is too
    large to broadcast: big rows scatter over salt buckets, small rows
    replicate into every bucket, the join runs on (key, salt).

    Cost: ``small`` is shuffled ``salt_buckets``-fold — use the smallest
    salt that flattens the hot partition. Output equals the plain join for
    ``inner``/``left`` (big-side-preserving) joins ONLY: a small-side-
    preserving join (right/full/anti/semi-on-small) would surface the
    replicated small rows, so those modes are rejected.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins only, got {how!r}: "
            "the small side is replicated per salt bucket, so small-side-"
            "preserving join modes would emit duplicate/spurious rows"
        )
    b = big.withColumn("_salt", _salt_col(salt_buckets, det_col))
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = b.join(s, [key_col, "_salt"], how)
    return out.drop("_salt")


def key_skew_audit(df: DataFrame, key_cols: list[str], k: int = 20) -> DataFrame:
    """Shuffle-health diagnostic: the top-``k`` heaviest keys with their
    share of all rows and their count relative to the mean key — the audit
    a pipeline runs on a join/groupBy key BEFORE deciding whether
    ``salted_group_agg`` / ``salted_join`` (above) or AQE skew splitting is
    needed. ``skew_vs_mean`` ~ 1 means uniform; a key at 50 means one
    reducer will receive 50 keys' worth of rows.

    Returns (key_cols..., n_rows, share, skew_vs_mean) ordered by n_rows
    desc with a key tiebreak.

    Scale shape: ONE map-side-combinable hash agg reduces the corpus to
    |keys| rows (persisted — it feeds both the 1-row totals agg and the
    top-k); totals join back as a 1-row broadcast; top-k is
    TakeOrderedAndProject. Nothing key-skewed runs here: the audit itself
    aggregates on the (possibly hot) key, but count partials compress
    map-side so the hot key contributes one row per map task, not its raw
    rows. Ratios divide exact integer counts in doubles, so the 6-dp round
    is engine-stable.
    """
    from ..caching import tracked_persist

    counts = tracked_persist(
        df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n_rows"))
    )
    totals = counts.agg(
        F.sum("n_rows").cast("double").alias("_total"),
        F.count(F.lit(1)).cast("double").alias("_n_keys"),
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            *key_cols,
            F.col("n_rows").cast("long").alias("n_rows"),
            F.round(F.col("n_rows") / F.col("_total"), 6).alias("share"),
            F.round(
                F.col("n_rows") * F.col("_n_keys") / F.col("_total"), 6
            ).alias("skew_vs_mean"),
        )
        .orderBy(F.desc("n_rows"), *[F.asc(c) for c in key_cols])
        .limit(k)
    )


def concentration_deciles(
    df: DataFrame, key_cols: list[str], round_digits: int = 6
) -> DataFrame:
    """Lorenz-style concentration report over a key: per count-decile of
    keys, how many rows that decile holds and the cumulative share held
    from the heaviest decile down — key_skew_audit's companion ("the top
    10% of users generate X% of events"), the number that decides whether
    hot-key mitigation matters at all or only for a handful of outliers.

    Deciles are VALUE-based: the nine boundaries are exact interpolated
    percentiles (0.1..0.9) of the per-key counts, and a key's decile is
    1 + (how many boundaries its count strictly exceeds). Heavy ties
    therefore lump into one decile rather than being split arbitrarily —
    deterministic on any engine, unlike a rank-based ntile whose tie
    assignment is order-dependent (and whose global sort moves every key
    to one task at scale; the rfm_segments lesson).

    Returns (decile, n_keys, n_rows, row_share, cum_share_from_top)
    ordered heaviest decile first.

    Scale shape: one map-side-combinable count agg to |keys| rows
    (persisted — feeds the percentile fit, the decile agg, and the
    total); the boundary/total aggregates are 1-row broadcasts; the
    cumulative window orders <= 10 rows. Integer counts keep the
    interpolated boundaries and comparisons bit-identical across engines.
    """
    from pyspark.sql import Window

    from ..caching import tracked_persist

    counts = tracked_persist(
        df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n"))
    )
    # decile boundaries via the distributed counts reconstruction —
    # Spark's exact percentile() would buffer all |keys| counts on one
    # reducer (r11-measured superlinear in distinct values); bit-equal
    from .sampling import exact_percentiles

    bounds = exact_percentiles(
        counts, [], "n", [i / 10 for i in range(1, 10)], out_col="bs"
    )
    decile = F.lit(1) + sum(
        (F.col("n") > F.element_at(F.col("bs"), i + 1)).cast("int")
        for i in range(9)
    )
    per = (
        counts.join(F.broadcast(bounds))
        .select(decile.alias("decile"), "n")
        .groupBy("decile")
        .agg(F.count(F.lit(1)).alias("n_keys"), F.sum("n").alias("n_rows"))
    )
    totals = per.agg(F.sum("n_rows").cast("double").alias("_total"))
    w = Window.orderBy(F.desc("decile")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        per.join(F.broadcast(totals))
        .select(
            F.col("decile").cast("int").alias("decile"),
            F.col("n_keys").cast("long").alias("n_keys"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.round(F.col("n_rows") / F.col("_total"), round_digits).alias(
                "row_share"
            ),
            F.round(
                F.sum("n_rows").over(w) / F.col("_total"), round_digits
            ).alias("cum_share_from_top"),
        )
        .orderBy(F.desc("decile"))
    )
