"""As-of join: attach the most recent right-side row at-or-before each left
row's timestamp, per key.

Spark has no native as-of join (pandas' ``merge_asof`` exists only in the
single-node pandas API). The distributed formulation here is the public
union-and-carry-forward pattern: tag both inputs, union them, and propagate
the latest right payload with ``last(ignorenulls)`` over a per-key window
ordered by (time, side). Cost model:

- ONE shuffle, on the join key — identical to a co-partitioned equi-join;
  no interval cross-product, no time-bucketing heuristics to tune.
- The window is partitioned by the key, never global; a hot key degrades to
  one partition's sort (salt the key upstream if a single key exceeds an
  executor — same remedy as any skewed join).
- Whole plan stays JVM-side (window + struct ops; no UDFs).

Semantics: ``strict=False`` (default) matches right rows with
``right_ts <= left_ts`` (DuckDB/pandas ``>=`` convention); ``strict=True``
requires ``right_ts < left_ts``. Ties among right rows on the same
(key, timestamp) are not deterministic — pre-aggregate the right side to one
row per (key, ts) for reproducible output (the contract query does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    prefix: str = "r_",
    strict: bool = False,
) -> DataFrame:
    """Left as-of join. Output = every left row + ``prefix``-renamed right
    payload columns from the latest matching right row (nulls if none).

    ``right_cols`` selects which right columns ride along (default: all but
    the key). The right timestamp is usually included so consumers can see
    the match's age.
    """
    rc = right_cols if right_cols is not None else [c for c in right.columns if c != key_col]
    # SQL equality never matches NULL keys and `>=` never matches NULL
    # timestamps; Window.partitionBy would happily group null keys together
    # and a null _ts would sort first and be carried into every left row.
    # Dropping degenerate right rows restores ASOF-join semantics (null-key
    # left rows keep a null payload: their partition has no right rows).
    right = right.filter(F.col(key_col).isNotNull() & F.col(right_ts).isNotNull())
    r_tagged = right.select(
        F.col(key_col).alias("_k"),
        F.col(right_ts).alias("_ts"),
        # Inclusive: right sorts BEFORE left at equal ts (visible to last()).
        # Strict: right sorts AFTER left at equal ts (not yet visible).
        F.lit(2 if strict else 0).alias("_side"),
        F.struct(*[F.col(c).alias(prefix + c) for c in rc]).alias("_r"),
    )
    l_tagged = left.select(
        F.col(key_col).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r_tagged.schema["_r"].dataType).alias("_r"),
        F.struct(*left.columns).alias("_l"),
    )
    r_tagged = r_tagged.withColumn(
        "_l", F.lit(None).cast(l_tagged.schema["_l"].dataType)
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        l_tagged.unionByName(r_tagged)
        .withColumn("_m", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
        .select("_l.*", "_m.*")
    )
