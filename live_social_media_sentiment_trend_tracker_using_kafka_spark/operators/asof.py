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
(key, timestamp) break DETERMINISTICALLY on the right payload struct
(ascending field-wise: backward keeps the largest payload, forward the
smallest), so output is stable run-to-run and cross-engine. This requires
the selected right columns to be orderable types (no map columns) — if a
map payload must ride along, pre-aggregate the right side to one row per
(key, ts) instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _unorderable_path(dt: T.DataType) -> str | None:
    """Return a dotted path to the first non-orderable component of ``dt``
    (Spark cannot sort MapType, wherever it nests), or None if orderable."""
    if isinstance(dt, T.MapType):
        return ""
    if isinstance(dt, T.ArrayType):
        sub = _unorderable_path(dt.elementType)
        return None if sub is None else f"[]{('.' + sub) if sub else ''}"
    if isinstance(dt, T.StructType):
        for f in dt.fields:
            sub = _unorderable_path(f.dataType)
            if sub is not None:
                return f.name + (("." + sub) if sub else "")
    return None


def _check_orderable_payload(right: DataFrame, rc: list[str]) -> None:
    """Fail fast with a named column instead of an opaque AnalysisException
    when the deterministic `_r` tie-break would try to sort a map column."""
    schema = {f.name: f.dataType for f in right.schema.fields}
    for c in rc:
        if c not in schema:
            raise ValueError(
                f"asof join: right_cols entry '{c}' is not a column of the "
                f"right frame (has: {sorted(schema)})"
            )
        path = _unorderable_path(schema[c])
        if path is not None:
            where = c + (("." + path) if path else "")
            raise ValueError(
                f"asof join: right payload column '{where}' is a MapType, which "
                "Spark cannot order, so the deterministic tie-break cannot sort "
                "it. Exclude it via right_cols, cast it (e.g. map_entries / "
                "to_json), or pre-aggregate the right side to one row per "
                "(key, ts)."
            )


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
    _check_orderable_payload(right, rc)
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
    # `_r` in the ordering is the deterministic tie-break among right rows
    # sharing (key, ts); left rows are untouched (distinct _side, null _r).
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side", "_r")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        l_tagged.unionByName(r_tagged)
        .withColumn("_m", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
        .select("_l.*", "_m.*")
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    prefix: str = "r_",
    strict: bool = False,
    tolerance: str | None = None,
) -> DataFrame:
    """FORWARD as-of join: every left row + the EARLIEST matching right
    row at-or-after it (``strict`` = strictly after), nulls if none — the
    "time to next X" shape (error → next successful purchase, alert →
    next deploy). ``tolerance`` (an INTERVAL string, e.g. "1 day") nulls
    out matches farther ahead than the horizon WITHOUT dropping the left
    row, pandas merge_asof(direction='forward', tolerance=...) semantics.

    Same single-shuffle construction as the backward ``asof_join`` — a
    union of tagged sides and ONE per-key window doing a carry-BACKWARD
    ``first(ignorenulls)`` over [current, unbounded following] — so there
    is no interval cross-product and state per task is one key's rows.
    At equal timestamps the right row is visible to the left row when
    inclusive (sorts after left but inside the frame) and hidden when
    strict (sorts before left, outside the frame).
    """
    rc = right_cols if right_cols is not None else [c for c in right.columns if c != key_col]
    _check_orderable_payload(right, rc)
    right = right.filter(F.col(key_col).isNotNull() & F.col(right_ts).isNotNull())
    if right_ts not in rc:
        rc = [right_ts, *rc]
    r_tagged = right.select(
        F.col(key_col).alias("_k"),
        F.col(right_ts).alias("_ts"),
        # Inclusive: right sorts AFTER left at equal ts (inside the
        # [current, following] frame). Strict: right sorts BEFORE left at
        # equal ts (outside it).
        F.lit(0 if strict else 2).alias("_side"),
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
    # `_r` in the ordering breaks (key, ts) ties deterministically (the
    # smallest payload struct wins for the forward direction).
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side", "_r")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    out = (
        l_tagged.unionByName(r_tagged)
        .withColumn("_m", F.first("_r", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    if tolerance is not None:
        horizon = F.col("_ts") + F.expr(f"INTERVAL {tolerance}")
        out = out.withColumn(
            "_m",
            F.when(F.col("_m")[prefix + right_ts] <= horizon, F.col("_m")),
        )
    return out.select("_l.*", "_m.*")
