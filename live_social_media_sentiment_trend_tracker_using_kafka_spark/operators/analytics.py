"""Dashboard analytics as Spark operators.

The reference dashboard recomputes these eight analytics in pandas over the
full history on every refresh (reference: dashboard/streamlit_app.py:269-401).
Here each is a composable DataFrame operator usable in batch or (via
foreachBatch / windowed agg) streaming.

Parity map (SURVEY.md §2.4-2.5):

- A1-A4  global count + means                → ``global_stats``
- A5/A6  group-by count (label / platform)   → ``grouped_count``
- A7     explode + count + top-k (hashtags)  → ``exploded_topk``
- A8/O5  group-by count top-k                → ``grouped_topk``
- O1     time-ordered series                 → ``time_series``
- O2/O3  last-N by time                      → ``last_n``
- O4     head-N                              → ``head_n``

Determinism: pandas ``value_counts`` orders ties by encounter order — not
reproducible distributed. Every operator here imposes the documented
deterministic tiebreak (count desc, key asc; SURVEY.md §2.4), so results are
stable across partitionings and match the DuckDB oracle.

Scale notes: each grouped count is a hash aggregate with map-side partial
aggregation (one shuffle of the *distinct keys*, not rows). Top-k uses
``orderBy().limit(k)`` which Spark executes as TakeOrderedAndProject — per-
partition heaps + single driver merge of k·P rows, no global sort. ``avg`` is
decomposed sum/count, so partials combine exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def mean_band_col(mean_col: Column) -> Column:
    """A4 banding (reference: dashboard/streamlit_app.py:281-283): the
    dashboard labels the mean sentiment positive (> 0.1), neutral (> -0.1),
    else negative. Pure ``when`` chain — applies to any mean column."""
    return (
        F.when(mean_col > 0.1, F.lit("positive"))
        .when(mean_col > -0.1, F.lit("neutral"))
        .otherwise(F.lit("negative"))
    )


def global_stats(
    df: DataFrame,
    mean_cols: list[str],
    round_digits: int = 6,
    band_on: str | None = None,
) -> DataFrame:
    """A1-A4: one row — total count plus the mean of each named column.

    Means are rounded (default 6 dp) so cross-engine float-sum ordering drift
    can't flip the oracle hash. ``band_on`` names a mean column to also label
    with the dashboard's positive/neutral/negative band (A4); the band is
    computed on the *rounded* mean so both engines see the same boundary.
    """
    aggs: list[Column] = [F.count(F.lit(1)).alias("total_rows")]
    for c in mean_cols:
        aggs.append(F.round(F.avg(c), round_digits).alias(f"avg_{c}"))
    out = df.agg(*aggs)
    if band_on is not None:
        out = out.withColumn(f"{band_on}_band", mean_band_col(F.col(f"avg_{band_on}")))
    return out


def grouped_count(df: DataFrame, key: str, alias: str | None = None) -> DataFrame:
    """A5/A6: group-by count, ordered count desc then key asc (deterministic)."""
    out_key = alias or key
    return (
        df.groupBy(F.col(key).alias(out_key))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc(out_key))
    )


def grouped_topk(df: DataFrame, key: str, k: int = 10, alias: str | None = None) -> DataFrame:
    """A8/O5: group-by count, top-k with deterministic tiebreak."""
    return grouped_count(df, key, alias).limit(k)


def exploded_topk(df: DataFrame, array_col: Column | str, k: int = 10, alias: str = "tag") -> DataFrame:
    """A7: flatten an array column, count values, top-k.

    One narrow explode (no shuffle) then a hash aggregate; at scale the
    partial agg collapses each partition's tag counts before the exchange.
    """
    col = F.col(array_col) if isinstance(array_col, str) else array_col
    return (
        df.select(F.explode(col).alias(alias))
        .groupBy(alias)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc(alias))
        .limit(k)
    )


def time_series(
    df: DataFrame,
    ts_col: str,
    bucket: str = "1 hour",
    value_col: str | None = None,
    round_digits: int = 6,
) -> DataFrame:
    """O1 upgraded: time-bucketed counts (and optional mean), time-ordered.

    The reference sorts raw rows by timestamp and lets plotly aggregate
    client-side (streamlit_app.py:294-300); the scalable semantic is a
    windowed aggregate. Bucket = ``window(ts, bucket).start`` ≡ DuckDB
    ``time_bucket``.
    """
    aggs = [F.count(F.lit(1)).alias("cnt")]
    if value_col is not None:
        aggs.append(F.round(F.avg(value_col), round_digits).alias(f"avg_{value_col}"))
    return (
        df.groupBy(F.window(ts_col, bucket).getField("start").alias("bucket_ts"))
        .agg(*aggs)
        .orderBy("bucket_ts")
    )


def last_n(df: DataFrame, ts_col: str, n: int, tiebreak: str) -> DataFrame:
    """O2/O3: latest N rows, newest first; ``tiebreak`` is a unique column so
    the result is deterministic (pandas ``tail`` is positional — not
    meaningful distributed; SURVEY.md §2.5 O2)."""
    return df.orderBy(F.desc(ts_col), F.desc(tiebreak)).limit(n)


def head_n(df: DataFrame, order_col: str, n: int) -> DataFrame:
    """O4: first N rows under an explicit deterministic order."""
    return df.orderBy(F.asc(order_col)).limit(n)


def latest_display(
    df: DataFrame,
    ts_col: str,
    text_col: str,
    tiebreak: str,
    n: int = 10,
    truncate_at: int = 80,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """O3+P7+P8+P9: the dashboard's 'latest posts' table — newest-first top-n
    with display-formatted time (HH:mm:ss) and ellipsis-truncated text
    (reference: dashboard/streamlit_app.py:386-395)."""
    cols = [
        F.col(tiebreak),
        F.date_format(F.col(ts_col), "HH:mm:ss").alias("display_time"),
        F.concat(F.substring(F.col(text_col), 1, truncate_at), F.lit("...")).alias("display_text"),
        *[F.col(c) for c in (extra_cols or [])],
    ]
    # the newest-N ordering contract lives in last_n alone
    return last_n(df, ts_col, n, tiebreak).select(*cols)


def users_with_both_event_types(
    events: DataFrame, type_a: str, type_b: str, user_col: str = "user_id"
) -> DataFrame:
    """Set-op INTERSECT: users who performed BOTH event types.

    ``intersect`` plans as a distinct + co-partitioned semi-style join —
    one shuffle per side on the user key; inputs are pre-projected to the
    single key column so the shuffle moves keys, not rows.
    """
    a = events.filter(F.col("event_type") == type_a).select(user_col)
    b = events.filter(F.col("event_type") == type_b).select(user_col)
    return a.intersect(b).orderBy(user_col)


def users_with_only_first_type(
    events: DataFrame, type_a: str, type_b: str, user_col: str = "user_id"
) -> DataFrame:
    """Set-op EXCEPT (distinct): users with ``type_a`` events but no
    ``type_b`` events ever. Same shuffle shape as the intersect twin."""
    a = events.filter(F.col("event_type") == type_a).select(user_col)
    b = events.filter(F.col("event_type") == type_b).select(user_col)
    return a.subtract(b).orderBy(user_col)


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column data-profiling report: row count, null count, distinct
    non-null values, and fill rate — the schema-health pass a pipeline
    runs on an unfamiliar table before trusting any column for filtering
    or joining (the engine-side replacement for the reference dashboard's
    ad-hoc ``df.info()``-style inspection).

    Returns (col_name, n_rows, n_null, n_distinct, fill_rate) ordered by
    column name. ``n_distinct`` counts distinct NON-null values (both
    engines' COUNT(DISTINCT) semantics); every ratio divides exact
    integers.

    Scale shape: ONE corpus scan — ``stack`` melts the row into
    (column, value-as-string) pairs (a |cols|x row blow-up that map-side
    partial aggregation collapses immediately), then a single
    (column, value) dedup-count exchange and a |cols|-row rollup. The
    alternative — one multi-countDistinct agg — would Expand-replicate
    every row |cols| times THROUGH the exchange (the Q21 lesson); melting
    first keeps the exchange at |cols| x |distinct-values| rows. A
    per-column loop of separate aggs would instead scan the corpus
    |cols| times.
    """
    stack_args = ", ".join(
        f"'{c}', cast(`{c}` as string)" for c in cols
    )
    pairs = df.select(
        F.expr(f"stack({len(cols)}, {stack_args}) as (col_name, val)")
    )
    per_value = pairs.groupBy("col_name", "val").agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        per_value.groupBy("col_name")
        .agg(
            F.sum("n").cast("long").alias("n_rows"),
            F.sum(F.when(F.col("val").isNull(), F.col("n")).otherwise(0))
            .cast("long")
            .alias("n_null"),
            F.count(F.when(F.col("val").isNotNull(), F.lit(1)))
            .cast("long")
            .alias("n_distinct"),
        )
        .select(
            "col_name",
            "n_rows",
            "n_null",
            "n_distinct",
            F.round(
                (F.col("n_rows") - F.col("n_null"))
                / F.col("n_rows").cast("double"),
                6,
            ).alias("fill_rate"),
        )
        .orderBy("col_name")
    )
