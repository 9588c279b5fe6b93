"""Local replica of the driver's Spark-vs-DuckDB comparison: row count,
schema width, and order-insensitive value comparison with columns sorted by
name. Used by tests so oracle drift is caught before the driver runs."""

from __future__ import annotations

import datetime as dt
import math
from pathlib import Path

import duckdb

from live_social_media_sentiment_trend_tracker_using_kafka_spark.schema import TESTDATA_TABLES


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def rows_normalized(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


# DuckDB logical types that pandas/Arrow cannot hold losslessly as int64:
# HUGEINT (the default result of SUM over integers) materializes as float64,
# so the driver hashes e.g. 9549.0 against Spark's 9549 and mismatches even
# when values agree.  Round 3's only red row (session_stats) was exactly this;
# the fetchall()-based replica couldn't see it because Python ints erase the
# distinction.  Oracles must CAST such sums to BIGINT.
_PANDAS_LOSSY_TYPES = {"HUGEINT", "UHUGEINT"}


def assert_pandas_safe_types(con, sql: str):
    bad = [
        (i, str(t))
        for i, t in enumerate(con.sql(sql).types)
        if str(t) in _PANDAS_LOSSY_TYPES
    ]
    assert not bad, (
        f"oracle result columns {bad} have DuckDB types that pandas "
        f"materializes as float64 — wrap with CAST(... AS BIGINT) so the "
        f"driver's hash sees an integer"
    )


# The driver's value hasher (pandas-based) dies with TypeError on list/dict
# cells, so a hash-checked query must emit only scalar columns.  Round 10's
# one red row (inverted_index) was exactly this: the local replica quietly
# tuple-normalized array cells the driver rejects.  Mirror the driver:
# refuse Array/Map on the Spark side and LIST/MAP/STRUCT on the DuckDB side.
_DUCKDB_NONSCALAR_MARKERS = ("[]", "MAP(", "STRUCT(")


def assert_hashable_schema(spark_df, con, sql: str):
    from pyspark.sql.types import ArrayType, MapType, StructType

    bad_s = [
        f.name
        for f in spark_df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad_s, (
        f"hash-checked query emits non-scalar Spark columns {bad_s} — the "
        f"driver's hasher cannot digest list/map cells (r10 inverted_index "
        f"red); array_join to CSV or explode to rows"
    )
    rel = con.sql(sql)
    bad_d = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if any(m in str(t) for m in _DUCKDB_NONSCALAR_MARKERS)
    ]
    assert not bad_d, (
        f"oracle result has non-scalar DuckDB columns {bad_d} — mirror the "
        f"Spark side's scalar serialization (array_to_string)"
    )


def compare(spark_df, con, sql: str):
    assert_pandas_safe_types(con, sql)
    assert_hashable_schema(spark_df, con, sql)
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    res = con.execute(sql)
    d_cols = [c[0] for c in res.description]
    d_rows = res.fetchall()
    assert sorted(s_cols) == sorted(d_cols), f"columns differ: {sorted(s_cols)} vs {sorted(d_cols)}"
    assert len(s_rows) == len(d_rows), f"row counts differ: {len(s_rows)} vs {len(d_rows)}"
    sn = rows_normalized(s_cols, s_rows)
    dn = rows_normalized(d_cols, d_rows)
    mismatches = [(a, b) for a, b in zip(sn, dn) if a != b]
    assert not mismatches, f"value mismatch ({len(mismatches)} rows), first: {mismatches[0]}"
