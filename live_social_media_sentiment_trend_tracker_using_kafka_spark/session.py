"""SparkSession factory.

The reference hardcodes ``local[*]``, Kryo, 4 shuffle partitions in app code
(reference: consumer/spark_streaming_job.py:75-86). We instead centralize
session construction, never hardcode a master in library code, and enable the
optimizer features a 100 TB deployment needs by default:

- AQE (runtime re-planning, partition coalescing, skew-join splitting)
- Arrow for any pandas-UDF boundary
- broadcast join threshold left at default but AQE can promote joins at runtime
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))


def build_session(
    app_name: str = "live-sentiment-engine",
    master: str | None = None,
    shuffle_partitions: int = DEFAULT_SHUFFLE_PARTITIONS,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or get) a SparkSession with scale-ready defaults.

    ``master`` is only set when given explicitly (tests pass ``local[n]``);
    on a real cluster the launcher provides it — the reference's hardcoded
    ``local[*]`` (spark_streaming_job.py:81) silently disabled its own
    compose cluster, a mistake we do not repeat.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is not None:
        builder = builder.master(master)
    conf = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.shuffle.partitions": str(shuffle_partitions),
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # Session-local timezone pinned to UTC so timestamp semantics match
        # the DuckDB oracle regardless of host timezone. (events.ts itself
        # reads as TIMESTAMP_NTZ on Spark >= 4.1 — timezone-free — but other
        # timestamp exprs, e.g. current_timestamp, still honor this.)
        "spark.sql.session.timeZone": "UTC",
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def local_test_session(cpus: int | None = None) -> SparkSession:
    """Session for tests / bench: local[N] with N from $SPARK_GRAFT_CPUS."""
    n = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or "*"
    return build_session(master=f"local[{n}]")


@contextmanager
def forced_arrow_conversion(spark: SparkSession):
    """Scope ``spark.sql.execution.arrow.pyspark.enabled=true`` around a
    pandas→DataFrame conversion, restoring the caller's value afterwards.

    The Arrow local-relation fast path (``arrow_local_df``) only engages
    when the SESSION has Arrow enabled — and the external driver runs a
    PLAIN session without it. On such a session ``createDataFrame(pdf)``
    silently falls back to the pickled-RDD path (the exact fixed overhead
    the r13 change removed) and, worse, the fallback's row verifier
    rejects pandas nullable-int NA cells ("IntegerType() can not accept
    object nan") — a session-conf dependence caught by the plain-session
    r13 re-drive. Forcing the conf for just the conversion makes the
    local-table plan (LocalTableScan, no Python tasks) a property of the
    CODE, not of whoever built the session."""
    key = "spark.sql.execution.arrow.pyspark.enabled"
    try:
        old = spark.conf.get(key)
    except Exception:
        old = None
    spark.conf.set(key, "true")
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def arrow_local_df(spark: SparkSession, columns: dict, schema):
    """Small local DataFrame via the pandas→Arrow path.

    ``spark.createDataFrame(list_of_rows)`` materializes a PICKLED Python
    RDD: every downstream action re-spawns a Python worker per partition
    just to deserialize the rows (measured r13: 0.7-1.6 s/action for a
    48-row table at local[32] — fixed overhead paid by every query that
    touches the frame, e.g. as a broadcast side). Routing the same values
    through a pandas DataFrame takes the Arrow local-relation path: no
    Python tasks at action time — forced on regardless of session conf
    via ``forced_arrow_conversion`` (the external driver's session does
    not enable Arrow). ``columns`` maps column name → sequence of
    values; ``schema`` is the target StructType (or DDL string).
    """
    import pandas as pd

    with forced_arrow_conversion(spark):
        return spark.createDataFrame(pd.DataFrame(columns), schema=schema)
