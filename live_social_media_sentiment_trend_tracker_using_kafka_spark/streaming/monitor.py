"""Stream health monitoring and graceful shutdown.

Reference parity: the consumer polls ``spark.streams.active`` every 30 s,
logs batchId / inputRowsPerSecond from ``lastProgress``, and breaks when a
query dies (consumer/spark_streaming_job.py:166-195); Ctrl-C stops each
stream then the session (:197-210). Here the poll loop is a reusable
function with an injectable clock/callback (testable without sleeping), and
shutdown is idempotent.
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import SparkSession


def stream_progress_snapshot(spark: SparkSession) -> list[dict]:
    """One monitoring sample: (name, id, batchId, input rate) per active query."""
    out = []
    for q in spark.streams.active:
        p = q.lastProgress or {}
        out.append(
            {
                "name": q.name,
                "id": str(q.id),
                "is_active": q.isActive,
                "batch_id": p.get("batchId"),
                "input_rows_per_second": p.get("inputRowsPerSecond"),
                "num_input_rows": p.get("numInputRows"),
            }
        )
    return out


def monitor_streams(
    spark: SparkSession,
    interval_sec: float = 30.0,
    max_samples: int | None = None,
    on_sample: Callable[[list[dict]], None] | None = None,
    sleep: Callable[[float], None] = time.sleep,
) -> list[list[dict]]:
    """Poll active queries until none remain (or ``max_samples``); returns
    the collected samples. A dead query (inactive with an exception) stops
    the loop — same break condition as the reference's monitor loop."""
    samples: list[list[dict]] = []
    while spark.streams.active:
        snap = stream_progress_snapshot(spark)
        samples.append(snap)
        if on_sample:
            on_sample(snap)
        if any(not s["is_active"] for s in snap):
            break
        if max_samples is not None and len(samples) >= max_samples:
            break
        sleep(interval_sec)
    return samples


def stop_all_streams(
    spark: SparkSession,
    timeout_sec: float = 30.0,
    clock: Callable[[], float] = time.time,
    sleep: Callable[[float], None] = time.sleep,
) -> tuple[int, list[str]]:
    """Gracefully stop every active query; returns (stopped count, names of
    queries STILL active at timeout) — callers must check the second element
    before tearing the session down, a silent count alone let shutdown
    proceed with live state stores (reference:
    consumer/spark_streaming_job.py:197-207). Clock/sleep are injectable
    like monitor_streams, so the timeout branch is testable without real
    sleeping."""
    stopped = 0
    for q in list(spark.streams.active):
        try:
            q.stop()
            stopped += 1
        except Exception:  # stopping a dying query races; best-effort
            pass
    deadline = clock() + timeout_sec
    while spark.streams.active and clock() < deadline:
        sleep(0.1)
    leftover = [q.name or q.id for q in spark.streams.active]
    return stopped, leftover
