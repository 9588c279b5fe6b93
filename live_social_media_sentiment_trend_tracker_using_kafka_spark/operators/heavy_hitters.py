"""Exact distributed heavy hitters with bounded memory.

Finding all items occurring in >= phi fraction of N rows with a plain
``groupBy(item).count()`` shuffles every distinct item — at 100 TB the
long tail of near-unique items dominates the shuffle even though none of it
can be a heavy hitter. The classic two-phase fix (public: Misra & Gries
1982; merged-summary guarantees in Agarwal et al., "Mergeable Summaries",
PODS 2012):

1. **Candidate phase** — one pass per partition with a Misra-Gries summary
   of ``k = ceil(1/phi)`` counters (``mapInPandas``: Arrow-batched, counters
   carried across batches of the partition, O(k) memory). Pigeonhole: any
   item with global frequency > N/k must exceed n_p/k in at least one
   partition, so the union of per-partition candidates is a SUPERSET of
   every true heavy hitter. Output is <= k rows per partition — tiny.
2. **Verify phase** — exact counts for candidate items only: semi-join the
   data against the (broadcast) candidate set, then a normal count. The
   shuffle now carries only candidate items, not the tail.

The result is EXACT (phase 1 can only over-generate, never miss — and the
threshold filter happens on true counts), so a plain GROUP BY/HAVING SQL
twin oracle-checks it.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _misra_gries_partial(k: int, col: str):
    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Vectorized mergeable-summary variant (Agarwal et al. 2012): fold
        # each Arrow batch's value_counts into the summary, then if more
        # than k counters remain, subtract the (k+1)-largest count from all
        # and drop the non-positive ones. Same guarantee as row-at-a-time
        # Misra-Gries (undercount <= n_p/(k+1)), batch-speed in pandas.
        counters = pd.Series(dtype="int64")
        for batch in batches:
            vc = batch[col].dropna().value_counts()
            counters = counters.add(vc, fill_value=0)
            if len(counters) > k:
                cut = counters.nlargest(k + 1).iloc[-1]
                counters = counters - cut
                counters = counters[counters > 0]
        yield pd.DataFrame({col: counters.index})

    return summarize


def heavy_hitters(
    df: DataFrame,
    item_col: str,
    phi: float = 0.01,
) -> DataFrame:
    """All items with count >= phi * N, with their EXACT counts.

    Memory per task is O(1/phi) regardless of data size; the only full
    shuffle carries candidate rows. Output: (item_col, count), count desc,
    item asc tiebreak.
    """
    if not 0.0 < phi <= 1.0:
        raise ValueError("phi must be in (0, 1]")
    k = math.ceil(1.0 / phi)
    items = df.select(item_col)
    candidates = (
        items.mapInPandas(_misra_gries_partial(k, item_col), schema=items.schema)
        .distinct()
    )
    total = items.count()
    threshold = math.ceil(phi * total)
    return (
        items.join(F.broadcast(candidates), item_col, "left_semi")
        .groupBy(item_col)
        .agg(F.count(F.lit(1)).alias("count"))
        .filter(F.col("count") >= threshold)
        .orderBy(F.desc("count"), F.asc(item_col))
    )
