"""Entity resolution / record linkage (§2.8 extension): match dirty
records against a clean registry with blocking + edit distance — the
dedup family's cousin for STRUCTURED keys (names, addresses, product
titles), where token shingles are too coarse and the match predicate is
an edit-distance budget.

The classic two-stage shape (Fellegi-Sunter style blocking, public
record-linkage literature):

1. **Blocking**: join dirty and clean ONLY where a cheap deterministic
   block key agrees (e.g. country + a stable substring). This is the
   recall/cost contract — a corruption that changes the block key is
   unmatchable by construction, and the pairwise cost is
   Σ_blocks |dirty_b| × |clean_b|, so the caller must pick keys whose
   blocks stay small (document per use; warn-level guidance below).
2. **Matching**: per surviving pair, exact Levenshtein distance
   (JVM-side ``F.levenshtein`` — no Python boundary), keep pairs within
   ``max_distance``, then per dirty record pick the single best match by
   (distance, clean id) — a ``min_by`` hash aggregation, map-side
   combinable.

Scale shape: one hash join on the block key (both sides shuffle on it —
neither side is assumed broadcastable; AQE may still choose broadcast at
runtime when a side is small), one hash aggregation on the dirty id. No
window, no cross join; cost is driven entirely by block sizes, which the
block-key contract bounds. For 100 TB registries add a salt column to
the block key for known-hot blocks (same pattern as skew.salted_join).

Determinism: Levenshtein is exact; the best-match pick orders on
(distance, clean_id), so replays and the DuckDB oracle (``levenshtein``)
agree row-for-row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def blocked_edit_resolve(
    dirty: DataFrame,
    clean: DataFrame,
    block_cols: list[str],
    dirty_id: str,
    dirty_name: str,
    clean_id: str,
    clean_name: str,
    max_distance: int = 2,
) -> DataFrame:
    """Resolve each dirty record to its best clean match within the
    same block and an edit-distance budget.

    Inputs must both carry ``block_cols`` (same names/types). Returns
    (dirty_id, dirty_name, clean_id, clean_name, distance) with ONE row
    per matched dirty record — the (distance, clean_id)-minimal
    candidate; unmatched dirty records are absent (left-anti recall
    audits compose on top).
    """
    d = dirty.select(
        *block_cols, F.col(dirty_id).alias("_did"), F.col(dirty_name).alias("_dname")
    )
    c = clean.select(
        *block_cols, F.col(clean_id).alias("_cid"), F.col(clean_name).alias("_cname")
    )
    pairs = d.join(c, on=block_cols, how="inner").withColumn(
        "_dist", F.levenshtein(F.col("_dname"), F.col("_cname"))
    )
    best = (
        pairs.filter(F.col("_dist") <= max_distance)
        .groupBy("_did")
        .agg(
            F.min_by(
                F.struct(
                    F.col("_cid").alias("_cid"),
                    F.col("_cname").alias("_cname"),
                    F.col("_dname").alias("_dname"),
                    F.col("_dist").alias("_dist"),
                ),
                F.struct(F.col("_dist"), F.col("_cid")),
            ).alias("m")
        )
    )
    return best.select(
        F.col("_did").alias(dirty_id),
        F.col("m._dname").alias(dirty_name),
        F.col("m._cid").alias(clean_id),
        F.col("m._cname").alias(clean_name),
        F.col("m._dist").cast("int").alias("distance"),
    )
