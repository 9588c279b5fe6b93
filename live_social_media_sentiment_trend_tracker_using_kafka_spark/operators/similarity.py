"""Similarity search over embedding columns (SURVEY.md §2.8).

Two tiers, same contract:

- **brute_force_topk** — exact cosine top-k for one query vector. The query
  vector is inlined as a literal array (broadcast by value); the scan is a
  narrow map + TakeOrderedAndProject (per-partition heap, driver merges k·P
  rows). Exact, and the right baseline at any scale where a full scan is
  affordable.
- **lsh_topk / signed random projections** — the scale path: bucket vectors
  by the sign pattern of dot products with ``num_planes`` fixed hyperplanes
  (deterministic seed). Candidates = same-bucket (multi-probe: Hamming-1
  neighbors too), exact cosine re-rank inside buckets only.
- **cosine_near_duplicate_pairs** — all-pairs near-dup above a cosine
  threshold via the same bucketing (embedding-cosine dedup).

No MLlib dependency: hyperplanes are a deterministic numpy matrix inlined as
literals, the dot products are Catalyst ``aggregate``/``zip_with`` — JVM-side,
codegen-friendly, streaming-safe.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import cosine_similarity_col, dot_col


def _lit_vec(vec) -> Column:
    return F.array(*[F.lit(float(x)) for x in vec])


def brute_force_topk(
    embeddings: DataFrame,
    query_vec,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Exact cosine top-k for one query vector (rounded for oracle parity)."""
    sim = cosine_similarity_col(F.col(vec_col), _lit_vec(query_vec))
    return (
        embeddings.select(F.col(id_col), F.round(sim, round_digits).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def _hyperplanes(dim: int, num_planes: int, seed: int = 7) -> np.ndarray:
    return np.random.RandomState(seed).normal(size=(num_planes, dim))


def signature_col(vec_col: Column, planes: np.ndarray) -> Column:
    """Signed-random-projection bucket id (int): bit p = sign(v · plane_p)."""
    sig = F.lit(0)
    for p, plane in enumerate(planes):
        sig = sig + F.when(dot_col(vec_col, _lit_vec(plane)) > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return sig


def with_lsh_bucket(
    df: DataFrame, dim: int, num_planes: int = 8, vec_col: str = "embedding", seed: int = 7
) -> DataFrame:
    return df.withColumn("bucket", signature_col(F.col(vec_col), _hyperplanes(dim, num_planes, seed)))


def lsh_topk(
    embeddings: DataFrame,
    query_vec,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 8,
    seed: int = 7,
    multi_probe: bool = True,
) -> DataFrame:
    """ANN top-k: probe the query's bucket (plus Hamming-1 neighbors when
    ``multi_probe``), exact cosine re-rank inside the probed buckets.

    At 100 TB the bucketed table is written partitioned by ``bucket`` so a
    probe is a partition-pruned scan, not a full pass.
    """
    q = np.asarray(query_vec, dtype=float)
    planes = _hyperplanes(len(q), num_planes, seed)
    qsig = sum((1 << p) for p, plane in enumerate(planes) if float(np.dot(q, plane)) > 0)
    probes = [qsig] + ([qsig ^ (1 << p) for p in range(num_planes)] if multi_probe else [])
    bucketed = with_lsh_bucket(embeddings, len(q), num_planes, vec_col, seed)
    sim = cosine_similarity_col(F.col(vec_col), _lit_vec(q))
    return (
        bucketed.filter(F.col("bucket").isin(probes))
        .select(F.col(id_col), F.round(sim, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def cosine_near_duplicate_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    num_planes: int = 10,
    seed: int = 7,
) -> DataFrame:
    """Embedding-cosine near-dup: same-bucket candidate pairs, exact verify.

    High-cosine pairs collide with high probability under sign-random
    projections (collision prob per plane = 1 - θ/π); ``num_planes`` trades
    recall for bucket size. Only intra-bucket pairs are scored — never O(n²).
    """
    b = with_lsh_bucket(embeddings, dim, num_planes, vec_col, seed).select(
        F.col(id_col), F.col(vec_col), F.col("bucket")
    )
    l, r = b.alias("l"), b.alias("r")
    sim = cosine_similarity_col(F.col(f"l.{vec_col}"), F.col(f"r.{vec_col}"))
    return (
        l.join(
            r,
            (F.col("l.bucket") == F.col("r.bucket")) & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.round(sim, 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .orderBy("id_a", "id_b")
    )
