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


def ivf_index(
    embeddings: DataFrame,
    n_clusters: int = 16,
    vec_col: str = "embedding",
    seed: int = 7,
    max_iter: int = 10,
) -> tuple[DataFrame, np.ndarray]:
    """IVF coarse quantizer: KMeans over L2-normalized vectors.

    Returns (embeddings + ``cluster`` int column, centroid matrix). On the
    unit sphere, nearest-euclidean-centroid == highest-cosine-centroid, so
    plain KMeans acts as a spherical quantizer for cosine search. At scale
    the assigned table is written ``partitionBy("cluster")`` (see
    sources/writers.py) so a probe reads only nprobe partitions — the IVF
    analogue of the LSH bucket pruning above; the fit itself runs on a
    sampled subset, and assignment is one broadcast of k centroids.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    norm = F.greatest(
        F.sqrt(
            F.aggregate(
                F.transform(vec_col, lambda y: y.cast("double") * y.cast("double")),
                F.lit(0.0),
                lambda a, b: a + b,
            )
        ),
        F.lit(1e-12),
    )
    with_vec = (
        embeddings.withColumn("__norm", norm)
        .withColumn(
            "__vec",
            array_to_vector(F.transform(vec_col, lambda x: x.cast("double") / F.col("__norm"))),
        )
        .drop("__norm")
    )
    # A coarse quantizer doesn't need convergence — a few Lloyd iterations
    # give the same probe recall at a fraction of the fit cost.
    model = KMeans(
        k=n_clusters, seed=seed, maxIter=max_iter,
        featuresCol="__vec", predictionCol="cluster",
    ).fit(with_vec)
    assigned = model.transform(with_vec).drop("__vec")
    return assigned, np.array([np.asarray(c) for c in model.clusterCenters()])


def ivf_topk(
    embeddings: DataFrame,
    query_vec,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    nprobe: int = 4,
    seed: int = 7,
) -> DataFrame:
    """ANN top-k via IVF: probe the ``nprobe`` clusters whose centroids are
    most cosine-similar to the query, exact cosine re-rank inside them.

    Same contract as ``lsh_topk``; with ``nprobe == n_clusters`` it is
    exact. Centroids are a k×dim dim-table — ranking them against the query
    is driver-side numpy on a handful of floats, not a collect of data rows.
    """
    assigned, centroids = ivf_index(embeddings, n_clusters, vec_col, seed)
    q = np.asarray(query_vec, dtype=float)
    qn = q / np.linalg.norm(q)
    cn = centroids / np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)
    probes = np.argsort(-(cn @ qn))[:nprobe].tolist()
    sim = cosine_similarity_col(F.col(vec_col), _lit_vec(q))
    return (
        assigned.filter(F.col("cluster").isin(probes))
        .select(F.col(id_col), F.round(sim, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def label_centroids(
    embeddings: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Per-label centroid of the embedding vectors, in exploded
    (label, dim, value) form.

    posexplode + one hash aggregation on (label, dim) — map-side partials
    make the shuffle |labels|·|dims| rows regardless of input size. The
    exploded form keeps the result hashable row-by-row (and directly
    SQL-expressible), unlike an array-valued centroid column; zip it back
    with ``collect_list`` ordered by dim when an array is needed.
    """
    return (
        embeddings.select(F.col(label_col), F.posexplode(vec_col).alias("dim", "v"))
        .groupBy(label_col, "dim")
        .agg(F.round(F.avg(F.col("v").cast("double")), round_digits).alias("centroid_v"))
        .orderBy(label_col, "dim")
    )


def cosine_pairs_exact(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Exact all-pairs cosine >= threshold — O(n²) BY DESIGN.

    This is the verification baseline for ``cosine_near_duplicate_pairs``
    (the bucketed scale path): run it on an explicitly bounded sample to
    hash-check the bucketed path's arithmetic and recall, never on the full
    table. The pair generation is a nested-loop join on ``id_a < id_b`` —
    Spark broadcasts the smaller side; at sample sizes (10²-10³ rows) that
    is a single executor-local loop.
    """
    a = embeddings.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    sim = F.round(cosine_similarity_col(F.col("va"), F.col("vb")), round_digits)
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
        .orderBy("id_a", "id_b")
    )


def cosine_near_duplicate_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    num_planes: int = 8,
    num_tables: int = 4,
    seed: int = 7,
) -> DataFrame:
    """Embedding-cosine near-dup: LSH candidates → exact cosine verify.

    OR-amplified sign-random-projection LSH: ``num_tables`` independent
    hash tables (disjoint hyperplane sets), candidates = pairs sharing a
    bucket in ANY table. Per-plane collision prob for angle θ is 1 - θ/π, so
    pair recall is 1 - (1 - p^num_planes)^num_tables — a single table
    (AND-only) misses near pairs with non-trivial probability; four tables
    push the miss rate below 1e-4 at cosine ≥ 0.95. Only intra-bucket pairs
    are exactly scored — never O(n²); the banded id table is id+bucket only
    (vectors are joined back just for the verify)."""
    bucket_structs = [
        F.struct(
            F.lit(t).alias("tbl"),
            signature_col(F.col(vec_col), _hyperplanes(dim, num_planes, seed + t)).alias("bucket"),
        )
        for t in range(num_tables)
    ]
    banded = embeddings.select(
        F.col(id_col), F.explode(F.array(*bucket_structs)).alias("tb")
    ).select(id_col, "tb.tbl", "tb.bucket")
    l, r = banded.alias("l"), banded.alias("r")
    cands = (
        l.join(
            r,
            (F.col("l.tbl") == F.col("r.tbl"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
        .distinct()
    )
    a = embeddings.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"))
    b = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"))
    sim = cosine_similarity_col(F.col("v_a"), F.col("v_b"))
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", F.round(sim, 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
        .orderBy("id_a", "id_b")
    )
