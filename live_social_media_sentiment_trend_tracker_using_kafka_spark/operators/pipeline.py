"""End-to-end training-corpus cleaning — the composition the individual
§2.8 operators exist for: language filter → quality filter → exact dedup →
near-dup removal, returning the kept documents.

Two tiers:

- ``clean_corpus_exact``: the fully SQL-expressible slice (lang allowlist,
  quality threshold, exact-dedup keep-min-id) — oracle-checkable end to end.
- ``clean_corpus``: adds MinHash-LSH near-dup removal on top (keeps the
  smallest doc_id of each near-dup cluster's pairs, dropping the rest).

Scale notes: the chain is filter → hash-agg (fingerprint) → LSH band join —
each stage shuffles once on a key with map-side reduction; nothing collects.
Near-dup removal drops the *larger* id of each qualifying pair — a greedy,
deterministic rule that needs no connected-components iteration (transitive
clusters collapse to their minimum over repeated application; single-pass
greedy is the standard large-corpus compromise and is documented as such).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import quality_score_cols
from . import dedup
from ..caching import tracked_persist


def filter_by_language(docs: DataFrame, langs: list[str], lang_col: str = "lang") -> DataFrame:
    return docs.filter(F.col(lang_col).isin(langs))


def filter_by_quality(
    docs: DataFrame, min_quality: float = 0.5, text_col: str = "text"
) -> DataFrame:
    # explode(filter(array(score))) instead of withColumn + .filter: the
    # pushed predicate re-evaluates the whole quality heuristic below the
    # projection (token/stopword/punct scans run twice per row — see
    # dedup.shingle_table, r13). The Generate computes the score once and
    # drops sub-threshold rows; appended column name/position match the
    # old withColumn output exactly.
    q = quality_score_cols(F.col(text_col))
    return docs.select(
        "*",
        F.explode(
            F.filter(
                F.array(q["quality_score"]), lambda s: s >= min_quality
            )
        ).alias("quality_score"),
    )


def keep_exact_unique(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id representative of every exact-duplicate group."""
    keep = (
        dedup.with_fingerprint(docs, text_col)
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return docs.join(keep, id_col, "left_semi")


def clean_corpus_exact(
    docs: DataFrame,
    langs: list[str] = ("en", "es", "de", "fr"),
    min_quality: float = 0.5,
    sort: bool = True,
) -> DataFrame:
    """Oracle-checkable cleaning chain: language → quality → exact dedup.

    ``sort=False`` skips the output ordering — the near-dup tiers persist
    this table as an intermediate consumed only through joins (which
    destroy ordering anyway), so the corpus-wide range-shuffle + sort would
    be pure wasted work there; they sort their own final output.
    """
    out = filter_by_language(docs, list(langs))
    out = filter_by_quality(out, min_quality)
    out = keep_exact_unique(out)
    out = out.select(
        "doc_id", "lang", "source", F.round("quality_score", 6).alias("quality_score")
    )
    return out.orderBy("doc_id") if sort else out


def _clean_with_pair_drop(
    docs: DataFrame,
    langs: list[str],
    min_quality: float,
    pairs_fn,
) -> DataFrame:
    """Shared near-dup composition: exact tier (persisted — two consumers)
    → survivor text → pair set from ``pairs_fn`` → drop each pair's larger
    id (greedy keep-min; transitive clusters collapse under repetition, see
    module docstring) → sorted kept set. The drop rule lives HERE once —
    both tiers must never diverge on it."""
    base = tracked_persist(clean_corpus_exact(docs, langs, min_quality, sort=False))
    survivors = docs.join(base.select("doc_id"), "doc_id", "left_semi")
    pairs = pairs_fn(survivors)
    drop = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    return base.join(drop, "doc_id", "left_anti").orderBy("doc_id")


def clean_corpus(
    docs: DataFrame,
    langs: list[str] = ("en", "es", "de", "fr"),
    min_quality: float = 0.5,
    near_dup_threshold: float = 0.8,
) -> DataFrame:
    """Full cleaning chain: exact tier + MinHash-LSH near-dup removal
    (drops the larger id of every pair with Jaccard ≥ threshold).
    shingle_corpus=docs rides the session-canonical full-corpus shingle
    table, restricted to survivors by id."""
    return _clean_with_pair_drop(
        docs,
        list(langs),
        min_quality,
        lambda survivors: dedup.minhash_near_duplicates(
            survivors, threshold=near_dup_threshold, shingle_corpus=docs
        ),
    )


def clean_corpus_exact_neardup(
    docs: DataFrame,
    langs: list[str] = ("en", "es", "de", "fr"),
    min_quality: float = 0.5,
    near_dup_threshold: float = 0.8,
) -> DataFrame:
    """Full cleaning chain with EXACT near-dup removal: same pipeline as
    ``clean_corpus`` but the pair set comes from the prefix-filtered exact
    Jaccard join (operators/simjoin.py) instead of MinHash-LSH — no
    probabilistic misses, and the whole chain is expressible in plain SQL,
    so the oracle hash-checks it end to end. Use this tier when recall must
    be provable; the LSH tier when the corpus is too big to verify exactly.
    """
    from .simjoin import jaccard_similarity_join

    # order_corpus=docs: index the full corpus once (the session-canonical
    # frequency-sorted table, shared with similarity_join_exact/minhash)
    # and restrict to survivors — prefix filtering is exact under any
    # fixed global order, so superset frequencies change nothing
    return _clean_with_pair_drop(
        docs,
        list(langs),
        min_quality,
        lambda survivors: jaccard_similarity_join(
            survivors, threshold=near_dup_threshold, order_corpus=docs
        ),
    )


def attrition_report(
    docs: DataFrame,
    langs: list[str] = ("en", "es", "de", "fr"),
    min_quality: float = 0.5,
) -> DataFrame:
    """Stage-by-stage attrition of the oracle-checkable cleaning chain
    (raw → language allowlist → quality gate → exact dedup): the survivor
    funnel a pipeline operator watches to see WHERE the corpus is being
    lost before committing a 100 TB run.

    Single-pass design: one scan computes monotone per-doc survival flags
    (each stage's predicate conjoins the previous), exact-dedup survival is
    a min-id window over the fingerprint partitioning computed in the same
    pass (non-surviving docs get a per-doc partition key so they don't
    pile into one reducer), and ONE global aggregate emits every stage —
    no per-stage scans, no joins. Output: (stage_order, stage, n_docs,
    frac_of_prev, frac_of_raw).
    """
    from pyspark.sql import Window

    from ..functions.text import quality_score_cols
    from .dedup import with_fingerprint

    q = quality_score_cols(F.col("text"))["quality_score"]
    flagged = (
        with_fingerprint(docs)
        .withColumn("s_lang", F.col("lang").isin(list(langs)))
        .withColumn("s_quality", F.col("s_lang") & (q >= min_quality))
    )
    # exact-dedup survivor: min doc_id among quality-stage survivors of the
    # same fingerprint; non-survivors partition by their own doc_id
    part = F.when(F.col("s_quality"), F.col("fingerprint")).otherwise(
        F.concat(F.lit("solo:"), F.col("doc_id").cast("string"))
    )
    keep_id = F.min(F.when(F.col("s_quality"), F.col("doc_id"))).over(
        Window.partitionBy(part)
    )
    flagged = flagged.withColumn(
        "s_dedup", F.col("s_quality") & (F.col("doc_id") == keep_id)
    )
    counts = flagged.agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.sum(F.col("s_lang").cast("long")).alias("n_lang"),
        F.sum(F.col("s_quality").cast("long")).alias("n_quality"),
        F.sum(F.col("s_dedup").cast("long")).alias("n_dedup"),
    )
    return (
        counts.select(
            F.expr(
                "stack(4,"
                " 1, 'raw', n_raw, cast(null as bigint),"
                " 2, 'lang_allowlist', n_lang, n_raw,"
                " 3, 'quality_gate', n_quality, n_lang,"
                " 4, 'exact_dedup', n_dedup, n_quality)"
                " as (stage_order, stage, n_docs, prev)"
            ),
            F.col("n_raw"),
        )
        .select(
            "stage_order",
            "stage",
            "n_docs",
            F.round(F.col("n_docs") / F.nullif(F.col("prev"), F.lit(0)), 6).alias(
                "frac_of_prev"
            ),
            F.round(F.col("n_docs") / F.col("n_raw"), 6).alias("frac_of_raw"),
        )
        .orderBy("stage_order")
    )
