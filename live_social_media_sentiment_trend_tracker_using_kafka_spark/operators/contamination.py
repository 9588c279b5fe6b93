"""Benchmark decontamination (SURVEY.md §2.8 extension).

Training corpora must not contain evaluation data. The standard public
recipe (GPT-3 appendix C; Dodge et al., "Documenting Large Webtext
Corpora", EMNLP 2021) is n-gram overlap: a candidate document is
contaminated to the degree its word n-grams appear anywhere in the
benchmark set.

Scale shape (100 TB corpus vs ~MB-GB benchmark suite):

- Candidate side: one pass, per-row Catalyst shingling (no shuffle), then
  an explode to (doc, gram) — linear, the same blow-up every inverted
  index pays.
- Benchmark side: distinct grams — tiny. Spark's AQE broadcasts the gram
  set automatically when it fits, turning the membership probe into a
  map-side broadcast semi-join with NO shuffle of the corpus. If the
  benchmark outgrows broadcast, the equi-join on the gram key shuffles
  both sides — still linear, never O(n·m).
- ``use_hash=True`` (default) joins on ``xxhash64(gram)`` instead of the
  gram string: 8 bytes per key instead of ~n·8, which at corpus scale is
  the difference between shuffling grams and shuffling fingerprints.
  Contract queries pass False so DuckDB can verify gram-for-gram.

Reference parity: not in the reference (it has no corpus ops at all);
driver-contract extension scope.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import word_shingles_col
from ..caching import tracked_persist


def _gram_key(gram: Column, use_hash: bool) -> Column:
    return F.xxhash64(gram) if use_hash else gram


def contamination_stats(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    use_hash: bool = True,
    round_digits: int = 6,
) -> DataFrame:
    """Per-document contamination vs a benchmark corpus.

    Returns (id, n_grams, n_contaminated, contam_frac) for every candidate
    doc with at least one n-gram: distinct word n-grams, how many of them
    occur anywhere in the benchmark, and the fraction.
    """
    from .skew import fan_out

    # The shingle table feeds both the probe explode and the final n_grams
    # projection — persist so per-row shingling runs once; fan_out gives the
    # CPU-bound shingling full parallelism on under-split local scans.
    sh = tracked_persist(
        fan_out(docs)
        .select(F.col(id_col), word_shingles_col(F.col(text_col), n).alias("grams"))
        .filter(F.size("grams") > 0)
    )
    cand = sh.select(id_col, F.explode("grams").alias("gram")).select(
        id_col, _gram_key(F.col("gram"), use_hash).alias("gram_key")
    )
    bench = (
        benchmark.select(
            F.explode(word_shingles_col(F.col(text_col), n)).alias("gram")
        )
        .select(_gram_key(F.col("gram"), use_hash).alias("gram_key"))
        .distinct()
    )
    hits = (
        cand.join(bench, "gram_key", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    return (
        sh.select(id_col, F.size("grams").alias("n_grams"))
        .join(hits, id_col, "left")
        .na.fill({"n_contaminated": 0})
        .select(
            id_col,
            F.col("n_grams").cast("long").alias("n_grams"),
            F.col("n_contaminated").cast("long").alias("n_contaminated"),
            F.round(
                F.col("n_contaminated") / F.col("n_grams"), round_digits
            ).alias("contam_frac"),
        )
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    max_frac: float = 0.1,
    use_hash: bool = True,
) -> DataFrame:
    """Candidate docs whose benchmark n-gram overlap is ≤ ``max_frac``.

    Docs with no n-grams (shorter than n tokens) carry no contamination
    evidence and are kept — the quality-score tier is responsible for
    degenerate docs, not this one.
    """
    stats = contamination_stats(docs, benchmark, text_col, id_col, n, use_hash)
    dirty = stats.filter(F.col("contam_frac") > max_frac).select(id_col)
    return docs.join(dirty, id_col, "left_anti")
