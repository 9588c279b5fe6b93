"""Composable DataFrame operators (batch + streaming)."""

from .enrich import enrich_posts, filter_valid_text
from .normalize import normalize_posts
from . import (
    analytics,
    asof,
    cluster,
    contamination,
    corpus,
    dedup,
    heavy_hitters,
    multimodal,
    pipeline,
    relational,
    sessionize,
    similarity,
    simjoin,
    skew,
    window_funcs,
)

__all__ = [
    "enrich_posts",
    "filter_valid_text",
    "normalize_posts",
    "analytics",
    "asof",
    "cluster",
    "contamination",
    "corpus",
    "dedup",
    "heavy_hitters",
    "multimodal",
    "pipeline",
    "relational",
    "sessionize",
    "similarity",
    "simjoin",
    "skew",
    "window_funcs",
]
