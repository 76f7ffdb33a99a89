"""Composable relational + large-scale operators (SURVEY.md §2.2-2.7 and the
north-star dedup/similarity/text/multimodal extensions)."""

from . import (  # noqa: F401
    aggregates,
    asof,
    dedup,
    ivm,
    maintenance,
    multimodal,
    rangejoin,
    relational,
    resample,
    sessions,
    sketches,
    similarity,
    skew,
    sync,
    vector_agg,
    windows,
)
