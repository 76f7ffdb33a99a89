"""Structured Streaming extensions (no streaming exists in the reference —
SURVEY.md §2.10; this is the natural incremental mode for the daily rollup)."""

from . import ann, daily_rollup, dedup, incremental, search, stateful  # noqa: F401
