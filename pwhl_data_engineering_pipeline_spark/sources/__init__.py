"""Sources & sinks (SURVEY.md §2.1 S1-S13)."""

from . import readers, writers  # noqa: F401
