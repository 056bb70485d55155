"""Utilities: benchmark timing and profiling helpers (SURVEY.md C16)."""

from .timer import time_fn  # noqa: F401
