"""Deterministic synthetic fixtures: the `pages` input table and the Thai query set."""

from .pages import generate_pages, write_pages_parquet  # noqa: F401
from .queries import QUERY_FIXTURES  # noqa: F401
