"""Dataset sources/sinks for the engine's tables."""

from .pages import read_pages  # noqa: F401
