"""Build state: per-partition manifest + lineage for resumable indexing."""

from .manifest import BuildManifest  # noqa: F401
