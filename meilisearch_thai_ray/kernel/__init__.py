"""Pure-Python single-node oracle kernel (no Ray).

The distributed pipeline must match this kernel byte-for-byte (extraction) and
rank-for-rank (BM25 top-k). Stages import the same functions so the invariant
is about *distributed execution preserving the kernel's output* across Arrow
round-trips, parallelism levels and resume boundaries.
"""

from .charclass import (  # noqa: F401
    contains_thai,
    extract_thai_runs,
    is_mixed_content,
    is_thai_char,
    thai_ratio,
)
from .extract import html_to_text  # noqa: F401
from .segmenter import ThaiSegmenter  # noqa: F401
from .tokenize import DocumentTokenizer  # noqa: F401
