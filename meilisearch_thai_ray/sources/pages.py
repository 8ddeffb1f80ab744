"""Readers for the `pages` input table (Common-Crawl-style Parquet).

Column pruning happens at the read: the index build needs only
(url, html, lang) — `text` (the generator's own ground truth) and `warc_ts`
never leave storage unless explicitly requested.
"""

from __future__ import annotations

import ray.data


def read_pages(path: str, columns: list[str] | None = None, **kwargs) -> ray.data.Dataset:
    return ray.data.read_parquet(
        path, columns=columns or ["url", "html", "lang"], **kwargs
    )
