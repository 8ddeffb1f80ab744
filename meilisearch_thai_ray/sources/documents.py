"""JSON document ingest (reference S1: POST /api/v1/index-documents).

The reference accepts {id, title, content, metadata} documents singly or in
batches (src/api/endpoints/documents.py:66-219). Here the same payload shape
arrives as JSONL files (or a Python list for tiny tests) and is normalized
into the engine's `pages`-equivalent rows:

    url   = "doc://{id}"           (stable doc_id derives from it)
    text  = f"{title}\n{content}"  (the f"{title} {content}" concat semantics
                                    of document_processor.py:193, newline kept
                                    so titles stay line-separated like the
                                    HTML extraction path)
    html  = minimal wrapper (so the same extract+tokenize stage applies)
    lang/metadata columns pass through untouched (dynamic schema — the
    reference strips nothing but `_`-prefixed engine fields).
"""

from __future__ import annotations

import html as _html
import json

import pyarrow as pa

import ray.data

PAGES_FIELDS = ("url", "warc_ts", "html", "text", "lang")


def expand_parquet_paths(paths) -> list[str]:
    """Expand directory entries (Ray write_parquet output dirs) into their
    .parquet files: pyarrow.dataset()/ray.data.read_parquet() accept a
    directory as a single path but reject directories inside a path LIST."""
    import os

    if isinstance(paths, str):
        paths = [paths]
    out: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            out.extend(os.path.join(p, f) for f in sorted(os.listdir(p))
                       if f.endswith(".parquet"))
        else:
            out.append(p)
    return out


def read_parquet_clean(path: str, columns: list[str] | None = None,
                       **kwargs) -> ray.data.Dataset:
    """read_parquet with a metadata-stripped schema.

    Pandas-written parquet carries a b'pandas' schema-metadata blob that makes
    pyarrow.Schema unhashable, so every Ray schema-dedup pass logs
    "Failed to hash the schemas" per worker. Passing an explicit clean schema
    at the read removes the metadata at the source (zero extra copies)."""
    import os

    import pyarrow.parquet as pq

    f = path
    if os.path.isdir(path):
        f = next(
            os.path.join(path, x)
            for x in sorted(os.listdir(path)) if x.endswith(".parquet")
        )
    sch = pq.ParquetFile(f).schema_arrow.remove_metadata()
    if columns:
        sch = pa.schema([sch.field(c) for c in columns])
    return ray.data.read_parquet(path, columns=columns, schema=sch, **kwargs)


def _normalize_batch(batch: pa.Table) -> pa.Table:
    ids = batch["id"].to_pylist()
    titles = batch["title"].to_pylist() if "title" in batch.column_names else [""] * len(ids)
    contents = batch["content"].to_pylist() if "content" in batch.column_names else [""] * len(ids)
    metas = (
        batch["metadata"].to_pylist() if "metadata" in batch.column_names else [None] * len(ids)
    )
    urls, htmls, texts, metas_json = [], [], [], []
    for i, t, c, m in zip(ids, titles, contents, metas):
        t = t or ""
        c = c or ""
        urls.append(f"doc://{i}")
        body = "".join(f"<p>{_html.escape(line)}</p>" for line in c.split("\n") if line)
        htmls.append(
            f"<html><head><title>{_html.escape(t)}</title></head>"
            f"<body>{body}</body></html>".encode()
        )
        texts.append(f"{t}\n{c}".strip())
        metas_json.append(json.dumps(m, ensure_ascii=False, sort_keys=True) if m else "{}")
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array([0] * len(urls), pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array([""] * len(urls), pa.string()),
            "metadata": pa.array(metas_json, pa.string()),
        }
    )


def read_documents_jsonl(path: str) -> ray.data.Dataset:
    """JSONL files of {id, title, content, metadata} -> pages-shaped Dataset."""
    ds = ray.data.read_json(path)
    return ds.map_batches(_normalize_batch, batch_format="pyarrow")


def from_document_list(docs: list[dict]) -> ray.data.Dataset:
    """Tiny in-memory batches (the reference's single/batch POST bodies)."""
    for d in docs:
        if not d.get("id"):
            raise ValueError("Document must have an 'id' field")  # documents.py:162-163
    ds = ray.data.from_items(docs)
    return ds.map_batches(_normalize_batch, batch_format="pyarrow")
