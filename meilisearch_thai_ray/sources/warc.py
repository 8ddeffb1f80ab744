"""WARC source: Common-Crawl-shaped web-archive files -> pages Dataset.

Pure-stdlib WARC/1.0 record parsing (headers + Content-Length framing,
gzip members supported), so the engine can ingest the format web corpora
actually ship in without external libs. Output schema matches
sources/pages.read_pages (url, html, lang) and feeds index.build_index
unchanged — asserted end-to-end in tests.

Scale shape: Common Crawl distributes ~64k WARC files per snapshot;
file-level parallelism (one read_binary_files block = one file = one
parse task) is exactly how production CC pipelines fan out. A single
task holds one decompressed file; for pathological single-file archives
a production reader adds a record-offset index and splits by byte range
— documented, not needed for the CC layout.

Reference analog: the reference ingests pre-extracted JSON documents
(document_processor.py); this source sits one step earlier in the same
pipeline, at the crawl-archive boundary.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

_CRLF2 = b"\r\n\r\n"


def iter_warc_records(buf: bytes):
    """Yield (headers: dict[str, str] lower-cased, payload: bytes) for
    every record of a WARC/1.0 byte buffer. Framing per the public spec:
    header block to CRLFCRLF, Content-Length payload bytes, record
    separator CRLFCRLF."""
    i, n = 0, len(buf)
    while i < n:
        while i < n and buf[i:i + 2] == b"\r\n":
            i += 2
        if i >= n:
            return
        end = buf.find(_CRLF2, i)
        if end < 0:
            return
        head = buf[i:end].decode("utf-8", errors="replace")
        lines = head.split("\r\n")
        if not lines or not lines[0].startswith("WARC/"):
            raise ValueError(f"not a WARC record header at offset {i}")
        headers: dict[str, str] = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            headers[k.strip().lower()] = v.strip()
        clen = int(headers.get("content-length", "0"))
        start = end + len(_CRLF2)
        yield headers, buf[start:start + clen]
        i = start + clen


def _http_body(payload: bytes) -> bytes:
    """Response records carry a full HTTP response; the document is the
    entity body after the HTTP header block."""
    if payload.startswith(b"HTTP/"):
        cut = payload.find(_CRLF2)
        if cut >= 0:
            return payload[cut + len(_CRLF2):]
    return payload


def _maybe_gunzip(buf: bytes) -> bytes:
    if buf[:2] == b"\x1f\x8b":
        import gzip

        return gzip.decompress(buf)  # multi-member streams concatenate
    return buf


def warc_to_pages(batch: pa.Table) -> pa.Table:
    """One binary WARC file -> (url, html, lang) page rows: response
    records only, HTTP headers stripped; lang empty (the extract stage's
    language detection owns it)."""
    urls, htmls = [], []
    for buf in batch["bytes"].to_pylist():
        for headers, payload in iter_warc_records(_maybe_gunzip(buf)):
            if headers.get("warc-type") != "response":
                continue
            url = headers.get("warc-target-uri", "")
            urls.append(url)
            htmls.append(_http_body(payload))
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "html": pa.array(htmls, pa.binary()),
        "lang": pa.array([""] * len(urls), pa.string()),
    })


def read_warc_pages(path: str) -> ray.data.Dataset:
    """WARC file(s)/directory -> pages Dataset (url, html, lang), one
    parse task per file — drop-in input for index.build_index."""
    return ray.data.read_binary_files(path).map_batches(
        warc_to_pages, batch_format="pyarrow", batch_size=1)
