"""WAT companion archives — the metadata third of the Common Crawl
WARC / WAT / WET triple (this repo already ships the other two plus CDX,
ZipNum and revisit records; `sources/warc.py`).

A WAT file is itself a WARC file whose records are `WARC-Type: metadata`
with an `application/json` payload describing the corresponding response
record: WARC envelope headers plus extracted HTML metadata (title and the
outgoing links with their anchor text). Link analysis pipelines consume
WAT instead of re-parsing multi-TB HTML — the extraction cost is paid
once, at archive time.

Scale shape: WAT generation is one map task per WARC file (the same
fan-out as the CDX builder): stream the gzip members, parse each response
record once with the SAME kernels the index build uses
(`kernel/links.extract_links`, `kernel/extract.html_title` — one rule set
corpus-wide), and write the sibling `.wat.gz` member-per-record,
content-named and atomic (the resume contract of every sink here: a
re-run re-produces the same bytes). Readers stream records exactly like
`read_warc_pages` — the tolerant parser, dead letters included.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa

import ray
import ray.data

from ..functions.hashing import fnv1a64
from ..kernel.extract import html_title
from ..kernel.links import LINKS_VERSION, extract_links
from .warc import _http_body, iter_warc_gzip_members, iter_warc_stream

WAT_SOFTWARE = f"meilisearch_thai_ray-wat/links-v{LINKS_VERSION}"


def _wat_json(url: str, ts: str, html: bytes) -> bytes:
    """Deterministic JSON payload for one response record (Common Crawl's
    Envelope/Payload-Metadata/HTML-Metadata layout, the fields link
    pipelines actually read: Head.Title + Links[{path,url,text}])."""
    links = extract_links(html, url)
    doc = {
        "Envelope": {
            "WARC-Header-Metadata": {
                "WARC-Target-URI": url,
                "WARC-Date": ts,
                "WARC-Type": "response",
            },
            "Payload-Metadata": {
                "Actual-Content-Type": "application/http; msgtype=response",
                "HTTP-Response-Metadata": {
                    "HTML-Metadata": {
                        "Head": {"Title": html_title(html)},
                        "Links": [
                            {"path": "A@/href", "url": u, "text": t}
                            for u, t in links
                        ],
                    },
                    "Entity-Length": len(html),
                },
            },
        }
    }
    return json.dumps(doc, sort_keys=True,
                      separators=(",", ":")).encode("utf-8")


def _wat_record(url: str, ts: str, payload: bytes) -> bytes:
    head = ("WARC/1.0\r\n"
            "WARC-Type: metadata\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {ts}\r\n"
            f"WARC-Record-ID: <urn:fnv1a64:{fnv1a64(url + '#wat'):016x}>\r\n"
            f"WARC-Refers-To: <urn:fnv1a64:{fnv1a64(url):016x}>\r\n"
            f"WARC-Identified-Payload-Type: application/json\r\n"
            "Content-Type: application/json\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n").encode("utf-8")
    return head + payload + b"\r\n\r\n"


def warc_files_to_wat(batch: pa.Table, out_dir: str) -> pa.Table:
    """map_batches body (batch_size=1 path rows): one WARC archive ->
    its sibling `<name>.wat.gz` (member-per-record). Only response records
    get WAT entries (revisit/metadata records carry no HTML); a malformed
    record is skipped — the WARC-side dead-letter path already reports it.
    Emits one manifest row per file."""
    import gzip
    import io

    os.makedirs(out_dir, exist_ok=True)
    paths_out, n_recs, n_bytes = [], [], []
    for path in batch["path"].to_pylist():
        members = []
        for _off, _clen, rec in iter_warc_gzip_members(path):
            for kind, head, payload in iter_warc_stream(io.BytesIO(rec)):
                if kind != "ok" or head.get("warc-type") != "response":
                    continue
                url = head.get("warc-target-uri", "")
                ts = head.get("warc-date", "")
                wat = _wat_record(url, ts, _wat_json(url, ts,
                                                     _http_body(payload)))
                members.append(gzip.compress(wat, mtime=0))
        base = os.path.basename(path)
        for suf in (".warc.gz", ".warc"):
            if base.endswith(suf):
                base = base[: -len(suf)]
                break
        out = os.path.join(out_dir, base + ".wat.gz")
        tmp = out + ".tmp"
        with open(tmp, "wb") as f:
            for m in members:
                f.write(m)
        os.replace(tmp, out)
        paths_out.append(out)
        n_recs.append(len(members))
        n_bytes.append(os.path.getsize(out))
    return pa.table({"path": pa.array(paths_out, pa.string()),
                     "n_records": pa.array(n_recs, pa.int64()),
                     "n_bytes": pa.array(n_bytes, pa.int64())})


def build_wat(warc_dir: str, out_dir: str) -> list[dict]:
    """Directory of WARC archives -> directory of sibling WAT archives,
    one streaming task per file. Returns manifest rows (O(files))."""
    files = sorted(
        os.path.join(root, f)
        for root, _, names in os.walk(warc_dir)
        for f in names if f.endswith((".warc.gz", ".warc")))
    man = ray.data.from_items([{"path": p} for p in files]).map_batches(
        warc_files_to_wat, batch_format="pyarrow", batch_size=1,
        fn_kwargs={"out_dir": out_dir})
    return man.take_all()


def _wat_rows(batch: pa.Table) -> pa.Table:
    """map_batches body: WAT file paths -> one row per metadata record
    (url, title, links, anchors) — the pre-extracted view a link pipeline
    consumes instead of HTML."""
    urls, titles, links, anchors = [], [], [], []
    for path in batch["path"].to_pylist():
        for _off, _clen, rec in iter_warc_gzip_members(path):
            import io

            for kind, head, payload in iter_warc_stream(io.BytesIO(rec)):
                if kind != "ok" or head.get("warc-type") != "metadata":
                    continue
                doc = json.loads(payload)
                env = doc["Envelope"]
                hm = (env["Payload-Metadata"]["HTTP-Response-Metadata"]
                      ["HTML-Metadata"])
                urls.append(env["WARC-Header-Metadata"]["WARC-Target-URI"])
                titles.append(hm["Head"]["Title"])
                links.append([x["url"] for x in hm["Links"]])
                anchors.append([x["text"] for x in hm["Links"]])
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "title": pa.array(titles, pa.string()),
        "links": pa.array(links, pa.list_(pa.string())),
        "anchors": pa.array(anchors, pa.list_(pa.string())),
    })


def read_wat_pages(path: str) -> "ray.data.Dataset":
    """WAT file(s)/directory -> Dataset of (url, title, links, anchors),
    one streaming parse task per file."""
    if os.path.isdir(path):
        files = sorted(
            os.path.join(root, f)
            for root, _, names in os.walk(path)
            for f in names if f.endswith((".wat.gz", ".wat")))
    else:
        files = [path]
    return ray.data.from_items([{"path": p} for p in files]).map_batches(
        _wat_rows, batch_format="pyarrow", batch_size=1)
