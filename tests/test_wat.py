"""WAT companion archives: build from WARC, JSON payload shape, read-back
parity with direct kernel extraction, revisit/malformed handling."""

import gzip
import io
import json
import os

import pyarrow as pa
import pytest

import ray.data

from meilisearch_thai_ray.kernel.extract import html_title
from meilisearch_thai_ray.kernel.links import extract_links
from meilisearch_thai_ray.sources.warc import (
    iter_warc_gzip_members,
    iter_warc_stream,
    write_warc_pages,
)
from meilisearch_thai_ray.sources.wat import build_wat, read_wat_pages

PAGES = [
    ("https://a.ex/p/1",
     b"<html><head><title>Alpha &amp; Beta</title>"
     b"<base href='https://cdn.ex/x/'></head><body>"
     b"<a href='rel1'>one</a> <a href='https://b.ex/abs#frag'>two</a>"
     b"<a href='mailto:x@y.z'>mail</a><a name='top'>no href</a>"
     b"<!-- <a href='https://spam.ex/'>spam</a> --></body></html>"),
    ("https://a.ex/p/2", b"<html><body>no title, no links</body></html>"),
    ("https://a.ex/p/3",
     "<html><head><title>ไทย</title></head><body>"
     "<a href='//c.ex/pp'>ลิงก์</a></body></html>".encode()),
]


@pytest.fixture(scope="module")
def wat_dir(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("wat")
    warc_dir = str(root / "warc")
    ds = ray.data.from_arrow(pa.table({
        "url": pa.array([u for u, _ in PAGES], pa.string()),
        "html": pa.array([h for _, h in PAGES], pa.binary()),
    }))
    write_warc_pages(ds, warc_dir)
    out = str(root / "wat")
    man = build_wat(warc_dir, out)
    assert sum(r["n_records"] for r in man) == len(PAGES)
    return out


def test_wat_rows_match_direct_kernel_extraction(wat_dir, ray_session):
    rows = {r["url"]: r for r in read_wat_pages(wat_dir).take_all()}
    assert set(rows) == {u for u, _ in PAGES}
    for url, html in PAGES:
        r = rows[url]
        assert r["title"] == html_title(html)
        want = extract_links(html, url)
        assert r["links"] == [u for u, _ in want]
        assert r["anchors"] == [t for _, t in want]
    # the decoys really are dropped and base-href/fragment rules applied
    p1 = rows["https://a.ex/p/1"]
    assert p1["links"] == ["https://cdn.ex/x/rel1", "https://b.ex/abs"]
    assert rows["https://a.ex/p/2"]["links"] == []
    assert rows["https://a.ex/p/3"]["anchors"] == ["ลิงก์"]


def test_wat_is_valid_warc_with_json_payload(wat_dir):
    f = next(os.path.join(wat_dir, x) for x in sorted(os.listdir(wat_dir))
             if x.endswith(".wat.gz"))
    n = 0
    for _off, _clen, rec in iter_warc_gzip_members(f):
        for kind, head, payload in iter_warc_stream(io.BytesIO(rec)):
            assert kind == "ok"
            assert head["warc-type"] == "metadata"
            assert head["content-type"] == "application/json"
            doc = json.loads(payload)
            env = doc["Envelope"]
            assert env["WARC-Header-Metadata"]["WARC-Target-URI"]
            assert "HTML-Metadata" in (
                env["Payload-Metadata"]["HTTP-Response-Metadata"])
            n += 1
    assert n >= 1


def test_wat_build_is_deterministic_and_skips_non_response(
        wat_dir, tmp_path, ray_session):
    # re-running the build reproduces byte-identical archives (the resume
    # contract every sink here keeps)
    before = {f: open(os.path.join(wat_dir, f), "rb").read()
              for f in os.listdir(wat_dir)}
    src = wat_dir.replace("/wat", "/warc")
    build_wat(src, wat_dir)
    after = {f: open(os.path.join(wat_dir, f), "rb").read()
             for f in os.listdir(wat_dir)}
    assert before == after

    # a WARC containing a non-response record yields no WAT entry for it
    rec = ("WARC/1.0\r\nWARC-Type: metadata\r\n"
           "WARC-Target-URI: https://m.ex/\r\n"
           "Content-Length: 2\r\n\r\nhi\r\n\r\n").encode()
    p = tmp_path / "meta.warc.gz"
    p.write_bytes(gzip.compress(rec, mtime=0))
    man = build_wat(str(tmp_path), str(tmp_path / "w"))
    assert sum(r["n_records"] for r in man) == 0
