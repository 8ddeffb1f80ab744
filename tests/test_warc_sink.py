"""WARC sink: pages Dataset -> .warc.gz archives, round-trip verified."""

import glob
import os

import pyarrow.dataset as pads
import pytest

from meilisearch_thai_ray.sources.warc import (
    read_warc_pages,
    write_warc_pages,
)


@pytest.fixture(scope="module")
def pages_dir(ray_session, tmp_path_factory):
    from meilisearch_thai_ray.fixtures.pages import write_pages_parquet

    d = str(tmp_path_factory.mktemp("sinkpages") / "pages")
    write_pages_parquet(d, 80, rows_per_file=40)
    return d


def test_warc_round_trip(pages_dir, tmp_path):
    import ray.data

    ds = ray.data.read_parquet(pages_dir, columns=["url", "html", "warc_ts"])
    out = str(tmp_path / "warcs")
    manifest = write_warc_pages(ds, out)
    assert sum(m["n_records"] for m in manifest) == 80
    assert all(os.path.exists(m["path"]) for m in manifest)
    # read back through the STREAMING source and compare (url -> html) maps
    back = read_warc_pages(out).to_pandas()
    orig = pads.dataset(pages_dir).to_table(
        columns=["url", "html"]).to_pandas()
    a = dict(zip(back["url"], back["html"]))
    b = dict(zip(orig["url"], orig["html"]))
    assert a == b  # byte-identical html per url, nothing lost or invented


def test_warc_sink_deterministic_and_atomic(pages_dir, tmp_path):
    import ray.data

    ds = ray.data.read_parquet(pages_dir, columns=["url", "html", "warc_ts"])
    out = str(tmp_path / "w1")
    write_warc_pages(ds, out)
    first = {p: open(p, "rb").read() for p in glob.glob(out + "/*.warc.gz")}
    # a re-run (resume after failure) must overwrite with identical bytes
    write_warc_pages(ds, out)
    second = {p: open(p, "rb").read() for p in glob.glob(out + "/*.warc.gz")}
    assert first == second
    assert not glob.glob(out + "/*.tmp")  # atomic: no partials left behind


def test_warc_date_carries_timestamp(pages_dir, tmp_path):
    import gzip

    import ray.data

    ds = ray.data.read_parquet(pages_dir, columns=["url", "html", "warc_ts"])
    out = str(tmp_path / "w2")
    manifest = write_warc_pages(ds, out)
    # gzip.decompress walks all concatenated members; headers are in member 1
    raw = gzip.decompress(open(manifest[0]["path"], "rb").read())
    head = raw.split(b"\r\n\r\n", 1)[0].decode()
    assert "WARC-Date: " in head
    # fixture warc_ts values are real timestamps, not the epoch default
    date = [ln for ln in head.splitlines()
            if ln.startswith("WARC-Date: ")][0][11:]
    assert date.endswith("Z") and date != "2026-01-01T00:00:00Z"


# ---------------------------------------------------------------- CDX index


def test_surt_kernel():
    from meilisearch_thai_ray.kernel.cdx import surt

    assert surt("https://www.Example.com/A/b?z=1&a=2") == \
        "com,example)/a/b?a=2&z=1"
    assert surt("http://example.com:80/") == "com,example)/"
    assert surt("http://example.com:8080/x") == "com,example:8080)/x"
    assert surt("https://sub.host.co.uk/Path") == "uk,co,host,sub)/path"
    assert surt("https://example.com") == "com,example)/"


def test_cdx_random_access_round_trip(pages_dir, tmp_path):
    """The CDX contract: every (offset, length) fetches exactly its record
    with ONE ranged read, byte-identical payload, correct urlkey order."""
    import ray.data

    from meilisearch_thai_ray.kernel.cdx import cdx_digest, surt
    from meilisearch_thai_ray.sources.warc import (cdx_index_warc_dir,
                                                   read_warc_record_at,
                                                   write_warc_pages)

    ds = ray.data.read_parquet(pages_dir, columns=["url", "html", "warc_ts"])
    out = str(tmp_path / "warcs")
    write_warc_pages(ds, out)

    cdx = cdx_index_warc_dir(out).to_pandas()
    orig = pads.dataset(pages_dir).to_table(
        columns=["url", "html"]).to_pandas()
    by_url = dict(zip(orig["url"], orig["html"]))
    assert len(cdx) == len(by_url)  # one row per record, none lost
    assert list(cdx["urlkey"]) == sorted(cdx["urlkey"])  # CDX order
    assert set(cdx["urlkey"]) == {surt(u) for u in by_url}

    for r in cdx.itertuples():  # EVERY record random-accesses cleanly
        url, body = read_warc_record_at(
            os.path.join(out, r.filename), r.offset, r.length)
        assert url == r.url
        assert body == by_url[r.url]
        assert cdx_digest(body) == r.digest


def test_cdx_demo_pipeline_runs(ray_session):
    from meilisearch_thai_ray.pipelines.crawl_refresh import cdx_index_demo

    t = cdx_index_demo("/root/testdata/sf0.001").to_pandas()
    assert len(t) == 500  # one row per document
    assert list(t.columns) == ["urlkey", "warc_ts", "url", "digest",
                               "offset", "length", "filename"]
    # query params sorted by the SURT transform
    assert t["urlkey"].str.endswith("?a=1&b=2").all()
