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
