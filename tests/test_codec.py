"""Posting codec roundtrip vectors (FIXTURES.md §5: sizes 0/1/127/128/129/10k)."""

import numpy as np
import pytest

from meilisearch_thai_ray.index.codec import (
    decode_segment,
    encode_segment,
    varint_decode,
    varint_encode,
)


@pytest.mark.parametrize("n", [0, 1, 127, 128, 129, 10_000])
def test_varint_roundtrip(n):
    rng = np.random.default_rng(1234 + n)
    vals = rng.integers(0, 1 << 62, size=n, dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(vals), n), vals)


def test_varint_extremes():
    vals = np.array([0, 1, 127, 128, (1 << 64) - 1], dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(vals), 5), vals)


@pytest.mark.parametrize("n", [0, 1, 127, 128, 129, 10_000])
def test_segment_roundtrip(n):
    rng = np.random.default_rng(42 + n)
    ids = (
        np.sort(rng.choice(np.arange(1, 20 * n + 2, dtype=np.uint64), n, replace=False))
        if n
        else np.empty(0, np.uint64)
    )
    tfs = rng.integers(1, 100, size=n, dtype=np.uint64)
    dls = rng.integers(1, 1000, size=n, dtype=np.uint64)
    seg = encode_segment(ids, tfs, dls, avgdl=55.5)
    d_ids, d_tfs, d_dls = decode_segment(
        seg["docs_bin"], seg["tfs_bin"], seg["dls_bin"], seg["n_docs"]
    )
    assert np.array_equal(ids, d_ids)
    assert np.array_equal(tfs, d_tfs)
    assert np.array_equal(dls, d_dls)
    assert len(seg["block_last"]) == (n + 127) // 128
    if n:
        assert seg["block_last"][-1] == ids[-1]
        assert seg["cf"] == int(tfs.sum())


def test_block_max_is_upper_bound():
    rng = np.random.default_rng(9)
    n = 1000
    ids = np.arange(1, n + 1, dtype=np.uint64) * 7
    tfs = rng.integers(1, 30, size=n, dtype=np.uint64)
    dls = rng.integers(5, 400, size=n, dtype=np.uint64)
    seg = encode_segment(ids, tfs, dls, avgdl=100.0)
    from meilisearch_thai_ray.index.codec import tfn_scores

    tfn = tfn_scores(tfs, dls, 100.0)
    for i, bm in enumerate(seg["block_max"]):
        lo, hi = i * 128, min((i + 1) * 128, n)
        assert bm >= tfn[lo:hi].max() - 0.0  # float64 exact max, no rounding down
        assert bm == tfn[lo:hi].max()

def test_positions_codec_roundtrip():
    import numpy as np

    from meilisearch_thai_ray.index.codec import (
        decode_positions,
        encode_positions,
    )

    rng = np.random.default_rng(9)
    pos_lists = [
        sorted(rng.choice(5000, size=int(rng.integers(1, 30)),
                          replace=False).tolist())
        for _ in range(300)
    ]
    tfs = np.array([len(p) for p in pos_lists], dtype=np.uint64)
    flat, offs = decode_positions(encode_positions(pos_lists, tfs), tfs)
    for i, p in enumerate(pos_lists):
        assert flat[offs[i]:offs[i] + len(p)].tolist() == p
    # empties
    assert encode_positions([], np.array([], dtype=np.uint64)) == b""
