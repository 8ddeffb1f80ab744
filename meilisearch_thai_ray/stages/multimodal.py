"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video travel as `binary` columns with metadata columns alongside.
The decode kernels themselves are STUBBED (no image/audio libs in this
container — clearly marked below); everything Ray-side is real and tested:
schema, actor-pool signature, batch sizing for fat binary rows, output layout.

At scale: binary payload batches must be SMALL (payload_bytes * batch_size *
concurrency must fit the worker heap) — callers pass batch_size explicitly;
blocks stay within target_max_block_size because the stage never concatenates
payloads.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def attach_payload(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Deterministic stand-in producer: utf-8 bytes of the text column as the
    binary payload (real pipelines read payloads with read_binary_files)."""
    payload = batch[text_col].cast(pa.binary())
    return batch.append_column("payload", payload)


def payload_features(batch: pa.Table) -> pa.Table:
    """Cheap metadata extraction over binary payloads (vectorized, real)."""
    if "payload" not in batch.column_names:
        batch = attach_payload(batch)
    n_bytes = pc.binary_length(batch["payload"]).cast(pa.int64())
    fake_width = pc.subtract(
        n_bytes, pc.multiply(pc.divide(n_bytes, 256), 256)
    )  # n_bytes % 256 via integer ops (pc has no modulo kernel)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_bytes": n_bytes,
            "fake_width": fake_width.cast(pa.int64()),
        }
    )


def _fake_pixels(payload: bytes, h: int, w: int) -> np.ndarray:
    """Deterministic stand-in decode: tile the payload bytes into a REAL
    (h, w, 3) uint8 pixel array. Everything downstream of this line is the
    genuine numeric pipeline a real decoder would feed."""
    if not payload:
        return np.zeros((h, w, 3), dtype=np.uint8)
    buf = np.frombuffer(payload, dtype=np.uint8)
    reps = -(-h * w * 3 // buf.size)
    return np.tile(buf, reps)[: h * w * 3].reshape(h, w, 3)


def mean_pool_resize(img: np.ndarray, t: int) -> np.ndarray:
    """Real resize kernel: mean-pooling to (t, t, 3) via pad-to-multiple +
    two reshaped means (all strided numpy, no Python pixel loops)."""
    h, w, c = img.shape
    ph, pw = -(-h // t) * t, -(-w // t) * t
    pad = np.zeros((ph, pw, c), dtype=np.float64)
    pad[:h, :w] = img
    # average the zero padding out: scale each edge cell by the true
    # fraction of real pixels it covers
    pooled = pad.reshape(t, ph // t, t, pw // t, c).mean(axis=(1, 3))
    frac_h = np.minimum((np.arange(t) + 1) * (ph // t), h) - \
        np.minimum(np.arange(t) * (ph // t), h)
    frac_w = np.minimum((np.arange(t) + 1) * (pw // t), w) - \
        np.minimum(np.arange(t) * (pw // t), w)
    denom = (frac_h[:, None] * frac_w[None, :]).astype(np.float64)
    denom[denom == 0] = 1.0
    return pooled * ((ph // t) * (pw // t)) / denom[:, :, None]


class ImageFeatures:
    """Actor-pool feature extraction: REAL numeric kernels over the
    deterministic fake decode (swap `_fake_pixels` for a codec in
    production — the `real_codec` flag marks the boundary). Emits per-image
    channel means and a t*t gray mean-pool embedding (list<float64>) that
    feeds the ANN stages directly (chain asserted in tests)."""

    def __init__(self, embed_t: int = 4, real_codec: bool = False):
        if real_codec:
            raise NotImplementedError(
                "image codecs are not available in this container")
        self.t = embed_t

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, means, embeds = [], [], []
        payloads = batch["payload"].to_pylist()
        for i, p in enumerate(payloads):
            h = (len(p) % 480) + 1
            w = (p[0] if p else 0) + 1
            img = _fake_pixels(p, h, w)
            small = mean_pool_resize(img, self.t)
            gray = small.mean(axis=2) / 255.0
            ids.append(batch["doc_id"][i].as_py())
            means.append(img.reshape(-1, 3).mean(axis=0))
            embeds.append(gray.ravel())
        means = np.asarray(means, dtype=np.float64).reshape(len(ids), 3)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "mean_r": pa.array(np.round(means[:, 0], 6)),
            "mean_g": pa.array(np.round(means[:, 1], 6)),
            "mean_b": pa.array(np.round(means[:, 2], 6)),
            "embedding": pa.array([e.tolist() for e in embeds],
                                  pa.list_(pa.float64())),
        })


class FrameSampler:
    """Video frame sampling (flat-map shape: one OUTPUT row per sampled
    frame). The stub treats the payload as fixed-size frame records; a real
    pipeline swaps the byte slicing for a demuxer. Sampling every `stride`
    frames bounds downstream decode cost — the standard pattern for video
    at scale."""

    def __init__(self, frame_bytes: int = 256, stride: int = 4):
        self.frame_bytes = frame_bytes
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, offs = [], [], []
        for i, p in enumerate(batch["payload"].to_pylist()):
            n_frames = max(1, len(p) // self.frame_bytes)
            for f in range(0, n_frames, self.stride):
                ids.append(batch["doc_id"][i].as_py())
                frames.append(f)
                offs.append(f * self.frame_bytes)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "frame": pa.array(frames, pa.int64()),
            "byte_offset": pa.array(offs, pa.int64()),
        })


class ImageDecodeStub:
    """Actor-pool decode stage: REAL plumbing, STUB kernel.

    In production `__init__` loads the codec/model once per actor and
    `_decode` returns (h, w, c) pixel arrays. Here `_decode` derives a
    deterministic fake shape from the payload bytes so the distributed
    plumbing (schema, batching, actor reuse) is testable without codecs.
    """

    def __init__(self, target_size: int = 64, real_codec: bool = False):
        self.target_size = target_size
        if real_codec:
            # no PIL/cv2/ffmpeg in this environment (SURVEY environment notes)
            raise NotImplementedError("image codecs are not available in this container")

    def _decode(self, payload: bytes) -> tuple[int, int, int]:
        h = (len(payload) % 480) + 1
        w = (payload[0] if payload else 0) + 1
        return h, w, 3

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        shapes = np.array([self._decode(p) for p in payloads], dtype=np.int64).reshape(
            len(payloads), 3
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "height": pa.array(shapes[:, 0]),
                "width": pa.array(shapes[:, 1]),
                "channels": pa.array(shapes[:, 2]),
                "resized_to": pa.array(
                    np.full(len(payloads), self.target_size, dtype=np.int64)
                ),
            }
        )


# ------------------------------------------------------------------ audio


def _fake_pcm(payload: bytes) -> np.ndarray:
    """Deterministic stand-in decode: payload bytes as centered int8 PCM in
    [-1, 1). A real pipeline swaps this one line for an audio demuxer;
    every kernel downstream (RMS, ZCR, FFT) is genuine DSP."""
    if not payload:
        return np.zeros(1, dtype=np.float64)
    return (np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
            - 128.0) / 128.0


class AudioFeatures:
    """Actor-pool audio feature extraction: REAL numpy DSP over the
    deterministic fake decode (`real_codec` marks the swap boundary, as in
    ImageFeatures). Per clip: RMS energy, zero-crossing rate, spectral
    centroid (rfft-magnitude weighted mean bin), and a `bins`-band
    log-magnitude spectrum embedding (list<float64>) that feeds the ANN
    stages exactly like the image embedding does."""

    def __init__(self, bins: int = 8, real_codec: bool = False):
        if real_codec:
            raise NotImplementedError(
                "audio codecs are not available in this container")
        self.bins = bins

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, rms, zcr, cent, embeds = [], [], [], [], []
        for i, p in enumerate(batch["payload"].to_pylist()):
            x = _fake_pcm(p)
            ids.append(batch["doc_id"][i].as_py())
            rms.append(float(np.sqrt(np.mean(x * x))))
            zcr.append(float(np.mean(np.signbit(x[1:]) !=
                                     np.signbit(x[:-1]))) if x.size > 1
                       else 0.0)
            mag = np.abs(np.fft.rfft(x))
            tot = mag.sum()
            cent.append(float((mag * np.arange(mag.size)).sum() / tot)
                        if tot > 0 else 0.0)
            # pool |rfft| into `bins` log-magnitude bands (pad to multiple)
            k = -(-mag.size // self.bins)
            pad = np.zeros(k * self.bins)
            pad[:mag.size] = mag
            band = np.log1p(pad.reshape(self.bins, k).mean(axis=1))
            embeds.append(band)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "rms": pa.array(np.round(rms, 6), pa.float64()),
            "zero_cross_rate": pa.array(np.round(zcr, 6), pa.float64()),
            "spectral_centroid": pa.array(np.round(cent, 6), pa.float64()),
            "embedding": pa.array([e.tolist() for e in embeds],
                                  pa.list_(pa.float64())),
        })


class AudioChunker:
    """Fixed-duration chunking (flat-map shape: one OUTPUT row per chunk
    with byte offsets) — the audio analog of FrameSampler: bounds
    downstream decode/inference cost per task; a real pipeline swaps byte
    arithmetic for a demuxer's packet index."""

    def __init__(self, chunk_bytes: int = 1024, min_tail: int = 128):
        self.chunk_bytes = chunk_bytes
        self.min_tail = min_tail  # drop trailing fragments shorter than this

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, chunks, offs, lens = [], [], [], []
        for i, p in enumerate(batch["payload"].to_pylist()):
            n = len(p)
            c = 0
            for off in range(0, max(n, 1), self.chunk_bytes):
                ln = min(self.chunk_bytes, n - off)
                if c > 0 and ln < self.min_tail:
                    break
                ids.append(batch["doc_id"][i].as_py())
                chunks.append(c)
                offs.append(off)
                lens.append(max(ln, 0))
                c += 1
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "chunk": pa.array(chunks, pa.int64()),
            "byte_offset": pa.array(offs, pa.int64()),
            "n_bytes": pa.array(lens, pa.int64()),
        })
