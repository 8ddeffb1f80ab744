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
