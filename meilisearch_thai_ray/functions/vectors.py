"""Shared kernels for fixed-width list (embedding) columns."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def list_matrix(col, dtype=np.float64) -> np.ndarray:
    """Arrow list<float-like> column (Array or ChunkedArray) -> (n, d)
    numpy matrix; (0, 0) on empty input. Lists must be fixed-width (an
    embedding column) — ragged input reshapes wrong, so callers own that
    contract."""
    col = col.combine_chunks()
    if isinstance(col, pa.ChunkedArray):
        if col.num_chunks == 0:
            return np.empty((0, 0), dtype=dtype)
        col = col.chunk(0)
    if len(col) == 0:
        return np.empty((0, 0), dtype=dtype)
    flat = col.values.to_numpy(zero_copy_only=False).astype(dtype)
    offs = col.offsets.to_numpy(zero_copy_only=False)
    dim = int(offs[1] - offs[0])
    return flat.reshape(-1, dim)
