"""Zero-copy Arrow → numpy ingestion for embedding columns.

Every vector kernel in the engine (knn, PQ, PCA, embedding/semantic
dedup) starts by turning a ``list<float>`` / ``fixed_size_list<float>``
Arrow column into an ``(n, d)`` ndarray.  The naive
``np.asarray(col.to_pylist())`` round-trips every float through a
Python object — at 10^9 vectors that conversion dominates the batch,
dwarfing the matmul it feeds.  The columnar form is
``combine_chunks().flatten().to_numpy()`` + ``reshape``: the values
buffer is handed to numpy directly (zero-copy for float32/float64
without nulls), so ingestion cost is O(1) per batch instead of O(n·d)
object allocations.

Contract: the column holds non-null, equal-length numeric lists (the
engine's embedding schema; enforced by the corpus generators and
parquet readers).  Ragged or null-bearing columns raise — silently
mis-reshaping would corrupt every similarity downstream.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def embeddings_to_ndarray(col, dtype=np.float32) -> np.ndarray:
    """``list<float>`` column (Array or ChunkedArray) → ``(n, d)``
    ndarray, zero-copy from the Arrow values buffer when possible.

    Returns a ``(0, 0)`` array for an empty column.  ``dtype`` converts
    only if the storage type differs (float32 storage + float32 request
    = no copy)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.zeros((0, 0), dtype=dtype)
    if col.null_count:
        raise ValueError("embedding column contains nulls")
    flat = col.flatten()  # honors list offsets; values of all rows
    if len(flat) % n:
        raise ValueError(
            f"ragged embedding column: {len(flat)} values / {n} rows")
    d = len(flat) // n
    # list<float> with equal-length rows can still be stored with
    # non-uniform offsets only if some row differed — the modulo check
    # above catches total-length mismatch; per-row raggedness that
    # happens to sum right is caught here via the offsets buffer.
    if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
        offsets = col.offsets.to_numpy(zero_copy_only=False)
        if not np.all(np.diff(offsets) == d):
            raise ValueError("ragged embedding column (uneven rows)")
    vals = flat.to_numpy(zero_copy_only=False)
    return np.ascontiguousarray(vals.reshape(n, d), dtype=dtype)


def ids_to_ndarray(col) -> np.ndarray:
    """Id column → 1-D ndarray without the ``to_pylist`` hop (numeric
    ids come back zero-copy; strings fall back to an object array)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.to_numpy(zero_copy_only=False)
