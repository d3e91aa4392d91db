"""Bloom filter as a Ray Data aggregate, for membership pre-filters.

At 100 TB the canonical "drop rows whose key appears in that other
table" (decontamination, revisit-skip, anti-join) cannot broadcast the
raw key set: 10^10 distinct 64-bit keys is 80 GB.  A Bloom filter is a
CONSTANT ``m/8`` bytes regardless of key count (m = bits, sized ~10
bits/key for <1% false positives), builds in one streaming pass (the
per-block partial is a bitmap, merged with bitwise OR — a textbook
mergeable sketch), and ships to every worker once via ``ray.put``.

False positives never change answers here: :func:`~textgraphs_ray.
stages.join.bloom_anti_join` uses the filter only to split the probe
side into *definitely-unmatched* rows (emitted immediately, no
shuffle) and a small candidate remainder that is verified with an
exact join — output semantics are exactly ANTI JOIN, the Bloom only
bounds how many rows pay the shuffle.

Hashing is Kirsch–Mitzenmacher double hashing (two fixed-key siphashes
combined as ``h1 + i*h2 mod m``), fully vectorized; deterministic
across runs and cluster layouts.  The reference engine has no
counterpart (single process, no shuffles to avoid); this belongs to
the engine's large-scale operator family next to ``functions/hll.py``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ray.data.aggregate import AggregateFn

# independent fixed 16-byte siphash keys for the two base hashes
_KEY1 = "textgraphs-ray-b"
_KEY2 = "bloom-hash-two-k"


def _positions(values: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(k, n) bit positions for a value batch (double hashing)."""
    obj = np.asarray(values, dtype=object)
    h1 = pd.util.hash_array(obj, hash_key=_KEY1)
    h2 = pd.util.hash_array(obj, hash_key=_KEY2) | np.uint64(1)  # odd
    i = np.arange(k, dtype=np.uint64)[:, None]
    return ((h1[None, :] + i * h2[None, :]) % np.uint64(m_bits))


def bloom_insert(bitmap: np.ndarray, values: np.ndarray, k: int) -> np.ndarray:
    """Fold a batch of values into a packed uint8 bitmap in place."""
    if len(values) == 0:
        return bitmap
    pos = _positions(values, len(bitmap) * 8, k)
    np.bitwise_or.at(bitmap, (pos >> np.uint64(3)).astype(np.int64),
                     np.left_shift(np.uint8(1),
                                   (pos & np.uint64(7)).astype(np.uint8)))
    return bitmap


def bloom_contains(bitmap: np.ndarray, values: np.ndarray,
                   k: int) -> np.ndarray:
    """Vectorized membership test → bool array (no false negatives)."""
    if len(values) == 0:
        return np.zeros(0, dtype=bool)
    pos = _positions(values, len(bitmap) * 8, k)
    bits = (bitmap[(pos >> np.uint64(3)).astype(np.int64)]
            >> (pos & np.uint64(7)).astype(np.uint8)) & np.uint8(1)
    return bits.all(axis=0)


def bloom_params(expected_n: int, fp_rate: float = 0.01) -> tuple[int, int]:
    """(m_bits, k) sized for ``expected_n`` keys at ``fp_rate``.

    Standard optima: m = -n ln p / (ln 2)^2, k = (m/n) ln 2; m is
    rounded up to a whole byte and floored at 64 bits so degenerate
    inputs still build a valid filter.
    """
    n = max(1, int(expected_n))
    m = int(np.ceil(-n * np.log(fp_rate) / (np.log(2) ** 2)))
    m = max(64, (m + 7) // 8 * 8)
    k = max(1, int(round(m / n * np.log(2))))
    return m, k


def bloom_agg(col: str, *, m_bits: int, k: int,
              alias_name: str | None = None) -> AggregateFn:
    """→ AggregateFn building a packed Bloom bitmap over ``col``.

    Usable in ``ds.aggregate(...)`` (one global filter) — accumulation
    is one vectorized pass per block, merge is ``np.bitwise_or``,
    finalize returns the ``m_bits/8``-byte uint8 bitmap.
    """
    if m_bits % 8:
        raise ValueError("m_bits must be a multiple of 8")

    def accumulate_block(bitmap: np.ndarray, block) -> np.ndarray:
        import pyarrow as pa

        if isinstance(block, pa.Table):
            vals = block.column(col).to_numpy(zero_copy_only=False)
        else:
            vals = block[col].to_numpy()
        return bloom_insert(bitmap, vals, k)

    return AggregateFn(
        init=lambda _k: np.zeros(m_bits // 8, dtype=np.uint8),
        merge=np.bitwise_or,
        accumulate_block=accumulate_block,
        finalize=lambda bm: bm,
        name=alias_name or f"bloom({col})",
    )
