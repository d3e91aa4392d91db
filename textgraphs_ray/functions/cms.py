"""Count-min sketch: constant-size mergeable point-frequency state.

Completes the sketch family (``hll`` distinct counts, ``bottomk``
samples, ``histq`` quantiles, ``freq`` heavy hitters, ``bloom``
membership) with the classic Cormode–Muthukrishnan point-frequency
estimator: a (depth × width) int64 count matrix, one increment per
depth row per occurrence, estimate = min over depth rows.  Guarantees
``true ≤ est ≤ true + 2eN`` with probability ``1 − (1/2)^depth`` at
``width = 2/e`` — and the state is a few KB no matter how many
distinct items flow through, where Misra–Gries must spend a counter
per tracked item.

Hashing is ``pd.util.hash_array`` (SipHash) with a per-depth 16-byte
key — deterministic across processes, workers and cluster sizes, and
vectorized over the whole block (no per-row Python).  The accumulator
rides Ray's aggregate machinery as raw bytes (the Arrow-safety rule
every sketch here follows — see ``functions/freq.py``).

Unlike ``histq``/``freq`` there is no structural exact-mode contract
(collisions depend on the hash, not on a capacity≥ndv bound), so the
CMS is pytest-verified (lower bound, error bound, merge/layout
invariance) and its query entry is rows-only by design.
"""

from __future__ import annotations

import numpy as np

from ray.data.aggregate import AggregateFn


def _keys(depth: int) -> list[str]:
    return [f"cms-depth-{i:04d}--"[:16] for i in range(depth)]


def _bucket(values, key: str, width: int) -> np.ndarray:
    import pandas as pd

    h = pd.util.hash_array(np.asarray(values, dtype=object),
                           hash_key=key)
    return (h % np.uint64(width)).astype(np.int64)


def cms_fold(state: np.ndarray, values, *, width: int) -> np.ndarray:
    for i, key in enumerate(_keys(state.shape[0])):
        np.add.at(state[i], _bucket(values, key, width), 1)
    return state


def cms_agg(col: str, *, width: int = 2048, depth: int = 4,
            alias_name: str | None = None) -> AggregateFn:
    """→ AggregateFn: count-min sketch of ``col``.  Finalizes to the
    raw sketch bytes; read estimates with :func:`cms_estimate`."""
    if width < 1 or depth < 1:
        raise ValueError("width and depth must be >= 1")

    def accumulate_block(acc: bytes, block) -> bytes:
        import pyarrow as pa

        if isinstance(block, pa.Table):
            vals = block.column(col).to_numpy(zero_copy_only=False)
        else:
            vals = block[col].to_numpy()
        state = np.frombuffer(acc, np.int64).reshape(depth,
                                                     width).copy()
        return cms_fold(state, vals, width=width).tobytes()

    return AggregateFn(
        init=lambda _k: np.zeros((depth, width), np.int64).tobytes(),
        merge=lambda a, b: (np.frombuffer(a, np.int64)
                            + np.frombuffer(b, np.int64)).tobytes(),
        accumulate_block=accumulate_block,
        finalize=lambda acc: acc,
        name=alias_name or f"cms({col})",
    )


def cms_estimate(sketch: bytes, items, *, width: int = 2048,
                 depth: int = 4) -> np.ndarray:
    """Point-frequency estimates for ``items`` from a finalized
    sketch: min over depth rows (vectorized)."""
    state = np.frombuffer(sketch, np.int64).reshape(depth, width)
    ests = np.stack([state[i][_bucket(items, key, width)]
                     for i, key in enumerate(_keys(depth))])
    return ests.min(axis=0)
