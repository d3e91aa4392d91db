"""HyperLogLog distinct-count sketch as a Ray Data aggregate.

At 10^12 rows an exact ``count_distinct`` is a full shuffle of every
distinct value; an HLL register array is a CONSTANT 2^p bytes per
group that merges with an elementwise max — the canonical sketch for
cardinality at scale (Flajolet et al. 2007, the HLL paper's standard
bias-corrected estimator with linear-counting small-range correction).

Exposed as :func:`hll_agg`, a ``ray.data.aggregate.AggregateFn`` usable
in both ``ds.aggregate(...)`` and ``ds.groupby(k).aggregate(...)`` —
accumulation is one vectorized pass per block (hash → bucket/rank →
``np.maximum.at``), merge is ``np.maximum``.  Deterministic: hashing is
pandas' fixed-key siphash, so the estimate is reproducible across runs
and cluster layouts.

The reference has no sketches (its engine never leaves one process);
this belongs to the engine's large-scale-pipeline operator family
alongside dedup/similarity (SURVEY.md §2 training-data extensions).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ray.data.aggregate import AggregateFn

_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def _alpha(m: int) -> float:
    return _ALPHA.get(m, 0.7213 / (1 + 1.079 / m))


def _clz64(x: np.ndarray) -> np.ndarray:
    """Vectorized exact count-leading-zeros for uint64 (no float
    round-trip — float64 can't represent all 64-bit values)."""
    x = x.copy()
    n = np.zeros(len(x), dtype=np.int64)
    zero = x == 0
    for s, bound in ((32, 0x00000000FFFFFFFF), (16, 0x0000FFFFFFFFFFFF),
                     (8, 0x00FFFFFFFFFFFFFF), (4, 0x0FFFFFFFFFFFFFFF),
                     (2, 0x3FFFFFFFFFFFFFFF), (1, 0x7FFFFFFFFFFFFFFF)):
        small = x <= np.uint64(bound)
        n[small] += s
        x[small] = (x[small] << np.uint64(s)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    n[zero] = 64
    return n


def update_registers(regs: np.ndarray, values: np.ndarray,
                     p: int) -> np.ndarray:
    """Fold a batch of values into an HLL register array in place."""
    if len(values) == 0:
        return regs
    h = pd.util.hash_array(np.asarray(values, dtype=object))
    bucket = (h >> np.uint64(64 - p)).astype(np.int64)
    w = (h << np.uint64(p)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    rho = np.minimum(_clz64(w) + 1, 64 - p + 1).astype(np.int8)
    np.maximum.at(regs, bucket, rho)
    return regs


def estimate(regs: np.ndarray) -> float:
    """Registers → cardinality estimate (bias-corrected, with the
    standard linear-counting small-range correction)."""
    m = len(regs)
    est = _alpha(m) * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def hll_agg(col: str, *, p: int = 12,
            alias_name: str | None = None) -> AggregateFn:
    """→ AggregateFn computing an approximate distinct count of ``col``.

    ``p``: register-count exponent (2^p registers; relative error
    ≈ 1.04/√(2^p) — p=12 ⇒ 4096 registers ⇒ ~1.6%).
    """
    m = 1 << p

    def accumulate_block(regs: np.ndarray, block) -> np.ndarray:
        import pyarrow as pa

        if isinstance(block, pa.Table):
            vals = block.column(col).to_numpy(zero_copy_only=False)
        else:
            vals = block[col].to_numpy()
        return update_registers(regs, vals, p)

    return AggregateFn(
        init=lambda k: np.zeros(m, dtype=np.int8),
        merge=lambda a, b: np.maximum(a, b),
        accumulate_block=accumulate_block,
        finalize=lambda regs: int(round(estimate(regs))),
        name=alias_name or f"approx_ndv({col})",
    )
