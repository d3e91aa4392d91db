"""Fixed-bin histogram quantile sketch: constant-size mergeable state
for global / grouped quantiles.

The exact grouped quantiles (``median_agg``/``p90_agg``) sort each
group inside ``map_groups`` — right when a group fits a worker.  For a
quantile over 10^12 rows (or a group that large) the scale path is a
sketch: accumulate a fixed equi-width histogram (``nbins`` int64
counts — a few KB regardless of input size), merge by vector add, and
read the quantile off the cumulative counts.  Error is bounded by one
bin width of the value range.

Unlike most sketches this one is ORACLE-CHECKABLE: binning is a
deterministic arithmetic map (``floor((v - lo) / (hi - lo) * nbins)``
clamped to [0, nbins-1]) and the estimate returned is the lower edge
of the bin holding rank ``ceil(q · n)`` — a pure function of the bin
counts that SQL reproduces with the same expression (grouped counts +
a running sum), so the driver's value-hash comparison is exact, not
tolerance-based.
"""

from __future__ import annotations

import numpy as np

from ray.data.aggregate import AggregateFn


def hist_quantile_agg(col: str, *, q: float, lo: float, hi: float,
                      nbins: int = 1024,
                      alias_name: str | None = None) -> AggregateFn:
    """→ AggregateFn: histogram-sketch quantile ``q`` of ``col``.

    Values are clamped into ``[lo, hi)``; the estimate is the lower
    edge of the first bin whose cumulative count reaches
    ``ceil(q · n)``.  State is ``nbins`` int64 counts; merge is
    element-wise add, so the result is identical for any block layout
    or cluster size.
    """
    width = (hi - lo) / nbins

    def accumulate_block(state, block):
        import pyarrow as pa

        if isinstance(block, pa.Table):
            vals = block.column(col).to_numpy(zero_copy_only=False)
        else:
            vals = np.asarray(block[col])
        vals = vals[~np.isnan(vals.astype(np.float64))]
        if not len(vals):
            return state
        bins = np.clip(
            np.floor((vals.astype(np.float64) - lo) / (hi - lo) * nbins)
            .astype(np.int64), 0, nbins - 1)
        counts = np.bincount(bins, minlength=nbins)
        return (np.asarray(state, dtype=np.int64) + counts).tolist()

    def finalize(state) -> float:
        counts = np.asarray(state, dtype=np.int64)
        n = int(counts.sum())
        if n == 0:
            return float("nan")
        rank = int(np.ceil(q * n))
        b = int(np.searchsorted(np.cumsum(counts), max(rank, 1)))
        return float(lo + b * width)

    return AggregateFn(
        init=lambda key: [0] * nbins,
        merge=lambda a, b: (np.asarray(a, dtype=np.int64)
                            + np.asarray(b, dtype=np.int64)).tolist(),
        accumulate_block=accumulate_block,
        finalize=finalize,
        name=alias_name or f"histq{q}({col})",
    )
