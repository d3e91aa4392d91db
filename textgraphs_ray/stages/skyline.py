"""Distributed skyline (Pareto frontier) — multi-criteria curation.

Picking training documents that are simultaneously long AND clean, or
parts that are cheap AND large, is a dominance query: keep every row
no other row beats-or-ties on ALL objectives while beating it on at
least one.  SQL spells it ``NOT EXISTS`` over a self-join — O(n²) and
an all-to-all at scale.  The distributed plan exploits the skyline's
closure property instead:

1. **Local skyline per block** (``map_batches`` combiner): a block's
   dominated rows can never re-enter the global skyline, so each block
   emits only its own frontier — for low dimensions this is a tiny
   fraction of the block (O(log^{d-1} n) expected for random data).
2. **Merge**: survivors from all blocks (small by construction) are
   coalesced into ONE task (``repartition(1)``) and the same kernel
   runs once more.  No driver materialization; at extreme survivor
   counts insert another halving round (tree reduce) — the kernel is
   associative.

Exact duplicates (equal on every objective) never dominate each other
(the strictness clause fails) and are all kept — matching the SQL
``NOT EXISTS`` semantics bit-for-bit, which the ``skyline`` oracle
query pins.

The 2-objective kernel is fully vectorized (sort + prefix-min); the
general-d kernel is a block-nested loop over the running frontier,
used only when d > 2.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def _skyline_mask_2d(x0: np.ndarray, x1: np.ndarray) -> np.ndarray:
    """Non-dominated mask for two all-minimized objectives.

    Works on DISTINCT (x0, x1) pairs: after sorting by (x0 asc,
    x1 asc), a row is dominated iff the exclusive prefix-min of x1 is
    <= its own x1 (the earlier achiever has smaller-or-equal x1 and,
    being distinct and sorted, strictly smaller x0 or x1).
    """
    n = len(x0)
    if n == 0:
        return np.zeros(0, dtype=bool)
    order = np.lexsort((x1, x0))
    sx1 = x1[order]
    pm = np.concatenate(([np.inf], np.minimum.accumulate(sx1)[:-1]))
    keep_sorted = sx1 < pm
    keep = np.zeros(n, dtype=bool)
    keep[order] = keep_sorted
    return keep


def _skyline_mask_nd(cols: list[np.ndarray]) -> np.ndarray:
    """Non-dominated mask for d > 2 all-minimized objectives on
    DISTINCT rows — block-nested loop over the running frontier
    (each candidate checks the frontier vectorized; the frontier
    stays small for low d)."""
    n = len(cols[0])
    if n == 0:
        return np.zeros(0, dtype=bool)
    # visiting rows in ascending objective-sum order guarantees no
    # later row can dominate an earlier one (sum of a dominator is
    # strictly smaller), so one forward pass suffices
    order = np.argsort(sum(c.astype(np.float64) for c in cols),
                       kind="stable")
    pts = np.stack([c[order] for c in cols], axis=1)
    keep_sorted = np.zeros(n, dtype=bool)
    frontier = np.empty((0, pts.shape[1]))
    for i in range(n):
        p = pts[i]
        if len(frontier):
            le = (frontier <= p).all(axis=1)
            lt = (frontier < p).any(axis=1)
            if (le & lt).any():
                continue
        keep_sorted[i] = True
        frontier = np.vstack([frontier, p[None, :]])
    keep = np.zeros(n, dtype=bool)
    keep[order] = keep_sorted
    return keep


def _frontier(df: pd.DataFrame, min_cols: Sequence[str],
              max_cols: Sequence[str]) -> pd.DataFrame:
    """One local skyline pass: dedup exact objective ties, mask the
    distinct rows, re-expand the kept ties."""
    if not len(df):
        return df
    obj = [df[c].to_numpy(np.float64) for c in min_cols]
    obj += [-df[c].to_numpy(np.float64) for c in max_cols]
    key = pd.MultiIndex.from_arrays(obj)
    codes, uniques = pd.factorize(key)
    first = np.full(len(uniques), -1, dtype=np.int64)
    seen = pd.Series(np.arange(len(df))).groupby(codes).min()
    first[seen.index.to_numpy()] = seen.to_numpy()
    u_cols = [o[first] for o in obj]
    if len(u_cols) == 2:
        keep_u = _skyline_mask_2d(u_cols[0], u_cols[1])
    else:
        keep_u = _skyline_mask_nd(u_cols)
    return df[keep_u[codes]]


def skyline(ds: "ray.data.Dataset", *, min_cols: Sequence[str] = (),
            max_cols: Sequence[str] = (),
            columns: Sequence[str] | None = None) -> "ray.data.Dataset":
    """→ the Pareto-optimal rows of ``ds``: no other row is <= on all
    ``min_cols`` and >= on all ``max_cols`` with strictness somewhere.
    ``columns`` limits the output projection (defaults to all input
    columns).  See module doc for the two-level plan.
    """
    if not min_cols and not max_cols:
        raise ValueError("skyline needs at least one objective column")

    def local(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        out = _frontier(df, min_cols, max_cols)
        return out[list(columns)] if columns is not None else out

    survivors = ds.map_batches(local, batch_format="pyarrow")
    # block frontiers are small; one task merges them exactly
    return survivors.repartition(1).map_batches(
        lambda t: _frontier(t.to_pandas(), min_cols, max_cols),
        batch_format="pyarrow")
