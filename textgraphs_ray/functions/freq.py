"""Misra–Gries heavy-hitters sketch as a Ray Data aggregate.

Global top-k-by-frequency over 10^12 rows cannot afford the exact
plan's full groupby shuffle of every distinct value.  A Misra–Gries
summary holds at most ``capacity`` counters, folds a block in one
vectorized ``np.unique`` pass, and merges by counter addition followed
by the standard trim (subtract the (capacity+1)-th largest count,
drop non-positive) — the classic mergeable-summaries result (Agarwal
et al., PODS 2012): after any merge tree the summary still satisfies

    true_count - N/(capacity+1)  <=  est  <=  true_count

so every item with frequency > N/(capacity+1) is guaranteed present,
and when ``capacity >= ndv`` the counts are EXACT (no trim ever fires)
— which is how the driver oracle checks it (``heavy_hitters`` query:
capacity over the column's distinct count ⇒ SQL-identical counts,
value-hash-compared; the lossy regime is pytest-asserted against the
error bound instead).

The reference engine has no counterpart (single-process, it can always
count exactly); this belongs to the engine's large-scale operator
family next to ``functions/hll.py`` and ``functions/histq.py``.
"""

from __future__ import annotations

import numpy as np

from ray.data.aggregate import AggregateFn


def _trim(acc: dict, capacity: int) -> dict:
    """Misra–Gries trim: keep at most ``capacity`` counters by
    subtracting the (capacity+1)-th largest count from all."""
    if len(acc) <= capacity:
        return acc
    counts = np.sort(np.fromiter(acc.values(), dtype=np.int64))
    cut = int(counts[-(capacity + 1)])
    return {v: c - cut for v, c in acc.items() if c > cut}


def mg_fold(acc: dict, values: np.ndarray, capacity: int) -> dict:
    """Fold a batch of values into a Misra–Gries summary dict."""
    if len(values) == 0:
        return acc
    uniq, cnt = np.unique(np.asarray(values, dtype=object), return_counts=True)
    for v, c in zip(uniq.tolist(), cnt.tolist()):
        acc[v] = acc.get(v, 0) + c
    return _trim(acc, capacity)


def mg_merge(a: dict, b: dict, capacity: int) -> dict:
    """Merge two summaries: counter addition + one trim."""
    out = dict(a)
    for v, c in b.items():
        out[v] = out.get(v, 0) + c
    return _trim(out, capacity)


def mg_agg(col: str, *, capacity: int,
           alias_name: str | None = None) -> AggregateFn:
    """→ AggregateFn building a Misra–Gries summary of ``col``.

    Finalizes to a list of ``(item, est_count)`` tuples sorted by
    (count desc, item asc) — a deterministic order so downstream top-k
    selection is reproducible across runs and cluster layouts.

    The in-flight accumulator is PICKLED BYTES, not the dict itself:
    grouped aggregation stores per-group accumulators inside Arrow
    blocks between the map and reduce phases, and Arrow rewrites a
    dict into a struct over the UNION of keys seen across groups —
    missing keys come back as None and corrupt the merge.  Bytes
    round-trip untouched (same reason uint64 hashes ride aggregates
    as int64 bit-views, CLAUDE.md)."""
    if capacity < 1:
        raise ValueError("capacity must be >= 1")
    import pickle

    def accumulate_block(acc: bytes, block) -> bytes:
        import pyarrow as pa

        if isinstance(block, pa.Table):
            vals = block.column(col).to_numpy(zero_copy_only=False)
        else:
            vals = block[col].to_numpy()
        return pickle.dumps(mg_fold(pickle.loads(acc), vals, capacity))

    return AggregateFn(
        init=lambda _k: pickle.dumps({}),
        merge=lambda a, b: pickle.dumps(
            mg_merge(pickle.loads(a), pickle.loads(b), capacity)),
        accumulate_block=accumulate_block,
        finalize=lambda acc: sorted(pickle.loads(acc).items(),
                                    key=lambda kv: (-kv[1], str(kv[0]))),
        name=alias_name or f"heavy_hitters({col})",
    )


def top_k(summary: list, k: int) -> list:
    """First ``k`` entries of a finalized summary (already sorted by
    count desc, item asc)."""
    return list(summary[:k])
