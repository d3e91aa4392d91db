"""Sweep-line interval analytics — the distributed PREFIX-SCAN
pattern: a running sum over a time-ordered delta stream, computed
without any global ordered pass.

The classic sweep (max concurrent intervals) needs the running sum of
+1/−1 deltas in time order — inherently sequential if done naively.
The distributed plan is the textbook two-phase scan (Blelloch):

1. deltas bucket by coarse time range (``t // bucket``); within a
   (bounded) bucket group the running sum resolves vectorized;
2. per-bucket TOTALS (one small row per bucket) fold on the driver
   into carry-in offsets — the only sequential work is over the
   bounded bucket census, never the data;
3. a second bucketed pass, carries broadcast, answers global
   questions (the max running value and the first time it occurs)
   inside each bucket independently.

Tie semantics are made deterministic by aggregating deltas PER
DISTINCT TIME before scanning (the running value is only observed at
time boundaries), which is exactly what the SQL replay's
group-then-window construction does.

Intervals are inclusive [s, e]; the close delta lands at e + 1.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Sum


def peak_concurrency(ds: "ray.data.Dataset", *, start: str, end: str,
                     bucket: int = 3600,
                     num_partitions: int = 32) -> "ray.data.Dataset":
    """→ one row (peak, t_peak): the maximum number of simultaneously
    open inclusive [start, end] intervals, and the SMALLEST time at
    which that maximum is first reached.  int64 times; see module doc
    for the two-phase distributed scan."""
    b = int(bucket)
    if b <= 0:
        raise ValueError(f"bucket must be positive, got {bucket}")

    def deltas(t: pa.Table) -> pa.Table:
        s = (t.column(start).cast(pa.int64())
             .to_numpy(zero_copy_only=False))
        e = (t.column(end).cast(pa.int64())
             .to_numpy(zero_copy_only=False)) + 1
        ts = np.concatenate([s, e])
        d = np.concatenate([np.ones(len(s), np.int64),
                            -np.ones(len(e), np.int64)])
        df = (pd.DataFrame({"t": ts, "d": d})
              .groupby("t", as_index=False)["d"].sum())
        return pa.Table.from_pandas(df, preserve_index=False)

    per_t = (ds.map_batches(deltas, batch_format="pyarrow")
             .groupby("t").aggregate(Sum("d", alias_name="d"))
             .map_batches(lambda t: t.append_column(
                 "_bkt", pa.array(
                     t.column("t").to_numpy(zero_copy_only=False)
                     // b)), batch_format="pyarrow")
             .materialize())

    def bucket_partial(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values("t", kind="stable")
        run = np.cumsum(g["d"].to_numpy(np.int64))
        return pa.table({
            "bkt": pa.array(g["_bkt"].iloc[:1].to_numpy(np.int64)),
            "total": pa.array([int(run[-1])], pa.int64()),
            "wmax": pa.array([int(run.max())], pa.int64())})

    parts = (per_t.groupby("_bkt")
             .map_groups(bucket_partial, batch_format="pandas")
             .take_all())                     # bounded: one row/bucket
    parts.sort(key=lambda r: r["bkt"])
    carry: dict[int, int] = {}
    acc = 0
    peak = 0
    for r in parts:
        carry[r["bkt"]] = acc
        peak = max(peak, acc + r["wmax"])
        acc += r["total"]
    ref = ray.put((carry, peak))

    def first_hit(g: pd.DataFrame) -> pa.Table:
        cmap, pk = ray.get(ref)
        g = g.sort_values("t", kind="stable")
        run = (np.cumsum(g["d"].to_numpy(np.int64))
               + cmap[int(g["_bkt"].iloc[0])])
        hit = np.flatnonzero(run == pk)
        if len(hit) == 0:
            return pa.table({"t": pa.array([], pa.int64())})
        return pa.table({"t": pa.array(
            [int(g["t"].to_numpy(np.int64)[hit[0]])], pa.int64())})

    hits = (per_t.groupby("_bkt")
            .map_groups(first_hit, batch_format="pandas").take_all())
    t_peak = min(r["t"] for r in hits) if hits else 0
    return ray.data.from_arrow(pa.table({
        "peak": pa.array([peak], pa.int64()),
        "t_peak": pa.array([t_peak], pa.int64())}))
