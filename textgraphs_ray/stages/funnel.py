"""Ordered-funnel analysis — the MATCH_RECOGNIZE-lite sequence
operator over an event stream: for each user, how far along an
ordered step list (view → click → purchase) their events progress,
where step k+1 must occur STRICTLY AFTER the chosen step-k event.

Semantics (the classic greedy funnel, replayed exactly in SQL):

  t_1 = min ts of a step-1 event
  t_{k+1} = min ts of a step-(k+1) event with ts > t_k

Greedy-min chaining is optimal: taking the earliest feasible event at
every step never reduces how many later steps fit (exchange
argument), so "reached step k" is well-defined independent of which
witnesses are picked.

Physical plan — one shuffle, no per-user tasks:

1. Prune to step events only and tag each row with its step index —
   a stateless vectorized scan.
2. ONE coarse hash partition on the user key (bounded
   ``num_partitions`` fan-out; all of a user's rows co-locate).
3. Per partition, ALL users chain together in vectorized pandas:
   step-1 groupby-min, then per step one merge + filter + groupby-min
   (O(steps) small frames, never a per-user loop).
4. Per-partition partial step counts union a zero base (every step
   appears even with no users) and one tiny groupby(step) sums —
   users are disjoint across partitions so partials just add.

Timestamps compare as int64 microseconds on both sides — the strict
``>`` chain is exact, no float anywhere.

No counterpart in the reference engine (DerwenAI/textgraphs has no
event-sequence analytics); this extends the `transitions` /
`sessionize` family (SURVEY.md §2.10) with ordered multi-step
matching.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Sum


def funnel_counts(ds: "ray.data.Dataset", *, user_col: str,
                  type_col: str, ts_col: str, steps: list[str],
                  num_partitions: int = 32) -> "ray.data.Dataset":
    """→ (step, step_name, n_users): for each 1-based funnel step,
    how many users reached it under strict-after greedy chaining.
    ``steps`` is the ordered event-type list; see module doc."""
    if not steps:
        raise ValueError("steps must be a non-empty ordered list")
    if len(set(steps)) != len(steps):
        raise ValueError(f"steps must be distinct, got {steps}")
    step_ix = {s: i for i, s in enumerate(steps)}
    k_steps = len(steps)

    def tag(t: pa.Table) -> pa.Table:
        et = t.column(type_col).to_pandas()
        six = et.map(step_ix)
        m = six.notna().to_numpy()
        uid = t.column(user_col).to_numpy(zero_copy_only=False)[m]
        ts = (t.column(ts_col).cast(pa.int64())
              .to_numpy(zero_copy_only=False)[m])
        part = (uid.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                >> np.uint64(64 - 6)).astype(np.int64) % num_partitions
        return pa.table({
            "_part": pa.array(part),
            "u": pa.array(uid.astype(np.int64)),
            "s": pa.array(six.to_numpy()[m].astype(np.int64)),
            "ts": pa.array(ts)})

    def chain(g: pd.DataFrame) -> pa.Table:
        # greedy-min chaining for EVERY user in this partition at
        # once: O(steps) vectorized frames, never a per-user loop
        reached = np.zeros(k_steps, np.int64)
        cur = (g[g["s"] == 0].groupby("u", sort=False, as_index=False)
               ["ts"].min().rename(columns={"ts": "t"}))
        reached[0] = len(cur)
        for k in range(1, k_steps):
            if cur.empty:
                break
            nxt = g[g["s"] == k].merge(cur, on="u")
            nxt = nxt[nxt["ts"] > nxt["t"]]
            cur = (nxt.groupby("u", sort=False, as_index=False)
                   ["ts"].min().rename(columns={"ts": "t"}))
            reached[k] = len(cur)
        return pa.table({"step": pa.array(np.arange(1, k_steps + 1)),
                         "n": pa.array(reached)})

    partials = (ds.map_batches(tag, batch_format="pyarrow")
                .groupby("_part").map_groups(chain,
                                             batch_format="pandas"))
    # zero base keeps steps nobody reached (and the all-empty input)
    # in the output with n_users = 0
    base = ray.data.from_arrow(pa.table({
        "step": pa.array(np.arange(1, k_steps + 1)),
        "n": pa.array(np.zeros(k_steps, np.int64))}))
    summed = (partials.union(base).groupby("step")
              .aggregate(Sum("n", alias_name="n_users")))

    names = np.array(steps, dtype=object)

    def label(t: pa.Table) -> pa.Table:
        s = t.column("step").to_numpy(zero_copy_only=False)
        return pa.table({
            "step": t.column("step"),
            "step_name": pa.array(names[s - 1], pa.string()),
            "n_users": t.column("n_users")})

    return summed.map_batches(label, batch_format="pyarrow")


def path_trigrams(ds: "ray.data.Dataset", *, user_col: str,
                  type_col: str, ts_col: str, id_col: str,
                  k: int = 20,
                  num_partitions: int = 32) -> "ray.data.Dataset":
    """→ top-k (a, b, c, n) event-type TRIGRAMS over each user's
    time-ordered stream — the second-order sibling of the Markov
    `transitions` bigrams (path mining: which 3-step journeys
    dominate).  Order inside a user is (ts, id) — the unique event id
    breaks timestamp ties exactly like `transitions`.  Deterministic
    top-k: (n DESC, a, b, c).

    One coarse user-hash partition; inside a partition EVERY user's
    trigrams emit from one double-shift over the (user, ts, id)-sorted
    frame with boundary masks — never a per-user task.  Per-partition
    (a, b, c) pre-counts combine before the global count groupby, and
    a per-block partial top-k bounds the final sort at ≤ k rows per
    block."""
    import pyarrow.compute as pc

    def tag(t: pa.Table) -> pa.Table:
        uid = t.column(user_col).to_numpy(zero_copy_only=False)
        part = (uid.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                >> np.uint64(64 - 6)).astype(np.int64) % num_partitions
        return pa.table({
            "_part": pa.array(part),
            "u": pa.array(uid.astype(np.int64)),
            "et": t.column(type_col),
            "ts": t.column(ts_col).cast(pa.int64()),
            "eid": t.column(id_col).cast(pa.int64())})

    def trigrams(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["u", "ts", "eid"], kind="stable")
        u = g["u"].to_numpy(np.int64)
        et = g["et"].to_numpy()
        if len(u) < 3:
            return pa.table({"a": pa.array([], pa.string()),
                             "b": pa.array([], pa.string()),
                             "c": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        same = (u[:-2] == u[1:-1]) & (u[1:-1] == u[2:])
        df = pd.DataFrame({"a": et[:-2][same], "b": et[1:-1][same],
                           "c": et[2:][same]})
        agg = (df.groupby(["a", "b", "c"], sort=False).size()
               .reset_index(name="n"))
        return pa.Table.from_pandas(agg, preserve_index=False)

    from ray.data.aggregate import Sum

    counts = (ds.map_batches(tag, batch_format="pyarrow")
              .groupby("_part").map_groups(trigrams,
                                           batch_format="pandas")
              .groupby(["a", "b", "c"])
              .aggregate(Sum("n", alias_name="n")))

    def partial_topk(t: pa.Table) -> pa.Table:
        idx = pc.select_k_unstable(
            t, k=min(k, t.num_rows),
            sort_keys=[("n", "descending"), ("a", "ascending"),
                       ("b", "ascending"), ("c", "ascending")])
        return t.take(idx)

    return (counts.map_batches(partial_topk, batch_format="pyarrow")
            .sort(["n", "a", "b", "c"],
                  descending=[True, False, False, False])
            .limit(k))
