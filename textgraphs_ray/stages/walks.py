"""Deterministic random-walk generation — the DeepWalk/node2vec
corpus primitive (Perozzi et al. 2014, public) made hash-verifiable.

True random walks cannot be oracle-checked; these use a FIXED
arithmetic chooser so the walk is a pure function of the graph:

  at step ``t`` from node ``v`` the walk moves to the neighbor at
  sorted-adjacency index
      (((walk_id % P)·1315423911 + t·2654435761 + (v % P)·97) % P)
          % deg(v),  P = 1000003

— plain int64 modular arithmetic a SQL engine replays exactly.  Ids
reduce mod P BEFORE the multiply on both the Ray and SQL sides, so
no product exceeds (P−1)·1315423911 < 2^51 and the chooser is
overflow-free for ANY int64 id (an unreduced walk_id·1315423911
wraps silently in numpy above ids ≈ 2^32.7, and numpy's wrapped
negative ``%`` differs from SQL's, which raises instead).  The
distribution is uniform-ish per step, which is all embedding-corpus
generation needs; swap the chooser for a seeded PRNG when
verifiability is not required.

Physical plan: the symmetrized adjacency is ranked ONCE (one groupby:
per src, neighbors sorted ascending carry (rank, deg)) and
re-materialized; each of the ``length`` steps is ONE
empty-partition-safe shuffle_join of the frontier on the current
node, with the chooser evaluated vectorized inside the merge and the
``rank == chooser`` filter applied in place (per-step fanout = deg,
bounded by max degree — orient or cap hot nodes upstream at web
scale).  Walks start at every non-isolated node.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from .join import shuffle_join

_A = 1315423911
_B = 2654435761
_C = 97
_P = 1000003


def random_walks(edges: "ray.data.Dataset", *, length: int = 4,
                 u: str = "u", v: str = "v",
                 num_partitions: int = 16) -> "ray.data.Dataset":
    """→ (walk_id, step, node): one deterministic walk of ``length``
    steps from every non-isolated node (walk_id = start node; step 0
    is the start itself).  ``edges`` must be distinct with u < v;
    traversal is undirected."""
    out_schema = pa.schema([("walk_id", pa.int64()),
                            ("step", pa.int64()),
                            ("node", pa.int64())])
    if edges.schema() is None:
        return ray.data.from_arrow(out_schema.empty_table())

    def sym(t: pa.Table) -> pa.Table:
        a = t.column(u).to_numpy(zero_copy_only=False)
        b = t.column(v).to_numpy(zero_copy_only=False)
        return pa.table({
            "src": pa.array(np.concatenate([a, b]).astype(np.int64)),
            "dst": pa.array(np.concatenate([b, a]).astype(np.int64))})

    def ranked(g: pd.DataFrame) -> pa.Table:
        # Arrow out (repo invariant: UDF output feeding a shuffle) —
        # pandas blocks here let repartition's EMPTY blocks poison
        # int64 → float64 through the hop joins, silently corrupting
        # node ids above 2^53 and breaking the walk joins
        d = np.sort(np.unique(g["dst"].to_numpy()))
        return pa.table({
            "src": pa.array(np.full(len(d), g["src"].iloc[0],
                                    dtype=np.int64)),
            "rank": pa.array(np.arange(len(d), dtype=np.int64)),
            "dst": pa.array(d.astype(np.int64)),
            "deg": pa.array(np.full(len(d), len(d), dtype=np.int64))})

    adj = (edges.map_batches(sym, batch_format="pyarrow")
           .groupby("src").map_groups(ranked, batch_format="pandas")
           .repartition(num_partitions).materialize())
    if adj.count() == 0:
        return ray.data.from_arrow(out_schema.empty_table())

    import pyarrow.compute as _pc

    def starts(t: pa.Table) -> pa.Table:
        sel = t.filter(_pc.equal(t.column("rank"), 0))
        return pa.table({
            "walk_id": sel.column("src"),
            "node": sel.column("src")})

    frontier = adj.map_batches(starts,
                               batch_format="pyarrow").materialize()
    outputs = [frontier.map_batches(
        lambda t: pa.table({
            "walk_id": t.column("walk_id"),
            "step": pa.array(np.zeros(t.num_rows, np.int64)),
            "node": t.column("node")}),
        batch_format="pyarrow")]

    for step in range(1, length + 1):
        def hop(df: pd.DataFrame, step=step) -> pd.DataFrame:
            wid = df["walk_id"].to_numpy()
            vv = df["src"].to_numpy()
            deg = df["deg"].to_numpy()
            # reduce mod _P before the multiply: overflow-free for any
            # int64 id (module doc), same residue as the unreduced form
            idx = (((wid % _P) * _A + step * _B + (vv % _P) * _C)
                   % _P) % deg
            keep = df["rank"].to_numpy() == idx
            return pd.DataFrame({
                "walk_id": wid[keep],
                "node": df["dst"].to_numpy()[keep]})

        frontier = shuffle_join(
            frontier, adj, "node", "src", num_partitions,
            hop).materialize()
        outputs.append(frontier.map_batches(
            lambda t, step=step: pa.table({
                "walk_id": t.column("walk_id"),
                "step": pa.array(np.full(t.num_rows, step, np.int64)),
                "node": t.column("node")}),
            batch_format="pyarrow"))

    out = outputs[0]
    for o in outputs[1:]:
        out = out.union(o)
    return out.union(ray.data.from_arrow(out_schema.empty_table()))
