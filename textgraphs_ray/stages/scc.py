"""Strongly connected components of a DIRECTED graph.

The directed closure the undirected machinery can't express: mutual
reachability (A reaches B and B reaches A) partitions a directed graph
into SCCs — the cycle detector behind payment loops, circular
ownership, redirect chains and retry storms.  The reference's graph
layer is undirected (textgraphs `graph.py` builds symmetric lemma
links); this operator is net-new for the directed case.

Two OUTPUT-IDENTICAL plans over a distinct directed edge list
``(u, v)`` (self-loops removed by the caller):

- :func:`scc` — driver kernel: iterative Kosaraju (two DFS passes over
  the adjacency and its transpose) on an edge list the caller asserts
  is bounded (``max_edges`` — the same bounded-collect contract as the
  PageRank driver plan and ``_driver_union_find``).
- :func:`scc_distributed` — forward–backward min-label coloring
  (the FW-BW/coloring family, Orzan 2004; McLendon et al. 2005): per
  outer round compute ``f(v)`` = min id over {ancestors of v} ∪ {v}
  (min-label propagation ALONG edges to a fixpoint) and ``b(v)`` = the
  same over descendants (propagation along reversed edges).  A node
  with ``f(v) == b(v) == m`` is mutually reachable with ``m`` — it is
  settled into SCC ``m``; at least the global-min node's whole SCC
  settles every round.  Settled nodes leave the edge set and the next
  round runs on the remainder.  Every step is a Dataset op
  (shuffle_join label attach + min groupby), blocks re-materialize
  with a pinned partition count per round (the closure-loop
  invariant).

Both return ``(node, scc_id)`` with ``scc_id`` = the minimum member id
— a canonical labeling independent of plan and visit order.  Nodes are
those incident to at least one edge (isolated ids never enter).

Partitioning/scale notes: label propagation over DIRECTED reachability
cannot pointer-jump (paths are not symmetric), so inner fixpoint
rounds scale with the longest shortest path and outer rounds with the
SCC condensation depth — O(diameter) shuffles per round, the honest
cost of directed closure.  ``max_rounds`` raises rather than returning
a partial labeling.  At 100 TB scale the same plan holds with pivot
sampling/trim added; the per-round state is one (node, label) table,
never the payload.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from .join import shuffle_join

#: driver-kernel edge bound — above this, use :func:`scc_distributed`
MAX_DRIVER_EDGES = 2_000_000


def order_transition_edges(ds: "ray.data.Dataset", *,
                           bucket_col: str, seq_col: str,
                           item_col: str, mod: int,
                           weight_col: str | None = None,
                           num_partitions: int = 16
                           ) -> "ray.data.Dataset":
    """→ distinct directed edges (u, v): consecutive-step transitions
    ``item[seq] → item[seq+1]`` within each bucket, items coarsened to
    ``item % mod`` (caps the node space so downstream closure — and
    its SQL oracle replay — stays bounded at any input scale), with
    self-loops dropped.  One groupby shuffle on the bucket, a
    vectorized in-group self-merge on ``seq + 1`` (duplicate seq
    values join CROSSWISE — equi-join semantics, so the SQL replay's
    ``b.i = a.i + 1`` join matches exactly), then a distinct groupby
    on the (u, v) pair.

    With ``weight_col``, each edge additionally carries ``w`` = the
    MIN of the destination row's weight over every contributing
    transition (a per-batch combiner feeds the same distinct groupby,
    so the shuffle moves one partial min per (u, v) per group, never
    the raw pairs) — the weighted-graph input for :func:`sssp`."""

    def pairs(g: pd.DataFrame) -> pa.Table:
        seq = g[seq_col].to_numpy(np.int64)
        item = (g[item_col].to_numpy(np.int64) % mod)
        a = pd.DataFrame({"i": seq, "u": item})
        cols = {"i": seq - 1, "v": item}
        if weight_col is not None:
            cols["w"] = g[weight_col].to_numpy(np.int64)
        b = pd.DataFrame(cols)
        m = a.merge(b, on="i")
        m = m[m["u"] != m["v"]]
        out = {"u": pa.array(m["u"].to_numpy(np.int64)),
               "v": pa.array(m["v"].to_numpy(np.int64))}
        if weight_col is not None:
            # per-group combiner: one partial min per (u, v)
            m = (m.groupby(["u", "v"], sort=False)["w"].min()
                 .reset_index())
            out = {"u": pa.array(m["u"].to_numpy(np.int64)),
                   "v": pa.array(m["v"].to_numpy(np.int64)),
                   "w": pa.array(m["w"].to_numpy(np.int64))}
        # Arrow out: this feeds a distinct groupby (repo invariant)
        return pa.table(out)

    raw = (ds.groupby(bucket_col)
           .map_groups(pairs, batch_format="pandas"))
    if weight_col is not None:
        return (raw.groupby(["u", "v"])
                .aggregate(Min("w", alias_name="w"))
                .repartition(num_partitions).materialize())
    return (raw.groupby(["u", "v"]).aggregate(Count(alias_name="_n"))
            .select_columns(["u", "v"])
            .repartition(num_partitions).materialize())


def _kosaraju(u: np.ndarray, v: np.ndarray) -> dict[int, int]:
    """Iterative Kosaraju: node → min-member scc_id."""
    fwd: dict[int, list[int]] = {}
    rev: dict[int, list[int]] = {}
    nodes: set[int] = set()
    for a, b in zip(u.tolist(), v.tolist()):
        fwd.setdefault(a, []).append(b)
        rev.setdefault(b, []).append(a)
        nodes.add(a)
        nodes.add(b)

    # pass 1: DFS finish order on the forward graph (iterative)
    seen: set[int] = set()
    order: list[int] = []
    for s in nodes:
        if s in seen:
            continue
        stack: list[tuple[int, int]] = [(s, 0)]
        seen.add(s)
        while stack:
            node, i = stack[-1]
            nxt = fwd.get(node, [])
            if i < len(nxt):
                stack[-1] = (node, i + 1)
                w = nxt[i]
                if w not in seen:
                    seen.add(w)
                    stack.append((w, 0))
            else:
                order.append(node)
                stack.pop()

    # pass 2: DFS on the transpose in reverse finish order
    label: dict[int, int] = {}
    for s in reversed(order):
        if s in label:
            continue
        comp: list[int] = []
        stack2 = [s]
        label[s] = -1
        while stack2:
            node = stack2.pop()
            comp.append(node)
            for w in rev.get(node, []):
                if w not in label:
                    label[w] = -1
                    stack2.append(w)
        m = min(comp)
        for node in comp:
            label[node] = m
    return label


def scc(edges: "ray.data.Dataset", *, u: str = "u", v: str = "v",
        max_edges: int = MAX_DRIVER_EDGES) -> "ray.data.Dataset":
    """→ (node, scc_id): driver-kernel plan (bounded edge collect +
    iterative Kosaraju).  Raises above ``max_edges`` — route large
    graphs through :func:`scc_distributed`."""
    pinned = edges.select_columns([u, v]).materialize()
    n = pinned.count()
    if n > max_edges:
        raise ValueError(f"{n} edges exceed max_edges={max_edges}; "
                         f"use scc_distributed")
    if n == 0:
        empty = pa.schema([("node", pa.int64()),
                           ("scc_id", pa.int64())]).empty_table()
        return ray.data.from_arrow(empty)
    tbl = pa.concat_tables(
        [t for t in (ray.get(r) for r in pinned.to_arrow_refs())
         if t.num_rows])
    ua = tbl.column(u).to_numpy(zero_copy_only=False).astype(np.int64)
    va = tbl.column(v).to_numpy(zero_copy_only=False).astype(np.int64)
    label = _kosaraju(ua, va)
    ks = np.array(sorted(label), dtype=np.int64)
    out = pa.table({"node": pa.array(ks),
                    "scc_id": pa.array(
                        np.array([label[int(k)] for k in ks],
                                 dtype=np.int64))})
    return ray.data.from_arrow(out)


def _min_reach_labels(edges: "ray.data.Dataset", nodes: "ray.data.Dataset",
                      *, forward: bool, out_col: str,
                      num_partitions: int,
                      max_rounds: int) -> "ray.data.Dataset":
    """→ (node, ``out_col``): min id over {self} ∪ {ancestors} when
    ``forward`` (labels flow ALONG u→v), else over descendants
    (labels flow against the edges).  Fixpoint detected by the global
    label sum (labels are ints that only decrease)."""
    src, dst = ("u", "v") if forward else ("v", "u")

    def init(t: pa.Table) -> pa.Table:
        return pa.table({"node": t.column("node"),
                         "lbl": t.column("node")})

    labels = (nodes.map_batches(init, batch_format="pyarrow")
              .repartition(num_partitions).materialize())
    prev_sum = None
    for _ in range(max_rounds):
        cur_sum = labels.aggregate(Sum("lbl", alias_name="s"))["s"]
        if cur_sum == prev_sum:
            out = labels.rename_columns({"lbl": out_col})
            return out.materialize()
        prev_sum = cur_sum
        moved = shuffle_join(
            edges, labels, src, "node", num_partitions,
            project=lambda m, d=dst: pd.DataFrame({
                "node": m[d].to_numpy(np.int64),
                "lbl": m["lbl"].to_numpy(np.int64)}))
        labels = (labels.union(moved)
                  .groupby("node").aggregate(Min("lbl", alias_name="lbl"))
                  .repartition(num_partitions).materialize())
    raise RuntimeError(
        f"scc label propagation did not converge within {max_rounds} "
        f"rounds — raise max_rounds (long directed chains propagate "
        f"one hop per round)")


def scc_distributed(edges: "ray.data.Dataset", *, u: str = "u",
                    v: str = "v", max_rounds: int = 64,
                    num_partitions: int = 16) -> "ray.data.Dataset":
    """→ (node, scc_id): forward–backward min-label coloring plan.
    See module doc; output-identical to :func:`scc` (parity-tested
    and sharing its SQL oracle)."""
    cur = (edges.select_columns([u, v])
           .rename_columns({u: "u", v: "v"})
           .repartition(num_partitions).materialize())
    settled: list[pa.Table] = []

    def census(t: pa.Table) -> pa.Table:
        both = np.unique(np.concatenate([
            t.column("u").to_numpy(zero_copy_only=False),
            t.column("v").to_numpy(zero_copy_only=False)]))
        return pa.table({"node": pa.array(both.astype(np.int64))})

    # original node universe (output-sized, same bound as the final
    # driver concat): dropping a settled node's edges can ISOLATE its
    # unsettled neighbors, which then vanish from the edge-derived
    # node set — any such leftover is a singleton SCC (its SCC-internal
    # edges could only vanish with the SCC itself) and is settled at
    # the end by difference against this census.
    nodes0_ds = (cur.map_batches(census, batch_format="pyarrow")
                 .groupby("node").aggregate(Count(alias_name="_n"))
                 .select_columns(["node"]).materialize())
    nodes0 = np.sort(np.concatenate(
        [t.column("node").to_numpy(zero_copy_only=False)
         for t in (ray.get(r) for r in nodes0_ds.to_arrow_refs())
         if t.num_rows] or [np.array([], np.int64)]).astype(np.int64))

    def trim(cur):
        """Settle in-degree-0 / out-degree-0 nodes as singleton SCCs
        (nothing cyclic can pass through them) until none remain —
        the standard FW-BW trim step.  Each round is ONE degree-flag
        groupby + one broadcast edge filter (no fixpoint), which is
        what makes chain-shaped condensations cheap: a directed path
        costs one cheap trim round per node instead of a full
        label-propagation fixpoint per node."""
        while cur.count() > 0:
            def flags(t: pa.Table) -> pa.Table:
                a = t.column("u").to_numpy(zero_copy_only=False)
                b = t.column("v").to_numpy(zero_copy_only=False)
                df = pd.DataFrame({
                    "node": np.concatenate([a, b]).astype(np.int64),
                    "ho": np.concatenate([
                        np.ones(len(a), np.int64),
                        np.zeros(len(b), np.int64)]),
                    "hi": np.concatenate([
                        np.zeros(len(a), np.int64),
                        np.ones(len(b), np.int64)])})
                agg = df.groupby("node", sort=False).max().reset_index()
                return pa.Table.from_pandas(agg, preserve_index=False)

            deg = (cur.map_batches(flags, batch_format="pyarrow")
                   .groupby("node").aggregate(
                       Max("ho", alias_name="ho"),
                       Max("hi", alias_name="hi")))
            singles = np.array(
                [r["node"] for r in deg.take_all()
                 if r["ho"] == 0 or r["hi"] == 0], dtype=np.int64)
            if len(singles) == 0:
                return cur
            settled.append(pa.table({
                "node": pa.array(singles),
                "scc_id": pa.array(singles)}))
            dead_ref = ray.put(singles)

            def drop_singles(t: pa.Table) -> pa.Table:
                dead = ray.get(dead_ref)
                a = t.column("u").to_numpy(zero_copy_only=False)
                b = t.column("v").to_numpy(zero_copy_only=False)
                keep = ~(np.isin(a, dead) | np.isin(b, dead))
                return t.filter(pa.array(keep))

            cur = (cur.map_batches(drop_singles, batch_format="pyarrow")
                   .repartition(num_partitions).materialize())
        return cur

    for _ in range(max_rounds):
        cur = trim(cur)
        if cur.count() == 0:
            break

        nodes = (cur.map_batches(census, batch_format="pyarrow")
                 .groupby("node").aggregate(Count(alias_name="_n"))
                 .select_columns(["node"])
                 .repartition(num_partitions).materialize())

        fwd = _min_reach_labels(cur, nodes, forward=True, out_col="f",
                                num_partitions=num_partitions,
                                max_rounds=max_rounds * 8)
        bwd = _min_reach_labels(cur, nodes, forward=False, out_col="b",
                                num_partitions=num_partitions,
                                max_rounds=max_rounds * 8)
        both = shuffle_join(
            fwd, bwd, "node", "node", num_partitions,
            project=lambda m: pd.DataFrame({
                "node": m["node"].to_numpy(np.int64),
                "f": m["f"].to_numpy(np.int64),
                "b": m["b"].to_numpy(np.int64)}))

        def settle(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            return t.filter(pc.equal(t.column("f"), t.column("b")))

        done = (both.map_batches(settle, batch_format="pyarrow")
                .materialize())
        # skip zero-row blocks: a fully-filtered block can carry a
        # column-less schema that poisons concat_tables
        parts = [t for t in (ray.get(r) for r in done.to_arrow_refs())
                 if t.num_rows]
        done_tbl = pa.concat_tables(parts) if parts else None
        if done_tbl is None or done_tbl.num_rows == 0:
            raise RuntimeError("scc_distributed made no progress — "
                               "f==b must settle the global-min SCC")
        settled.append(pa.table({
            "node": done_tbl.column("node"),
            "scc_id": done_tbl.column("f")}))

        gone = ray.put(done_tbl.column("node").to_numpy(
            zero_copy_only=False).astype(np.int64))

        def drop(t: pa.Table) -> pa.Table:
            dead = ray.get(gone)
            a = t.column("u").to_numpy(zero_copy_only=False)
            b = t.column("v").to_numpy(zero_copy_only=False)
            m = ~(np.isin(a, dead) | np.isin(b, dead))
            return t.filter(pa.array(m))

        cur = (cur.map_batches(drop, batch_format="pyarrow")
               .repartition(num_partitions).materialize())
    else:
        if cur.count() > 0:
            raise RuntimeError(
                f"scc_distributed exhausted {max_rounds} outer rounds "
                f"with {cur.count()} edges unsettled — raise max_rounds")

    done_nodes = (np.concatenate(
        [t.column("node").to_numpy(zero_copy_only=False)
         for t in settled]).astype(np.int64)
        if settled else np.array([], np.int64))
    leftover = np.setdiff1d(nodes0, done_nodes)
    if len(leftover):
        settled.append(pa.table({"node": pa.array(leftover),
                                 "scc_id": pa.array(leftover)}))
    if not settled:
        empty = pa.schema([("node", pa.int64()),
                           ("scc_id", pa.int64())]).empty_table()
        return ray.data.from_arrow(empty)
    out = pa.concat_tables(settled).sort_by("node")
    return ray.data.from_arrow(out)


def sssp(edges: "ray.data.Dataset", *, source: int, max_hops: int,
         u: str = "u", v: str = "v", w: str = "w",
         max_edges: int = MAX_DRIVER_EDGES) -> "ray.data.Dataset":
    """→ (node, dist): hop-bounded single-source shortest path over a
    DIRECTED weighted edge list — ``dist(v)`` = min total weight over
    paths source→v with at most ``max_hops`` edges (the weighted
    upgrade of :func:`~.triangle.bfs_hops`; reference parity target is
    the hop-distance analytics of textgraphs `graph.py`, extended to
    weights).  The hop bound is part of the SEMANTICS, mirrored by the
    SQL replay's recursive walk bound — on a graph whose shortest-path
    trees are shallower than ``max_hops`` it equals true SSSP.

    Driver-kernel plan: bounded edge collect (``max_edges``, the
    ``_driver_union_find`` contract) + ``max_hops`` vectorized
    Bellman–Ford relaxation rounds in numpy.  Route bigger graphs
    through :func:`sssp_distributed` (output-identical, parity-tested,
    shares this plan's oracle)."""
    pinned = edges.select_columns([u, v, w]).materialize()
    n = pinned.count()
    if n > max_edges:
        raise ValueError(f"{n} edges exceed max_edges={max_edges}; "
                         f"use sssp_distributed")
    parts = [t for t in (ray.get(r) for r in pinned.to_arrow_refs())
             if t.num_rows]
    if not parts:
        out = pa.table({"node": pa.array([source], pa.int64()),
                        "dist": pa.array([0], pa.int64())})
        return ray.data.from_arrow(out)
    tbl = pa.concat_tables(parts)
    ua = tbl.column(u).to_numpy(zero_copy_only=False).astype(np.int64)
    va = tbl.column(v).to_numpy(zero_copy_only=False).astype(np.int64)
    wa = tbl.column(w).to_numpy(zero_copy_only=False).astype(np.int64)
    nodes, inv = np.unique(np.concatenate([ua, va, [source]]),
                           return_inverse=True)
    ui, vi = inv[:len(ua)], inv[len(ua):-1]
    INF = np.iinfo(np.int64).max // 4
    dist = np.full(len(nodes), INF, np.int64)
    dist[inv[-1]] = 0
    for _ in range(max_hops):
        # relax every edge against the CURRENT dist: after round h,
        # dist = min cost over paths with <= h edges (Bellman-Ford)
        cand = dist[ui] + wa
        nxt = dist.copy()
        np.minimum.at(nxt, vi, cand)
        if np.array_equal(nxt, dist):
            break
        dist = nxt
    keep = dist < INF
    return ray.data.from_arrow(pa.table({
        "node": pa.array(nodes[keep]),
        "dist": pa.array(dist[keep])}))


def sssp_distributed(edges: "ray.data.Dataset", *, source: int,
                     max_hops: int, u: str = "u", v: str = "v",
                     w: str = "w",
                     num_partitions: int = 16) -> "ray.data.Dataset":
    """→ (node, dist): distributed plan for :func:`sssp` — each
    relaxation round is one ``shuffle_join`` (dist ⋈ edges on the
    source endpoint, emitting ``dist + w`` at the destination) and one
    min groupby, blocks re-pinned per round (the closure-loop
    invariant).  Early-exits when a round changes nothing (dist values
    only decrease, so the (count, sum) pair is a fixpoint witness).
    Per-round state is one (node, dist) table — never the payload."""
    e = (edges.select_columns([u, v, w])
         .rename_columns({u: "u", v: "v", w: "w"})
         .repartition(num_partitions).materialize())
    dist = ray.data.from_arrow(pa.table({
        "node": pa.array([source], pa.int64()),
        "dist": pa.array([0], pa.int64())}))
    prev = None
    for _ in range(max_hops):
        moved = shuffle_join(
            e, dist, "u", "node", num_partitions,
            project=lambda m: pd.DataFrame({
                "node": m["v"].to_numpy(np.int64),
                "dist": m["dist"].to_numpy(np.int64)
                        + m["w"].to_numpy(np.int64)}))
        dist = (dist.union(moved)
                .groupby("node").aggregate(Min("dist", alias_name="dist"))
                .repartition(num_partitions).materialize())
        wit = (dist.count(),
               dist.aggregate(Sum("dist", alias_name="s"))["s"])
        if wit == prev:
            break
        prev = wit
    return dist
