"""Hop-bounded harmonic centrality, Katz centrality, and synchronous
label propagation — the remaining classical node-importance /
community primitives over the same coarsened transition graphs the
PageRank/HITS/SSSP family (stages/rank.py, stages/scc.py) already
feeds.

All three are pure Dataset plans — no broadcast adjacency, no driver
graph: per round one ``shuffle_join`` (frontier/score × edges) and
one groupby.  Node counts are bounded upstream by the ``mod``
coarsening (see scc.order_transition_edges), so the multi-source
distance table is ≤ nodes² rows; at web scale shard sources into
stripes and run stripes independently (embarrassingly parallel — the
per-source rows never interact across sources).

Exactness contracts (each mirrors its unrolled SQL oracle):

* harmonic: distances are hop counts ≤ ``hops``; the score is the
  INTEGER Σ 12/d (12 = lcm(1..4) — exact for the default 4 hops).
* Katz: α = 1/16 and the iterate is kept as the integer
  p_k = 16^k·x_k (p_{k+1} = 16^{k+1} + Σ_in p_k), so three rounds of
  x_{k+1} = 1 + α·Aᵀx_k are exact int64 arithmetic end to end.
* LPA: synchronous rounds, new label = the neighbor-label mode with
  ties → smallest label; deterministic given round count.

Reference anchor: complements the reference's single ranking
primitive (PageRank restack, `textgraphs/graph.py:215-293`) with the
other textbook centralities (Boldi & Vigna 2014 for harmonic; Katz
1953; Raghavan et al. 2007 for LPA — all public).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from .join import shuffle_join


def _symmetrize(edges: "ray.data.Dataset", *, u: str = "u",
                v: str = "v") -> "ray.data.Dataset":
    """→ distinct directed rows (u, v) ∪ (v, u)."""

    def both(t: pa.Table) -> pa.Table:
        a = t.column(u).to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column(v).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"u": pa.array(np.concatenate([a, b])),
                         "v": pa.array(np.concatenate([b, a]))})

    return (edges.map_batches(both, batch_format="pyarrow")
            .groupby(["u", "v"]).aggregate(Count(alias_name="_c"))
            .select_columns(["u", "v"]))


def _nodes_of(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    def us(t: pa.Table) -> pa.Table:
        a = t.column("u").to_numpy(zero_copy_only=False)
        b = t.column("v").to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(np.unique(
            np.concatenate([a, b]).astype(np.int64)))})

    return (edges.map_batches(us, batch_format="pyarrow")
            .groupby("node").aggregate(Count(alias_name="_c"))
            .select_columns(["node"]))


def bounded_distances(edges: "ray.data.Dataset", *, hops: int,
                      u: str = "u", v: str = "v",
                      num_partitions: int = 8) -> "ray.data.Dataset":
    """→ (src, node, d): minimum hop distance ≤ ``hops`` between
    every node pair reachable within the bound, over the UNDIRECTED
    view of ``edges`` (d = 0 rows for every node to itself included).

    Multi-source BFS as data: the (src, node, d) table grows one
    frontier per round via shuffle_join(frontier × edges) and a
    (src, node) min-d groupby; newly-reached rows (d == round) are
    the next frontier.  ``hops`` rounds, bounded by the coarsened
    node domain; per-source rows never interact across sources, so
    at web scale shard sources into stripes and run stripes
    independently."""
    if hops < 1:
        raise ValueError(f"hops must be >= 1, got {hops}")
    sym = _symmetrize(edges, u=u, v=v).materialize()

    def seed(t: pa.Table) -> pa.Table:
        n = t.column("node")
        return pa.table({"src": n, "node": n, "d": pa.array(
            np.zeros(len(t), np.int64))})

    known = (_nodes_of(sym).map_batches(seed, batch_format="pyarrow")
             .materialize())
    frontier = known

    for h in range(1, hops + 1):
        cand = shuffle_join(
            frontier, sym, "node", "u", num_partitions,
            project=lambda m, hh=h: pd.DataFrame({
                "src": m["src"], "node": m["v"],
                "d": np.full(len(m), hh, np.int64)}))
        known = (known.union(cand)
                 .groupby(["src", "node"])
                 .aggregate(Min("d", alias_name="d"))
                 .repartition(num_partitions).materialize())
        frontier = known.filter(expr=f"d == {h}").materialize()
        if frontier.count() == 0:
            break
    return known


def harmonic_centrality(edges: "ray.data.Dataset", *, hops: int = 4,
                        u: str = "u", v: str = "v",
                        num_partitions: int = 8
                        ) -> "ray.data.Dataset":
    """→ (node, harmonic_x12, n_reached): hop-bounded harmonic
    centrality over the UNDIRECTED view of ``edges`` — for every
    node, Σ 12/d over nodes within ``hops`` hops (d ≥ 1) plus the
    reach count.  12 = lcm(1..4): the default bound keeps the score
    an exact integer.  Distances from :func:`bounded_distances`."""
    if hops < 1 or hops > 4:
        raise ValueError(f"hops must be in [1, 4] (12 = lcm(1..4) "
                         f"keeps 12/d integral), got {hops}")
    known = bounded_distances(edges, hops=hops, u=u, v=v,
                              num_partitions=num_partitions)

    def score(t: pa.Table) -> pa.Table:
        d = t.column("d").to_numpy(zero_copy_only=False)
        src = t.column("src").to_numpy(zero_copy_only=False)
        m = d >= 1
        return pa.table({"node": pa.array(src[m]),
                         "h": pa.array(12 // d[m]),
                         "r": pa.array(np.ones(int(m.sum()),
                                               np.int64))})

    return (known.map_batches(score, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Sum("h", alias_name="harmonic_x12"),
                       Sum("r", alias_name="n_reached")))


def eccentricity(edges: "ray.data.Dataset", *, hops: int = 4,
                 u: str = "u", v: str = "v",
                 num_partitions: int = 8) -> "ray.data.Dataset":
    """→ (node, ecc, n_reached): hop-bounded eccentricity over the
    undirected view of ``edges`` — the max hop distance to any node
    reached within ``hops`` hops, plus the reach count.  A LOWER
    bound of the true eccentricity whenever the bound binds (same
    capped-semantics contract as ``bfs_hops``' hop cap: the cap is
    part of the operator and the oracle replays it); nodes with no
    neighbor emit no row.  Shares the multi-source BFS distance
    table with :func:`harmonic_centrality`
    (:func:`bounded_distances`)."""
    known = bounded_distances(edges, hops=hops, u=u, v=v,
                              num_partitions=num_partitions)

    def reach(t: pa.Table) -> pa.Table:
        d = t.column("d").to_numpy(zero_copy_only=False)
        src = t.column("src").to_numpy(zero_copy_only=False)
        m = d >= 1
        return pa.table({"node": pa.array(src[m]),
                         "d": pa.array(d[m]),
                         "r": pa.array(np.ones(int(m.sum()),
                                               np.int64))})

    return (known.map_batches(reach, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Max("d", alias_name="ecc"),
                       Sum("r", alias_name="n_reached")))


def katz_centrality(edges: "ray.data.Dataset", *, rounds: int = 3,
                    u: str = "u", v: str = "v",
                    num_partitions: int = 8) -> "ray.data.Dataset":
    """→ (node, katz_x4096): three exact integer rounds of
    x_{k+1} = 1 + (1/16)·Aᵀx_k over the DIRECTED ``edges``, reported
    as p_3 = 4096·x_3.  Per round: shuffle_join(edges × p on the
    source endpoint) routes each score along its out-edges, a union
    with per-node zero rows supplies the additive base without a
    left join (empty-partition-safe), one groupby sums."""
    if rounds < 1 or rounds > 10:
        raise ValueError(f"rounds must be in [1, 10], got {rounds}")
    e = (edges.select_columns([u, v])
         .groupby([u, v]).aggregate(Count(alias_name="_c"))
         .select_columns([u, v]).materialize())
    nodes = _nodes_of(e).materialize()

    def init(t: pa.Table) -> pa.Table:
        return pa.table({"node": t.column("node"), "p": pa.array(
            np.ones(len(t), np.int64))})

    p = nodes.map_batches(init, batch_format="pyarrow").materialize()

    for k in range(1, rounds + 1):
        base = 16 ** k

        def zero(t: pa.Table) -> pa.Table:
            return pa.table({"node": t.column("node"), "c": pa.array(
                np.zeros(len(t), np.int64))})

        contrib = shuffle_join(
            e, p, u, "node", num_partitions,
            project=lambda m: pd.DataFrame({"node": m[v],
                                            "c": m["p"]}))
        summed = (contrib.union(
            nodes.map_batches(zero, batch_format="pyarrow"))
            .groupby("node").aggregate(Sum("c", alias_name="c")))

        def bump(t: pa.Table, b=base) -> pa.Table:
            c = t.column("c").to_numpy(zero_copy_only=False)
            return pa.table({"node": t.column("node"),
                             "p": pa.array(c + b)})

        p = (summed.map_batches(bump, batch_format="pyarrow")
             .repartition(num_partitions).materialize())

    def out(t: pa.Table) -> pa.Table:
        return pa.table({"node": t.column("node"),
                         "katz_x4096": t.column("p")})

    return p.map_batches(out, batch_format="pyarrow")


def lpa_communities(edges: "ray.data.Dataset", *, rounds: int = 2,
                    u: str = "u", v: str = "v",
                    num_partitions: int = 8) -> "ray.data.Dataset":
    """→ (node, label): ``rounds`` SYNCHRONOUS label-propagation
    steps over the undirected view of ``edges``; initial label =
    node id, new label = the modal neighbor label with ties → the
    smallest label.  Deterministic given ``rounds`` (the classic
    async LPA is order-dependent; the synchronous variant replays
    exactly in SQL).  Per round: shuffle_join routes labels along
    edges, one (node, label) count groupby, one per-node argmax."""
    sym = _symmetrize(edges, u=u, v=v).materialize()

    def init(t: pa.Table) -> pa.Table:
        return pa.table({"node": t.column("node"),
                         "label": t.column("node")})

    labels = (_nodes_of(sym).map_batches(init, batch_format="pyarrow")
              .materialize())

    for _ in range(rounds):
        nb_lab = shuffle_join(
            sym, labels, "v", "node", num_partitions,
            project=lambda m: pd.DataFrame({"n": m["u"],
                                            "lab": m["label"]}))
        cnt = (nb_lab.groupby(["n", "lab"])
               .aggregate(Count(alias_name="c")))

        def argmax(g: pd.DataFrame) -> pa.Table:
            g = g.sort_values(["c", "lab"], ascending=[False, True],
                              kind="stable").head(1)
            return pa.table({"node": pa.array(
                g["n"].to_numpy(np.int64)), "label": pa.array(
                g["lab"].to_numpy(np.int64))})

        labels = (cnt.groupby("n").map_groups(argmax,
                                              batch_format="pandas")
                  .repartition(num_partitions).materialize())

    return labels


def stress_centrality(edges: "ray.data.Dataset", *, hops: int = 4,
                      u: str = "u", v: str = "v",
                      num_partitions: int = 8) -> "ray.data.Dataset":
    """→ (node, stress): hop-bounded STRESS centrality over the
    undirected view of ``edges`` — for every node v, the number of
    shortest s→t paths (of length ≤ ``hops``, over all source–target
    pairs) that pass THROUGH v (Shimbel 1953; the all-integer member
    of the betweenness family, so the value-hash gate is exact where
    betweenness's nested rational divisions would not be).

    Brandes-style two-pass, all counts int64:

    * forward: σ_h(s, v) = Σ σ_{h-1}(s, u) over BFS-DAG edges u→v
      (d(s, v) = h) — per hop ONE shuffle_join + one sum groupby +
      one packed-key semi-join against the shared
      :func:`bounded_distances` table;
    * backward: ρ_h(s, v) = Σ_{w ∈ succ} (1 + ρ_{h+1}(s, w)) — the
      count of capped DAG path-segments leaving v — per hop the same
      join shapes in reverse (depth-``hops`` nodes are ρ = 0 by the
      cap, the same capped-semantics contract as ``bfs_hops``);
    * stress(v) = Σ_s σ(s, v)·ρ(s, v) over v ≠ s.

    Composite (src, node) keys pack into one int64 (ids must fit
    31 bits — asserted); per-source rows never interact, so stripe
    sources at web scale exactly like harmonic."""
    if hops < 1:
        raise ValueError(f"hops must be >= 1, got {hops}")
    sym = _symmetrize(edges, u=u, v=v).materialize()
    dist = bounded_distances(edges, hops=hops, u=u, v=v,
                             num_partitions=num_partitions
                             ).materialize()

    LIM = np.int64(1) << 31

    def pack(t: pa.Table, keep: list) -> pa.Table:
        s = t.column("src").to_numpy(zero_copy_only=False)
        n = t.column("node").to_numpy(zero_copy_only=False)
        if len(s) and (s.max() >= LIM or n.max() >= LIM
                       or s.min() < 0 or n.min() < 0):
            raise ValueError("stress_centrality packs (src, node) "
                             "into int64 — ids must be in [0, 2^31)")
        cols = {"pk": pa.array((s << np.int64(32)) | n)}
        for c in keep:
            cols[c] = t.column(c)
        return pa.table(cols)

    def depth_keys(h: int) -> "ray.data.Dataset":
        return (dist.filter(expr=f"d == {h}")
                .map_batches(lambda t: pack(t, []),
                             batch_format="pyarrow"))

    def init_sig(t: pa.Table) -> pa.Table:
        return pa.table({"src": t.column("src"),
                         "node": t.column("node"),
                         "sig": pa.array(np.ones(len(t), np.int64))})

    sig_prev = (dist.filter(expr="d == 0")
                .map_batches(init_sig, batch_format="pyarrow")
                .materialize())
    sig_tables = []
    for h in range(1, hops + 1):
        cand = shuffle_join(
            sig_prev, sym, "node", "u", num_partitions,
            project=lambda m: pd.DataFrame({
                "src": m["src"], "node": m["v"], "sig": m["sig"]}))
        summed = (cand.groupby(["src", "node"])
                  .aggregate(Sum("sig", alias_name="sig"))
                  .map_batches(lambda t: pack(t, ["src", "node",
                                                  "sig"]),
                               batch_format="pyarrow"))
        sig_h = shuffle_join(
            summed, depth_keys(h), "pk", "pk", num_partitions,
            how="semi").repartition(num_partitions).materialize()
        sig_tables.append(sig_h)
        sig_prev = sig_h
        if sig_h.count() == 0:
            break

    rho_next: "ray.data.Dataset | None" = None
    rho_tables = []
    for h in range(hops - 1, -1, -1):
        w_rows = (dist.filter(expr=f"d == {h + 1}")
                  .map_batches(lambda t: pack(t, ["src", "node"]),
                               batch_format="pyarrow"))
        if rho_next is None or rho_next.count() == 0:
            def base(t: pa.Table) -> pa.Table:
                return pa.table({
                    "src": t.column("src"), "node": t.column("node"),
                    "val": pa.array(np.ones(len(t), np.int64))})

            vals = w_rows.map_batches(base, batch_format="pyarrow")
        else:
            rn = rho_next.map_batches(
                lambda t: pack(t, ["rho"]), batch_format="pyarrow")
            vals = shuffle_join(
                w_rows, rn, "pk", "pk", num_partitions, how="left",
                project=lambda m: pd.DataFrame({
                    "src": m["src"], "node": m["node"],
                    "val": (m["rho"].fillna(0) + 1)
                    .astype(np.int64)}))
        cand = shuffle_join(
            vals, sym, "node", "u", num_partitions,
            project=lambda m: pd.DataFrame({
                "src": m["src"], "node": m["v"], "val": m["val"]}))
        summed = (cand.groupby(["src", "node"])
                  .aggregate(Sum("val", alias_name="rho"))
                  .map_batches(lambda t: pack(t, ["src", "node",
                                                  "rho"]),
                               batch_format="pyarrow"))
        rho_h = shuffle_join(
            summed, depth_keys(h), "pk", "pk", num_partitions,
            how="semi").repartition(num_partitions).materialize()
        rho_tables.append(rho_h)
        rho_next = rho_h

    empty = pa.schema([("node", pa.int64()),
                       ("stress", pa.int64())]).empty_table()
    if not sig_tables:
        return ray.data.from_arrow(empty)
    sig_all = sig_tables[0]
    for t in sig_tables[1:]:
        sig_all = sig_all.union(t)
    rho_all = rho_tables[0]
    for t in rho_tables[1:]:
        rho_all = rho_all.union(t)
    rho_slim = rho_all.map_batches(
        lambda t: t.select(["pk", "rho"]), batch_format="pyarrow")

    joined = shuffle_join(
        sig_all, rho_slim, "pk", "pk", num_partitions, how="left",
        project=lambda m: pd.DataFrame({
            "node": (m["pk"].to_numpy(np.int64)
                     & np.int64(0xFFFFFFFF)),
            "c": (m["sig"].to_numpy(np.int64)
                  * m["rho"].fillna(0).to_numpy(np.int64))}))
    out = (joined.groupby("node")
           .aggregate(Sum("c", alias_name="stress")))
    return out.union(ray.data.from_arrow(empty))


def harmonic_centrality_driver(edges: "ray.data.Dataset", *,
                               hops: int = 4, u: str = "u",
                               v: str = "v",
                               max_edges: int = 2_000_000
                               ) -> "ray.data.Dataset":
    """Forced-alternate DRIVER plan for :func:`harmonic_centrality`
    (output-identical; shares its oracle — the scc/sssp dual-plan
    pattern): collect the bounded deduped edge list once and run the
    multi-source capped BFS as a numpy CSR kernel.  The coarsened
    graphs this operator targets are ≤ ``max_edges`` by construction
    (assert-guarded); the Dataset plan is the unbounded path."""
    if hops < 1 or hops > 4:
        raise ValueError(f"hops must be in [1, 4], got {hops}")
    from ..functions.bounded import collect_bounded

    sym = _symmetrize(edges, u=u, v=v)
    rows = collect_bounded(
        sym.materialize(), max_edges,
        "use the Dataset plan (harmonic_centrality) or raise "
        "max_edges")
    a = np.array([r["u"] for r in rows], np.int64)
    b = np.array([r["v"] for r in rows], np.int64)
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ai, bi = inv[:len(a)], inv[len(a):]
    n = len(nodes)
    order = np.argsort(ai, kind="stable")
    ai_s, bi_s = ai[order], bi[order]
    indptr = np.searchsorted(ai_s, np.arange(n + 1))
    h12 = np.zeros(n, np.int64)
    reach = np.zeros(n, np.int64)
    for s in range(n):
        dist = np.full(n, -1, np.int64)
        dist[s] = 0
        frontier = np.array([s], np.int64)
        for d in range(1, hops + 1):
            nxt = []
            for x in frontier:
                nb = bi_s[indptr[x]:indptr[x + 1]]
                nb = nb[dist[nb] < 0]
                dist[nb] = d
                nxt.append(nb)
            frontier = (np.unique(np.concatenate(nxt))
                        if nxt else np.array([], np.int64))
            if len(frontier) == 0:
                break
        m = dist >= 1
        h12[s] = int((12 // dist[m]).sum())
        reach[s] = int(m.sum())
    keep = reach > 0
    return ray.data.from_arrow(pa.table({
        "node": pa.array(nodes[keep]),
        "harmonic_x12": pa.array(h12[keep]),
        "n_reached": pa.array(reach[keep])}))
