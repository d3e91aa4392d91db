"""Distributed triangle counting — the graph-analytics primitive for
community density (clustering coefficients, spam-ring detection)
beyond what PageRank (rank.py) and components (cluster.py) measure.

Node-iterator algorithm with the min-node orientation:

1. Edges arrive distinct with ``u < v`` (one canonical row per edge).
2. **Wedges**: one groupby over the apex ``u`` emits every neighbor
   pair ``(w1 < w2)`` — a triangle ``(a < b < c)`` is generated
   EXACTLY once, at its minimum corner ``a``.  The apex group is
   bounded by max degree; at web scale orient edges by degree
   (lower-degree endpoint as apex) so no apex exceeds √(2|E|)
   neighbors — the standard Schank–Wagner bound.
3. **Close**: wedges semi-join the edge set on the composite
   ``(w1, w2)`` key (:func:`..stages.join.shuffle_join` — one bounded
   exchange; the edge set never broadcasts).
4. **Count**: each closed wedge explodes to its 3 corners and one
   groupby counts per-node triangle memberships.

The whole chain is hash-verified against a DuckDB 3-way self-join
oracle (``triangles`` query).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Count, Min, Sum

from ..functions.rounding import round_half_away
from .join import shuffle_join

_SEP = "\x1f"


#: coarse shuffle key for per-bucket pair emission: Ray-level groups
#: are these partitions (each holding many buckets), not the millions
#: of individual buckets — the `blocking.PAIR_PARTITIONS` lesson: a
#: per-bucket map_groups pays scheduler+pandas overhead per BUCKET,
#: which dominates once buckets shrink to a handful of members
COPAIR_PARTITIONS = 64


def _segmented_full_pairs(df: pd.DataFrame, bucket_col: str,
                          entity_col: str,
                          weighted: bool = False) -> pa.Table:
    """All within-bucket entity pairs (u < v) across MANY buckets in
    one vectorized call; ``weighted`` adds the Adamic–Adar
    1/ln(bucket size) column.  Returns an ARROW table so the pair
    stream rides Arrow blocks into the downstream pair groupby —
    Ray's sort/aggregate on pandas blocks measured ~20× slower than
    on Arrow blocks at 10^6 pairs."""
    df = (df[[bucket_col, entity_col]].drop_duplicates()
          .sort_values([bucket_col, entity_col], kind="stable"))
    sizes = df.groupby(bucket_col, sort=False).size().to_numpy()
    ents = df[entity_col].to_numpy()
    iu_parts, ju_parts, w_parts = [], [], []
    start = 0
    for g in sizes:
        g = int(g)
        if g >= 2:
            i, j = np.triu_indices(g, k=1)
            iu_parts.append(i + start)
            ju_parts.append(j + start)
            if weighted:
                w_parts.append(np.full(len(i), 1.0 / np.log(g)))
        start += g
    if not iu_parts:
        cols = {"u": pa.array([], pa.int64()),
                "v": pa.array([], pa.int64())}
        if weighted:
            cols["w"] = pa.array([], pa.float64())
        return pa.table(cols)
    iu = np.concatenate(iu_parts)
    ju = np.concatenate(ju_parts)
    out = {"u": pa.array(ents[iu]), "v": pa.array(ents[ju])}
    if weighted:
        out["w"] = pa.array(np.concatenate(w_parts))
    return pa.table(out)


def cooccurrence_edges(ds: "ray.data.Dataset", *, entity_col: str,
                       bucket_col: str) -> "ray.data.Dataset":
    """→ distinct (u, v) edges (u < v) linking entities that share a
    bucket value — the co-activity / co-occurrence graph constructor.
    A bucket's group must fit a worker (bound the bucket width
    upstream; a hot bucket is the skew risk to salt).

    Buckets ride ``COPAIR_PARTITIONS`` coarse hash partitions — pair
    emission is one vectorized call over ALL of a partition's buckets,
    never a per-bucket task (per-bucket scheduling dominated wall time
    once buckets shrank to a handful of members)."""

    def add_part(t: pa.Table) -> pa.Table:
        b = t.column(bucket_col).to_numpy(zero_copy_only=False)
        part = (b.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                >> np.uint64(58)).astype(np.int32)
        return t.append_column("_part", pa.array(part))

    def partition_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return _segmented_full_pairs(g, bucket_col, entity_col)

    pairs = (ds.map_batches(add_part, batch_format="pyarrow")
             .groupby("_part")
             .map_groups(partition_pairs, batch_format="pandas"))
    # dedup pairs co-occurring in several buckets: one groupby on the pair
    return (pairs.groupby(["u", "v"]).aggregate(Count(alias_name="_n"))
            .select_columns(["u", "v"]))


def common_neighbor_pairs(ds: "ray.data.Dataset", *, entity_col: str,
                          bucket_col: str, k: int = 20,
                          weight: str = "count") -> "ray.data.Dataset":
    """→ top-k entity pairs ranked by shared buckets — link prediction
    over the bipartite entity↔bucket graph (suppliers sharing parts,
    users sharing sessions).  ``weight="count"`` scores plain
    common-neighbor counts → (u, v, n_common); ``weight="adamic_adar"``
    down-weights popular buckets by 1/ln(bucket size) → (u, v, aa)
    rounded to 6dp (Adamic–Adar 2003 — a mega-bucket contributes
    almost nothing, a 2-member bucket is strong evidence).
    Deterministic ties: (score DESC, u, v).

    Plan: per-block distinct (bucket, entity) combiner → one groupby
    dedups memberships → per-bucket pair emission (same bounded-bucket
    contract as :func:`cooccurrence_edges` — salt or cap hot buckets
    upstream; the 1/ln weight is a per-group scalar) → score groupby →
    per-block partial top-k combiner so the final sort ranks only ≤ k
    rows per block, never the full pair table.
    """
    import pyarrow.compute as pc

    if weight not in ("count", "adamic_adar", "jaccard"):
        raise ValueError(f"weight must be 'count', 'adamic_adar' or "
                         f"'jaccard', got {weight!r}")
    score_col = {"count": "n_common", "adamic_adar": "aa",
                 "jaccard": "jac"}[weight]

    def local_distinct(t: pa.Table) -> pa.Table:
        df = t.to_pandas()[[bucket_col, entity_col]].drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    members = (ds.map_batches(local_distinct, batch_format="pyarrow")
               .groupby([bucket_col, entity_col])
               .aggregate(Count(alias_name="_n"))
               .select_columns([bucket_col, entity_col]))
    if weight == "jaccard":
        # the jaccard branch consumes `members` TWICE (pair stream +
        # degree census); a lazy Dataset re-executes its whole
        # upstream per consumer (repo invariant — the r2 minhash
        # regression class), so pin the distinct memberships once
        members = members.materialize()

    def add_part(t: pa.Table) -> pa.Table:
        b = t.column(bucket_col).to_numpy(zero_copy_only=False)
        part = (b.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                >> np.uint64(58)).astype(np.int32)
        return t.append_column("_part", pa.array(part))

    def partition_pairs(g: pd.DataFrame) -> pa.Table:
        out = _segmented_full_pairs(g, bucket_col, entity_col,
                                    weighted=(weight == "adamic_adar"))
        if weight != "adamic_adar":
            out = out.append_column(
                "w", pa.array(np.ones(out.num_rows)))
        return out

    # coarse partitions, not per-bucket groups — see cooccurrence_edges
    summed = (members.map_batches(add_part, batch_format="pyarrow")
              .groupby("_part")
              .map_groups(partition_pairs, batch_format="pandas")
              .groupby(["u", "v"])
              .aggregate(Sum("w", alias_name="w")))

    if weight == "jaccard":
        # J(u, v) = c / (deg_u + deg_v − c) over distinct bucket
        # memberships: the degree census decorates the pair stream
        # via two hash-partitioned shuffle_joins (never a driver
        # broadcast — entities are unbounded at web scale)
        def as_deg(t: pa.Table) -> pa.Table:
            return pa.table({"_e": t.column(entity_col),
                             "_d": t.column("_d")})

        deg = (members.groupby(entity_col)
               .aggregate(Count(alias_name="_d"))
               .map_batches(as_deg, batch_format="pyarrow"))
        withu = shuffle_join(
            summed, deg, "u", "_e", 16,
            project=lambda m: pd.DataFrame({
                "u": m["u"], "v": m["v"], "w": m["w"],
                "du": m["_d"]}))
        withv = shuffle_join(
            withu, deg, "v", "_e", 16,
            project=lambda m: pd.DataFrame({
                "u": m["u"], "v": m["v"], "w": m["w"],
                "du": m["du"], "dv": m["_d"]}))

        def jfinish(t: pa.Table) -> pa.Table:
            c = t.column("w").to_numpy(zero_copy_only=False)
            du = (t.column("du").to_numpy(zero_copy_only=False)
                  .astype(np.int64))
            dv = (t.column("dv").to_numpy(zero_copy_only=False)
                  .astype(np.int64))
            return pa.table({
                "u": t.column("u"), "v": t.column("v"),
                score_col: pa.array(
                    round_half_away(c / (du + dv - c), 6))})

        scores = withv.map_batches(jfinish, batch_format="pyarrow")
    else:
        def finish(t: pa.Table) -> pa.Table:
            w = t.column("w").to_numpy(zero_copy_only=False)
            if weight == "count":
                col = pa.array(np.round(w).astype(np.int64))
            else:
                col = pa.array(np.round(w, 6))
            return pa.table({"u": t.column("u"), "v": t.column("v"),
                             score_col: col})

        scores = summed.map_batches(finish, batch_format="pyarrow")

    def partial_topk(t: pa.Table) -> pa.Table:
        idx = pc.select_k_unstable(
            t, k=min(k, t.num_rows),
            sort_keys=[(score_col, "descending"), ("u", "ascending"),
                       ("v", "ascending")])
        return t.take(idx)

    return (scores.map_batches(partial_topk, batch_format="pyarrow")
            .sort([score_col, "u", "v"],
                  descending=[True, False, False])
            .limit(k))


def triangle_counts(edges: "ray.data.Dataset", *, u: str = "u",
                    v: str = "v",
                    num_partitions: int = 32) -> "ray.data.Dataset":
    """→ (node, n_triangles) for every node in ≥ 1 triangle.  ``edges``
    must be distinct with ``u < v`` (as :func:`cooccurrence_edges`
    emits).  See module doc for the plan."""
    # consumed twice below (wedge stream + edge-key stream): pin the
    # edge set so a lazy upstream (cooccurrence build) runs once
    edges = edges.materialize()

    def wedges(g: pd.DataFrame) -> pa.Table:
        vs = np.sort(g[v].to_numpy())
        if len(vs) < 2:
            return pa.table({"apex": pa.array([], pa.int64()),
                             "w1": pa.array([], pa.int64()),
                             "w2": pa.array([], pa.int64()),
                             "key": pa.array([], pa.string())})
        i, j = np.triu_indices(len(vs), k=1)
        w1, w2 = vs[i], vs[j]
        key = (pd.Series(w1).astype(str) + _SEP
               + pd.Series(w2).astype(str))
        return pa.table({
            "apex": pa.array(np.repeat(g[u].to_numpy()[:1], len(i))),
            "w1": pa.array(w1), "w2": pa.array(w2),
            "key": pa.array(key, pa.string())})

    wedge_ds = edges.groupby(u).map_groups(wedges,
                                           batch_format="pandas")

    def edge_keys(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        return pa.table({"key": pa.array(
            df[u].astype(str) + _SEP + df[v].astype(str),
            pa.string())})

    ekeys = edges.map_batches(edge_keys, batch_format="pyarrow")
    closed = shuffle_join(wedge_ds, ekeys, "key", "key",
                          num_partitions, how="semi")

    def corners(t: pa.Table) -> pa.Table:
        a = t.column("apex").to_numpy(zero_copy_only=False)
        b = t.column("w1").to_numpy(zero_copy_only=False)
        c = t.column("w2").to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(
            np.concatenate([a, b, c]).astype(np.int64))})

    out = (closed.map_batches(corners, batch_format="pyarrow")
           .groupby("node").aggregate(Count(alias_name="n_triangles")))
    # a triangle-free graph leaves every stage empty and the Dataset
    # schema-less — union ONE typed empty block so downstream schema
    # contracts (and the driver's schema compare) survive zero rows
    empty = pa.schema([("node", pa.int64()),
                       ("n_triangles", pa.int64())]).empty_table()
    return out.union(ray.data.from_arrow(empty))


def coreness(edges: "ray.data.Dataset", *, u: str = "u", v: str = "v",
             rounds: int = 8,
             num_partitions: int = 16) -> "ray.data.Dataset":
    """→ (node, core): the FULL k-core decomposition — every node's
    core number at once, where :func:`k_core` answers one fixed k —
    via the distributed h-index fixpoint (Montresor, De Pellegrini &
    Miorandi 2013): c_0(v) = deg(v), then synchronously
    c_{i+1}(v) = H({c_i(u) : u ∈ N(v)}) with H the h-index (the
    largest h with ≥ h neighbors at value ≥ h).  The iterate is
    monotone non-increasing and its fixpoint IS the coreness;
    ``rounds`` is part of the operator contract exactly like
    ``bfs_hops``' hop cap (the SQL oracle replays the same unrolled
    rounds; the networkx golden test pins that the default converges
    on the gated graphs — extra rounds past the fixpoint are
    idempotent).

    Per round: ONE :func:`..stages.join.shuffle_join` routes each
    node's value along the symmetrized edges, then all nodes in a
    coarse partition resolve their h-index together in one sorted
    numpy pass (rank-vs-value min, segment max) — never a per-node
    task.  Values only ever decrease, so early rounds dominate the
    work and the exchange carries one int64 per edge."""

    def sym(t: pa.Table) -> pa.Table:
        a = t.column(u).to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column(v).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"u": pa.array(np.concatenate([a, b])),
                         "v": pa.array(np.concatenate([b, a]))})

    s = edges.map_batches(sym, batch_format="pyarrow").materialize()

    def degrees(t: pa.Table) -> pa.Table:
        vals, c = np.unique(t.column("u").to_numpy(
            zero_copy_only=False), return_counts=True)
        return pa.table({"node": pa.array(vals.astype(np.int64)),
                         "c": pa.array(c.astype(np.int64))})

    cur = (s.map_batches(degrees, batch_format="pyarrow")
           .groupby("node").aggregate(Sum("c", alias_name="c"))
           .materialize())

    def hindex(g: pd.DataFrame) -> pa.Table:
        # h-index for EVERY node in the partition at once: sort by
        # (node, value DESC), h(v) = max_j min(j, value_j)
        g = g.sort_values(["n", "cv"], ascending=[True, False],
                          kind="stable")
        n = g["n"].to_numpy(np.int64)
        cv = g["cv"].to_numpy(np.int64)
        starts = np.flatnonzero(np.r_[True, n[1:] != n[:-1]])
        sizes = np.diff(np.r_[starts, len(n)])
        rank = np.arange(len(n)) - np.repeat(starts, sizes) + 1
        mn = np.minimum(rank, cv)
        h = np.maximum.reduceat(mn, starts)
        return pa.table({"node": pa.array(n[starts]),
                         "c": pa.array(h.astype(np.int64))})

    for _ in range(rounds):
        nb = shuffle_join(
            s, cur, "v", "node", num_partitions,
            project=lambda m: pd.DataFrame({"n": m["u"],
                                            "cv": m["c"]}))

        def part(t: pa.Table) -> pa.Table:
            n = t.column("n").to_numpy(zero_copy_only=False)
            p = (n.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                 >> np.uint64(58)).astype(np.int32)
            return t.append_column("_p", pa.array(p))

        cur = (nb.map_batches(part, batch_format="pyarrow")
               .groupby("_p").map_groups(hindex,
                                         batch_format="pandas")
               .repartition(num_partitions).materialize())

    def out(t: pa.Table) -> pa.Table:
        return pa.table({"node": t.column("node"),
                         "core": t.column("c")})

    empty = pa.schema([("node", pa.int64()),
                       ("core", pa.int64())]).empty_table()
    return (cur.map_batches(out, batch_format="pyarrow")
            .union(ray.data.from_arrow(empty)))


def densest_subgraph(edges: "ray.data.Dataset", *, u: str = "u",
                     v: str = "v", max_rounds: int = 40,
                     num_partitions: int = 16,
                     broadcast_max: int = 2_000_000
                     ) -> "ray.data.Dataset":
    """→ (node, d) — the nodes (with in-subgraph degree) of the
    densest round of the PARALLEL greedy peel (Bahmani–Kumar–
    Vattani 2012, ε = 1/2): each round drops EVERY node whose degree
    is ≤ 2(1+ε)·ρ = 3·|E|/|V| of the current subgraph, a
    2(1+ε) = 3-approximation of the maximum-density subgraph in
    O(log n) rounds.  Deterministic: the drop test and the
    across-round argmax both compare exact integers (d·2N ≤ 3·M and
    M_i·N_j vs M_j·N_i with M = 2|E|), ties → the EARLIEST round, so
    the unrolled SQL replay value-hashes.  ``edges`` distinct with
    ``u < v``.

    Per round: one degree groupby over the symmetrized survivors, a
    (N, M) scalar census, and one drop-set edge scan — the drop set
    stays a MATERIALIZED ``(node,)`` Dataset and :func:`_apply_drop`
    picks the physical plan by its size (broadcast ≤ ``broadcast_max``
    rows, anti ``shuffle_join`` on both endpoints above — a peel's
    first round can drop ~half the graph, so the set must never be
    required to fit on the driver).  Each round's edge set is
    re-materialized with a pinned partition count; the best round is
    recomputed from its pinned edge set at the end — O(log n)
    materialized rounds live at once (re-derive from the round index
    in two passes if memory-bound)."""
    cur = edges.select_columns([u, v]).materialize()
    rounds: list = []          # (N_i, M_i, pinned edge Dataset)
    for _ in range(max_rounds):
        def degrees(t: pa.Table) -> pa.Table:
            n = np.concatenate([
                t.column(u).to_numpy(zero_copy_only=False),
                t.column(v).to_numpy(zero_copy_only=False)])
            vals, c = np.unique(n, return_counts=True)
            return pa.table({"node": pa.array(vals.astype(np.int64)),
                             "d": pa.array(c.astype(np.int64))})

        deg = (cur.map_batches(degrees, batch_format="pyarrow")
               .groupby("node").aggregate(Sum("d", alias_name="d"))
               .materialize())
        n_nodes = deg.count()
        if n_nodes == 0:
            break
        m2 = 2 * cur.count()   # M = Σ degrees = 2|E|, exact
        rounds.append((n_nodes, m2, cur, deg))
        # drop: d·2N ≤ 3·M ⟺ d ≤ ⌊3M/(2N)⌋ (d integral) — exact
        thr = (3 * m2) // (2 * n_nodes)

        def below_thr(t: pa.Table, lim=thr) -> pa.Table:
            # typed (node,) map — see k_core's below_k for why a
            # Filter->Project chain cannot feed the anti-join here
            d = t.column("d").to_numpy(zero_copy_only=False)
            nd = t.column("node").to_numpy(zero_copy_only=False)
            return pa.table({"node": pa.array(
                nd[d <= lim].astype(np.int64))})

        low = (deg.map_batches(below_thr, batch_format="pyarrow")
               .materialize())
        n_low = low.count()
        if n_low == 0:
            # cannot happen (min degree ≤ average ≤ 3/2·average) —
            # guard against an infinite loop anyway
            break
        cur = (_apply_drop(cur, low, n_low, broadcast_max, u, v,
                           num_partitions)
               .repartition(num_partitions).materialize())
    empty = pa.schema([("node", pa.int64()),
                       ("d", pa.int64())]).empty_table()
    if not rounds:
        return ray.data.from_arrow(empty)
    # exact across-round argmax of M_i/(2·N_i): cross-multiplied
    # integer compare, ties → earliest round
    best = 0
    for i in range(1, len(rounds)):
        ni, mi = rounds[i][0], rounds[i][1]
        nb, mb = rounds[best][0], rounds[best][1]
        if mi * nb > mb * ni:
            best = i
    return rounds[best][3].union(ray.data.from_arrow(empty))


def rich_club(edges: "ray.data.Dataset", *, u: str = "u",
              v: str = "v", max_k: int = 8,
              num_partitions: int = 16) -> "ray.data.Dataset":
    """→ (k, n_k, e_k, phi) for k = 0..max_k: the rich-club
    coefficient φ(k) = 2·E_k / (N_k·(N_k−1)) — how densely the
    nodes of degree > k connect among THEMSELVES (Zhou & Mondragón
    2004; 0.0 when fewer than two such nodes).  ``edges`` distinct
    with ``u < v``.

    Plan: endpoint-explode degree census → the census decorates the
    edge stream via two hash-partitioned :func:`shuffle_join`\\ s
    (never a driver broadcast of the node domain) → per-edge
    min-degree CLIPPED at max_k+1 so the histogram the driver folds
    has ≤ max_k+2 bins regardless of the true degree range; all
    counts exact int64, the single float division last."""
    # edges feeds both the degree census and the join stream, and
    # deg feeds both joins and the node histogram: pin each once
    edges = edges.select_columns([u, v]).materialize()

    def degrees(t: pa.Table) -> pa.Table:
        n = np.concatenate([
            t.column(u).to_numpy(zero_copy_only=False),
            t.column(v).to_numpy(zero_copy_only=False)])
        vals, c = np.unique(n, return_counts=True)
        return pa.table({"node": pa.array(vals.astype(np.int64)),
                         "d": pa.array(c.astype(np.int64))})

    deg = (edges.map_batches(degrees, batch_format="pyarrow")
           .groupby("node").aggregate(Sum("d", alias_name="d"))
           .materialize())
    cap = max_k + 1

    withu = shuffle_join(
        edges, deg, u, "node", num_partitions,
        project=lambda m: pd.DataFrame({
            "v": m[v], "du": m["d"]}))
    withv = shuffle_join(
        withu, deg, "v", "node", num_partitions,
        project=lambda m, c=cap: pd.DataFrame({
            "md": np.minimum(np.minimum(m["du"].to_numpy(np.int64),
                                        m["d"].to_numpy(np.int64)),
                             c)}))

    def ehist(t: pa.Table) -> pa.Table:
        md = t.column("md").to_numpy(zero_copy_only=False)
        vals, c = np.unique(md, return_counts=True)
        return pa.table({"md": pa.array(vals.astype(np.int64)),
                         "c": pa.array(c.astype(np.int64))})

    def nhist(t: pa.Table) -> pa.Table:
        d = np.minimum(t.column("d").to_numpy(zero_copy_only=False),
                       cap)
        vals, c = np.unique(d, return_counts=True)
        return pa.table({"d": pa.array(vals.astype(np.int64)),
                         "c": pa.array(c.astype(np.int64))})

    # two bounded histograms (≤ max_k+2 bins each) fold on the driver
    e_parts = withv.map_batches(ehist, batch_format="pyarrow").take_all()
    n_parts = deg.map_batches(nhist, batch_format="pyarrow").take_all()
    e_by_md: dict[int, int] = {}
    for r in e_parts:
        e_by_md[r["md"]] = e_by_md.get(r["md"], 0) + r["c"]
    n_by_d: dict[int, int] = {}
    for r in n_parts:
        n_by_d[r["d"]] = n_by_d.get(r["d"], 0) + r["c"]
    ks = np.arange(max_k + 1, dtype=np.int64)
    e_k = np.array([sum(c for md, c in e_by_md.items() if md > k)
                    for k in ks], np.int64)
    n_k = np.array([sum(c for d, c in n_by_d.items() if d > k)
                    for k in ks], np.int64)
    phi = np.where(n_k >= 2,
                   round_half_away(
                       2.0 * e_k / np.maximum(n_k * (n_k - 1), 1), 6),
                   0.0)
    return ray.data.from_arrow(pa.table({
        "k": pa.array(ks), "n_k": pa.array(n_k),
        "e_k": pa.array(e_k), "phi": pa.array(phi)}))


def four_cycle_count(edges: "ray.data.Dataset", *, u: str = "u",
                     v: str = "v") -> "ray.data.Dataset":
    """→ one row (n_codeg_pairs, n_quad_pairs, c4): the exact global
    4-cycle census — c4 = ½·Σ_{x<z} C(codeg(x, z), 2), where codeg is
    the common-neighbor count (each quadrilateral is seen once from
    each of its two diagonals; K4 sanity: 6 pairs × C(2,2) = 6 → 3
    quads).  ``edges`` distinct with ``u < v``.

    Plan: symmetrize, then the (mid, neighbor) table IS a bucket
    table — per-mid neighbor pairs via the same coarse-partition
    segmented emission as :func:`cooccurrence_edges` (never a
    per-mid task), one (x, z) count groupby for codegrees, one
    integer partial-sum finish.  A hub mid emits deg² wedges — at
    web scale orient by degree or salt hot mids exactly as the
    triangle plan does; counts here stay exact under any split
    because codeg sums over mids."""

    def sym(t: pa.Table) -> pa.Table:
        a = t.column(u).to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column(v).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"mid": pa.array(np.concatenate([a, b])),
                         "nb": pa.array(np.concatenate([b, a]))})

    def add_part(t: pa.Table) -> pa.Table:
        m = t.column("mid").to_numpy(zero_copy_only=False)
        part = (m.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                >> np.uint64(58)).astype(np.int32)
        return t.append_column("_part", pa.array(part))

    def partition_pairs(g: pd.DataFrame) -> pa.Table:
        return _segmented_full_pairs(g, "mid", "nb")

    codeg = (edges.map_batches(sym, batch_format="pyarrow")
             .map_batches(add_part, batch_format="pyarrow")
             .groupby("_part")
             .map_groups(partition_pairs, batch_format="pandas")
             .groupby(["u", "v"]).aggregate(Count(alias_name="c")))

    def partial(t: pa.Table) -> pa.Table:
        c = t.column("c").to_numpy(zero_copy_only=False)
        return pa.table({
            "n_codeg_pairs": pa.array([len(c)], pa.int64()),
            "n_quad_pairs": pa.array([int((c * (c - 1) // 2).sum())],
                                     pa.int64())})

    # per-block int64 partials fold on the driver (blocks × 2 ints)
    parts = codeg.map_batches(partial, batch_format="pyarrow").take_all()
    n_pairs = sum(r["n_codeg_pairs"] for r in parts)
    n_quad = sum(r["n_quad_pairs"] for r in parts)
    return ray.data.from_arrow(pa.table({
        "n_codeg_pairs": pa.array([n_pairs], pa.int64()),
        "n_quad_pairs": pa.array([n_quad], pa.int64()),
        "c4": pa.array([n_quad // 2], pa.int64())}))


def clustering_coefficient(edges: "ray.data.Dataset", *, u: str = "u",
                           v: str = "v",
                           num_partitions: int = 32
                           ) -> "ray.data.Dataset":
    """→ (node, deg, n_tri, cc): local clustering coefficient
    cc = 2·T(n) / (deg·(deg−1)) for every node (0.0 when deg < 2),
    rounded 6dp — the per-node community-density score the global
    triangle census doesn't give.  ``edges`` must be distinct with
    ``u < v`` (as :func:`cooccurrence_edges` emits).

    Two exact integer legs reusing the existing machinery — degrees
    from one endpoint-explode groupby, triangles from
    :func:`triangle_counts` (min-corner wedge plan) — stitched with
    ONE empty-partition-safe left :func:`..stages.join.shuffle_join`;
    triangle-free nodes coalesce to 0.  The single float division
    happens last, so the 6dp value replays bit-stable in SQL."""
    # consumed twice (degree census + triangle census): pin once so
    # the lazy cooccurrence upstream doesn't re-execute per consumer
    edges = edges.materialize()

    def degrees(t: pa.Table) -> pa.Table:
        n = np.concatenate([
            t.column(u).to_numpy(zero_copy_only=False),
            t.column(v).to_numpy(zero_copy_only=False)])
        vals, c = np.unique(n, return_counts=True)
        return pa.table({"node": pa.array(vals.astype(np.int64)),
                         "d": pa.array(c.astype(np.int64))})

    deg = (edges.map_batches(degrees, batch_format="pyarrow")
           .groupby("node").aggregate(Sum("d", alias_name="deg")))
    tri = triangle_counts(edges, u=u, v=v,
                          num_partitions=num_partitions)

    def finish(m: pd.DataFrame) -> pd.DataFrame:
        d = m["deg"].to_numpy(np.int64)
        t = np.nan_to_num(m["n_triangles"].to_numpy(np.float64),
                          nan=0.0).astype(np.int64)
        wedges = d * (d - 1)
        # half-away 6dp: 2t/(d(d-1)) is rational and can hit a
        # dyadic tie where np.round diverges from DuckDB's round
        cc = np.where(wedges > 0, round_half_away(
            2.0 * t / np.maximum(wedges, 1), 6), 0.0)
        return pd.DataFrame({"node": m["node"].to_numpy(np.int64),
                             "deg": d, "n_tri": t, "cc": cc})

    return shuffle_join(deg, tri, "node", "node", num_partitions,
                        project=finish, how="left")


def _drop_incident(cur: "ray.data.Dataset", drop: "ray.data.Dataset",
                   u: str, v: str,
                   num_partitions: int) -> "ray.data.Dataset":
    """Edges of ``cur`` with NEITHER endpoint in ``drop`` (a
    ``(node,)`` Dataset): two empty-partition-safe anti
    :func:`..stages.join.shuffle_join`\\ s — the Dataset-set plan the
    peel/fixpoint loops use when a round's drop set is too large to
    broadcast (the ``bfs_hops`` visited-set pattern)."""
    cur = shuffle_join(cur, drop, u, "node", num_partitions,
                       how="anti")
    return shuffle_join(cur, drop, v, "node", num_partitions,
                        how="anti")


def _apply_drop(cur: "ray.data.Dataset", drop: "ray.data.Dataset",
                n_drop: int, broadcast_max: int, u: str, v: str,
                num_partitions: int) -> "ray.data.Dataset":
    """Remove every edge incident to ``drop``, choosing the physical
    plan by the drop set's size: ≤ ``broadcast_max`` rows collect once
    and ride a ``ray.put`` + ``np.isin`` stateless scan (one pass, no
    shuffle); above it the set stays a Dataset and anti-joins both
    endpoints (:func:`_drop_incident`) — constant driver memory at any
    scale.  Both plans are output-identical (parity pytest-pinned)."""
    if n_drop <= broadcast_max:
        bad_nodes = np.array([r["node"] for r in drop.take_all()],
                             dtype=np.int64)
        bad_ref = ray.put(bad_nodes)

        def keep(t: pa.Table) -> pa.Table:
            bad = ray.get(bad_ref)
            a = t.column(u).to_numpy(zero_copy_only=False)
            b = t.column(v).to_numpy(zero_copy_only=False)
            m = ~(np.isin(a, bad) | np.isin(b, bad))
            return t.filter(pa.array(m))

        return cur.map_batches(keep, batch_format="pyarrow")
    return _drop_incident(cur, drop, u, v, num_partitions)


def k_core(edges: "ray.data.Dataset", *, k: int, u: str = "u",
           v: str = "v", max_rounds: int = 100,
           num_partitions: int = 16,
           broadcast_max: int = 2_000_000) -> "ray.data.Dataset":
    """→ (node, degree) for every node of the k-core: the maximal
    subgraph where every node keeps degree >= k after all lower-degree
    nodes are recursively peeled away — the dense-community extractor
    (spam rings, collusion cliques) that a single degree filter
    misses.  ``edges`` must be distinct with ``u < v``.

    Iterative peel, each round ONE degree groupby over the surviving
    edge set.  Nodes under ``k`` form the round's drop set — a
    MATERIALIZED ``(node,)`` Dataset that never has to fit on the
    driver: :func:`_apply_drop` broadcasts it only while it counts
    ≤ ``broadcast_max`` rows and otherwise anti-``shuffle_join``\\ s
    both endpoints (round 1 of a peel can drop ~half the graph — the
    O(N) driver collect this plan replaces).  The surviving edge set
    is re-materialized per round with a pinned partition count — the
    closure-loop invariant that stops block counts compounding.
    Terminates when no node falls below ``k`` (fixed point; ≤ |V|
    rounds, in practice a handful).
    """
    cur = edges.select_columns([u, v]).materialize()
    for _ in range(max_rounds):
        if cur.count() == 0:
            break

        def degrees(t: pa.Table) -> pa.Table:
            n = np.concatenate([
                t.column(u).to_numpy(zero_copy_only=False),
                t.column(v).to_numpy(zero_copy_only=False)])
            vals, c = np.unique(n, return_counts=True)
            return pa.table({"node": pa.array(vals.astype(np.int64)),
                             "d": pa.array(c.astype(np.int64))})

        deg = (cur.map_batches(degrees, batch_format="pyarrow")
               .groupby("node").aggregate(Sum("d", alias_name="d"))
               .materialize())   # consumed twice: low filter + output

        def below_k(t: pa.Table) -> pa.Table:
            # one map emitting TYPED (node,) tables — a fused
            # Filter->Project emits schema-unstable bundles on empty
            # partitions, which poisons the downstream shuffle_join's
            # captured column lists (observed: KeyError 'd' at 32
            # CPUs; map_batches output schema is deterministic)
            d = t.column("d").to_numpy(zero_copy_only=False)
            nd = t.column("node").to_numpy(zero_copy_only=False)
            return pa.table({"node": pa.array(
                nd[d < k].astype(np.int64))})

        low = (deg.map_batches(below_k, batch_format="pyarrow")
               .materialize())
        n_low = low.count()
        if n_low == 0:
            out = deg.filter(expr=f"d >= {k}").rename_columns(
                {"d": "degree"})
            empty = pa.schema([("node", pa.int64()),
                               ("degree", pa.int64())]).empty_table()
            return out.union(ray.data.from_arrow(empty)).materialize()
        cur = (_apply_drop(cur, low, n_low, broadcast_max, u, v,
                           num_partitions)
               .repartition(num_partitions).materialize())
    empty = pa.schema([("node", pa.int64()),
                       ("degree", pa.int64())]).empty_table()
    return ray.data.from_arrow(empty)


def bfs_hops(edges: "ray.data.Dataset", *, source: int,
             u: str = "u", v: str = "v", max_hops: int = 8,
             num_partitions: int = 16) -> "ray.data.Dataset":
    """→ (node, dist): minimum hop distance from ``source`` for every
    node within ``max_hops`` — distributed breadth-first search as an
    iterative frontier expansion, the single-source primitive under
    "within-k-hops" features (fraud rings, affiliate networks).

    ``edges`` must be distinct with ``u < v``; traversal is
    undirected.  Per round: the frontier semi-joins the symmetrized
    edge set (:func:`..stages.join.shuffle_join` — the frontier never
    broadcasts), new nodes anti-join the visited table, and both
    tables re-materialize with a pinned partition count (the
    closure-loop invariant).  Rounds stop at an empty frontier or
    ``max_hops`` — the SQL oracle replays the same cap in its
    recursive CTE, so reached-set AND distances hash-match.
    """
    def sym(t: pa.Table) -> pa.Table:
        a = t.column(u).to_numpy(zero_copy_only=False)
        b = t.column(v).to_numpy(zero_copy_only=False)
        return pa.table({
            "src": pa.array(np.concatenate([a, b]).astype(np.int64)),
            "dst": pa.array(np.concatenate([b, a]).astype(np.int64))})

    esym = (edges.map_batches(sym, batch_format="pyarrow")
            .repartition(num_partitions).materialize())

    start = pa.table({"node": pa.array([source], pa.int64()),
                      "dist": pa.array([0], pa.int64())})
    visited = ray.data.from_arrow(start).materialize()
    frontier = ray.data.from_arrow(
        pa.table({"node": pa.array([source], pa.int64())}))

    for d in range(1, max_hops + 1):
        reached = shuffle_join(
            esym, frontier, "src", "node", num_partitions,
            how="semi")

        def dsts(t: pa.Table) -> pa.Table:
            vals = np.unique(t.column("dst").to_numpy(
                zero_copy_only=False))
            return pa.table({"node": pa.array(vals.astype(np.int64))})

        cand = (reached.map_batches(dsts, batch_format="pyarrow")
                .groupby("node").aggregate(Count(alias_name="_n"))
                .select_columns(["node"]))
        fresh = shuffle_join(cand, visited, "node", "node",
                             num_partitions, how="anti")

        def stamp(t: pa.Table) -> pa.Table:
            return pa.table({
                "node": t.column("node"),
                "dist": pa.array(np.full(t.num_rows, d, np.int64))})

        fresh = (fresh.map_batches(stamp, batch_format="pyarrow")
                 .repartition(num_partitions).materialize())
        if fresh.count() == 0:
            break
        visited = (visited.union(fresh)
                   .repartition(num_partitions).materialize())
        frontier = fresh.select_columns(["node"])
    return visited


def k_truss(edges: "ray.data.Dataset", *, k: int, u: str = "u",
            v: str = "v", max_rounds: int = 100,
            num_partitions: int = 16) -> "ray.data.Dataset":
    """→ (u, v, support): the k-truss — the maximal subgraph whose
    EVERY edge closes ≥ k−2 triangles inside the subgraph (Cohen
    2008; a strictly denser community notion than the k-core, which
    only constrains degrees).  ``support`` is the edge's triangle
    count in the final truss.  ``edges`` must be distinct with
    ``u < v``.

    Iterative peel; each round re-derives per-edge support over the
    SURVIVING edge set with the same min-corner wedge plan as
    :func:`triangle_counts` (one apex groupby → wedge semi-join on the
    edge key → each closed wedge credits its 3 edges → one key
    groupby), then one semi shuffle_join keeps edges at/above
    threshold.  The edge set re-materializes per round with a pinned
    partition count (closure-loop invariant).  Terminates at the
    fixpoint — every round that continues removes ≥ 1 edge.  Golden:
    ``networkx.k_truss`` edge-set equality (tests/test_triangle.py).
    """
    if k < 3:
        # k−2 ≤ 0 would keep triangle-free edges, which the
        # support-join plan (inner on credited keys) cannot represent
        raise ValueError(f"k must be >= 3, got {k}")
    empty = pa.schema([("u", pa.int64()), ("v", pa.int64()),
                       ("support", pa.int64())]).empty_table()
    thresh = k - 2
    cur = edges.select_columns([u, v]).materialize()

    def wedges(g: pd.DataFrame) -> pa.Table:
        vs = np.sort(g[v].to_numpy())
        if len(vs) < 2:
            return pa.table({"apex": pa.array([], pa.int64()),
                             "w1": pa.array([], pa.int64()),
                             "w2": pa.array([], pa.int64()),
                             "key": pa.array([], pa.string())})
        i, j = np.triu_indices(len(vs), k=1)
        w1, w2 = vs[i], vs[j]
        key = (pd.Series(w1).astype(str) + _SEP
               + pd.Series(w2).astype(str))
        return pa.table({
            "apex": pa.array(np.repeat(g[u].to_numpy()[:1], len(i))),
            "w1": pa.array(w1), "w2": pa.array(w2),
            "key": pa.array(key, pa.string())})

    def edge_keys(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        # Arrow out (not pandas): a pandas-block left side breaks
        # shuffle_join's typed-empty reconstruction when the right
        # side is schema-less (object dtype has no Arrow DataType)
        keys = (df[u].astype(str) + _SEP + df[v].astype(str)).tolist()
        return pa.table({"key": pa.array(keys, pa.string()),
                         u: pa.array(df[u].to_numpy(), pa.int64()),
                         v: pa.array(df[v].to_numpy(), pa.int64())})

    for _ in range(max_rounds):
        n_edges = cur.count()
        if n_edges == 0:
            return ray.data.from_arrow(empty)
        ekeys = (cur.map_batches(edge_keys, batch_format="pyarrow")
                 .repartition(num_partitions).materialize())
        wedge_ds = cur.groupby(u).map_groups(wedges,
                                             batch_format="pandas")
        closed = shuffle_join(
            wedge_ds, ekeys.select_columns(["key"]), "key", "key",
            num_partitions, how="semi")

        def credit(t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            a = df["apex"].astype(str)
            b = df["w1"].astype(str)
            c = df["w2"].astype(str)
            return pa.table({"key": pa.array(pd.concat(
                [a + _SEP + b, a + _SEP + c, df["key"]],
                ignore_index=True), pa.string())})

        support = (closed.map_batches(credit, batch_format="pyarrow")
                   .groupby("key")
                   .aggregate(Count(alias_name="support")))
        strong = support.filter(expr=f"support >= {thresh}")
        kept = shuffle_join(
            ekeys, strong, "key", "key", num_partitions,
            lambda df: pd.DataFrame({
                u: df[u], v: df[v],
                "support": df["support"]})).materialize()
        if kept.count() == n_edges:
            return (kept.union(ray.data.from_arrow(empty))
                    .materialize())
        cur = (kept.select_columns([u, v])
               .repartition(num_partitions).materialize())
    return ray.data.from_arrow(empty)


def maximal_independent_set(edges: "ray.data.Dataset", *,
                            u: str = "u", v: str = "v",
                            max_rounds: int = 200,
                            num_partitions: int = 16,
                            broadcast_max: int = 2_000_000,
                            plan: str = "auto"
                            ) -> "ray.data.Dataset":
    """→ (node,): the GREEDY-BY-ID maximal independent set over the
    nodes incident to ``edges`` — the deterministic conflict-free
    representative picker (one survivor per local neighborhood; ER\'s
    "pick one canonical record per conflict clique" primitive).
    Equals the sequential greedy that scans ids ascending and takes
    every node with no smaller taken neighbor; computed as the
    standard parallel fixpoint (Blelloch/Fineman/Shun 2012, public):
    per round every REMAINING node that is a local id-minimum joins
    the set, then it and ALL its neighbors leave the graph.

    Per round: one groupby-min over the symmetrized remaining edges
    finds local minima, then the taken nodes and ALL their neighbors
    leave the graph; survivors left with no edges join at the end.
    Two output-identical physical plans (parity pytest-pinned),
    selected ONCE by the input edge count vs ``broadcast_max`` (the
    round censuses/drop sets are node-scale, bounded by 2·|E|):

    - **broadcast** (|E| ≤ ``broadcast_max``): the per-round census
      collects to the driver, minima/neighbors resolve in numpy, the
      drop set re-broadcasts via ``ray.put`` — one groupby + one
      stateless scan per round.
    - **dataset** (above the bound, or ``plan="dataset"``): census,
      taken set, touched-neighbor set and alive set all stay
      Datasets; neighbors come from a frontier-style semi
      ``shuffle_join`` of the symmetrized edges against the taken
      set and drops apply via :func:`_drop_incident` anti-joins (the
      ``bfs_hops`` frontier/visited pattern) — constant driver
      memory at any graph size.

    Greedy-by-id can need O(n) rounds on an adversarial id chain —
    salt ids upstream if observed; random-priority variants finish in
    O(log n) rounds w.h.p.  Equality with the sequential greedy is
    pytest-pinned.
    """
    if plan not in ("auto", "broadcast", "dataset"):
        raise ValueError(f"plan must be 'auto', 'broadcast' or "
                         f"'dataset', got {plan!r}")
    empty = pa.schema([("node", pa.int64())]).empty_table()
    cur = edges.select_columns([u, v]).materialize()
    if plan == "auto":
        plan = ("broadcast" if cur.count() <= broadcast_max
                else "dataset")

    def sym_min(t: pa.Table) -> pa.Table:
        a = t.column(u).to_numpy(zero_copy_only=False)
        b = t.column(v).to_numpy(zero_copy_only=False)
        node = np.concatenate([a, b]).astype(np.int64)
        nb = np.concatenate([b, a]).astype(np.int64)
        # per-batch combiner: min neighbor per node
        order = np.lexsort((nb, node))
        node, nb = node[order], nb[order]
        first = np.concatenate([[True], node[1:] != node[:-1]])
        return pa.table({"node": pa.array(node[first]),
                         "min_nb": pa.array(nb[first])})

    if plan == "dataset":
        return _mis_dataset(cur, sym_min, u=u, v=v,
                            max_rounds=max_rounds,
                            num_partitions=num_partitions,
                            empty=empty)

    mis_parts: list[np.ndarray] = []
    alive: np.ndarray | None = None

    for _ in range(max_rounds):
        if cur.count() == 0:
            break

        mn = (cur.map_batches(sym_min, batch_format="pyarrow")
              .groupby("node").aggregate(Min("min_nb",
                                             alias_name="min_nb")))
        rows = mn.take_all()
        nodes = np.array([r["node"] for r in rows], np.int64)
        minnb = np.array([r["min_nb"] for r in rows], np.int64)
        if alive is None:
            alive = nodes.copy()
        locals_ = nodes[nodes < minnb]
        if len(locals_) == 0:      # unreachable: the globally
            break                  # smallest remaining id is local
        mis_parts.append(locals_)
        taken_ref = ray.put(locals_)

        def touched_neighbors(t: pa.Table) -> pa.Table:
            tk = ray.get(taken_ref)
            a = t.column(u).to_numpy(zero_copy_only=False)
            b = t.column(v).to_numpy(zero_copy_only=False)
            nbrs = np.concatenate([b[np.isin(a, tk)],
                                   a[np.isin(b, tk)]])
            return pa.table({"nb": pa.array(
                np.unique(nbrs).astype(np.int64))})

        nb_parts = cur.map_batches(touched_neighbors,
                                   batch_format="pyarrow").take_all()
        nbrs = np.unique(np.array([r["nb"] for r in nb_parts],
                                  np.int64)) if nb_parts else             np.zeros(0, np.int64)
        drop_all = np.union1d(locals_, nbrs)
        alive = alive[~np.isin(alive, drop_all)]
        drop_ref = ray.put(drop_all)

        def keep(t: pa.Table) -> pa.Table:
            bad = ray.get(drop_ref)
            a = t.column(u).to_numpy(zero_copy_only=False)
            b = t.column(v).to_numpy(zero_copy_only=False)
            m = ~(np.isin(a, bad) | np.isin(b, bad))
            return t.filter(pa.array(m))

        cur = (cur.map_batches(keep, batch_format="pyarrow")
               .repartition(num_partitions).materialize())

    if cur.count() > 0:
        # round budget exhausted with edges left: the partial set is
        # independent but NOT maximal and no longer equals the pinned
        # sequential greedy — fail loudly instead of silently skipping
        # the survivors (the docstring's O(n)-rounds adversarial case)
        raise RuntimeError(
            f"maximal_independent_set did not converge in "
            f"{max_rounds} rounds ({cur.count()} edges remain) — "
            f"raise max_rounds or salt the adversarial id chain")
    if alive is not None and len(alive):
        # survivors with no remaining edges are independent of every
        # taken node (else they\'d have been dropped) and of each other
        mis_parts.append(alive)
    if not mis_parts:
        return ray.data.from_arrow(empty)
    out = np.unique(np.concatenate(mis_parts))
    return ray.data.from_arrow(pa.table({"node": pa.array(out)}))


def _mis_dataset(cur, sym_min, *, u: str, v: str, max_rounds: int,
                 num_partitions: int, empty: pa.Table
                 ) -> "ray.data.Dataset":
    """Dataset-set plan for :func:`maximal_independent_set` — no
    node-scale driver collect anywhere (see its docstring)."""
    taken_sets: list = []          # per-round (node,) Datasets
    alive = None                   # (node,) Dataset, materialized

    def distinct_nodes(ds):
        # typed (node,) map instead of a Project: projection chains
        # can report schema-unstable bundles on empty partitions and
        # poison downstream shuffle_join column capture (see k_core)
        return (ds.groupby("node").aggregate(Count(alias_name="_n"))
                .map_batches(lambda t: pa.table({
                    "node": t.column("node")}),
                    batch_format="pyarrow"))

    for _ in range(max_rounds):
        if cur.count() == 0:
            break

        mn = (cur.map_batches(sym_min, batch_format="pyarrow")
              .groupby("node").aggregate(Min("min_nb",
                                             alias_name="min_nb"))
              .materialize())      # consumed twice: alive init + filter
        if alive is None:
            alive = mn.select_columns(["node"]).materialize()
        def local_minima(t: pa.Table) -> pa.Table:
            nd = t.column("node").to_numpy(zero_copy_only=False)
            nb = t.column("min_nb").to_numpy(zero_copy_only=False)
            return pa.table({"node": pa.array(
                nd[nd < nb].astype(np.int64))})

        taken = (mn.map_batches(local_minima, batch_format="pyarrow")
                 .repartition(num_partitions).materialize())
        if taken.count() == 0:     # unreachable: the globally
            break                  # smallest remaining id is local

        taken_sets.append(taken)
        # neighbors of the taken set: frontier semi-join over the
        # symmetrized edges (the bfs_hops pattern), then distinct
        def sym(t: pa.Table) -> pa.Table:
            a = t.column(u).to_numpy(zero_copy_only=False)
            b = t.column(v).to_numpy(zero_copy_only=False)
            return pa.table({
                "src": pa.array(np.concatenate([a, b])
                                .astype(np.int64)),
                "dst": pa.array(np.concatenate([b, a])
                                .astype(np.int64))})

        touched = shuffle_join(
            cur.map_batches(sym, batch_format="pyarrow"), taken,
            "src", "node", num_partitions, how="semi")

        def dsts(t: pa.Table) -> pa.Table:
            vals = np.unique(t.column("dst").to_numpy(
                zero_copy_only=False))
            return pa.table({"node": pa.array(vals.astype(np.int64))})

        nbrs = distinct_nodes(
            touched.map_batches(dsts, batch_format="pyarrow"))
        drop = (distinct_nodes(taken.union(nbrs))
                .repartition(num_partitions).materialize())
        alive = (shuffle_join(alive, drop, "node", "node",
                              num_partitions, how="anti")
                 .repartition(num_partitions).materialize())
        cur = (_drop_incident(cur, drop, u, v, num_partitions)
               .repartition(num_partitions).materialize())

    if cur.count() > 0:
        raise RuntimeError(
            f"maximal_independent_set did not converge in "
            f"{max_rounds} rounds ({cur.count()} edges remain) — "
            f"raise max_rounds or salt the adversarial id chain")
    out = ray.data.from_arrow(empty)
    for t in taken_sets:
        out = out.union(t)
    if alive is not None:
        # survivors with no remaining edges are independent of every
        # taken node (else they'd have been dropped) and of each other
        out = out.union(alive)
    # taken sets are pairwise disjoint and disjoint from alive by
    # construction — sort only, to match the broadcast plan's output
    return out.repartition(num_partitions).sort("node")
