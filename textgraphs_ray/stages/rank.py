"""Per-cluster TextRank + rank restacking (SURVEY.md A3-A9, O1, H3).

The reference runs ``nx.pagerank(alpha=0.85)`` over the whole in-memory
lemma graph (``/root/reference/textgraphs/doc.py:927-932``), then
"restacks" so entities outrank lemmas (``doc.py:796-890``).  A global
graph is forbidden at 10^12 scale (north_rule), so PageRank runs
per-partition: nodes/edges are grouped by a partition key (the entity
``cluster_id``, or ``doc_id`` for document-local ranking) and a bounded
power iteration runs inside ``map_groups`` — execution stays streaming.

The restack replaces the reference's pulp/CBC linear program
(``doc.py:740-793``) with its closed-form solution (H3): at the
optimum the slack is 0 and both equality constraints bind, giving a
2×2 linear system::

    coef0·sum_e + coef1·sum_l = 1
    coef0·min_e − coef1·max_l = 0

⇒ coef0 = max_l / D, coef1 = min_e / D, D = sum_e·max_l + sum_l·min_e.
Falls back to raw ranks when either side is empty (``doc.py:872-874``).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

import ray.data

PAGERANK_ALPHA = 0.85  # reference defaults.py:31


def solve_restack_coeffs(sum_e: float, sum_l: float,
                         min_e: float, max_l: float) -> tuple[float, float]:
    """Closed form of the reference's LP (doc.py:771-793) at slack=0."""
    d = sum_e * max_l + sum_l * min_e
    if d <= 0.0:
        return 1.0, 0.0
    coef0 = max_l / d
    coef1 = min_e / d
    if coef0 < coef1:  # the LP constrains coef0 ≥ coef1
        s = sum_e + sum_l
        return 1.0 / s, 1.0 / s
    return coef0, coef1


def calc_quantile_bins(num_rows: int) -> np.ndarray:
    """Reference util.py:65-85: ⌈4·ln n⌉ evenly spaced quantile bins."""
    granularity = max(round(math.log(num_rows) * 4), 1) if num_rows > 0 else 1
    return np.linspace(0, 1, num=granularity, endpoint=True)


def stripe_column(values, bins: np.ndarray) -> np.ndarray:
    """Reference util.py:88-113: digitize into quantile stripes."""
    s = pd.Series(values)
    q = s.quantile(bins, interpolation="nearest")
    return np.digitize(values, q) - 1


def root_mean_square(values) -> float:
    """Reference util.py:116-132."""
    a = np.asarray(values, dtype=np.float64)
    if a.size == 0:
        return 0.0
    return float(np.sqrt((a ** 2).sum() / a.size))


def pagerank_power(n: int, src: np.ndarray, dst: np.ndarray,
                   *, alpha: float = PAGERANK_ALPHA, iters: int = 50,
                   tol: float = 1e-9) -> np.ndarray:
    """Vectorized power iteration on an edge list (0-based node ids).

    Matches ``networkx.pagerank`` semantics on a directed multigraph:
    dangling mass redistributed uniformly; parallel edges add weight.
    """
    rank = np.full(n, 1.0 / max(n, 1))
    out_deg = np.bincount(src, minlength=n).astype(np.float64)
    dangling = out_deg == 0
    for _ in range(iters):
        contrib = np.where(dangling, 0.0, rank / np.maximum(out_deg, 1.0))
        new = np.zeros(n)
        np.add.at(new, dst, contrib[src])
        new = alpha * (new + rank[dangling].sum() / max(n, 1)) + (1 - alpha) / max(n, 1)
        if np.abs(new - rank).sum() < tol:
            rank = new
            break
        rank = new
    return rank


def restack_ranks(df: pd.DataFrame) -> np.ndarray:
    """Reference ``_restack_ranks`` (doc.py:796-890) over a node frame
    with columns [weight, count, hood, subobj, entity]."""
    n = len(df)
    if n == 0:
        return np.zeros(0)
    df1 = df[["weight", "count", "hood", "subobj"]].astype(float).copy()
    df1.loc[df1["count"] < 1, "weight"] = 0.0

    maxes = df1.max(axis=0).replace(0.0, 1.0)
    df2 = df1 / maxes
    bins = calc_quantile_bins(n)
    striped = pd.DataFrame({c: stripe_column(df2[c].to_numpy(), bins)
                            for c in df2.columns})
    rank = striped.apply(root_mean_square, axis=1).to_numpy()
    rank[df1["count"].to_numpy() < 1] = 0.0
    total = rank.sum()
    if total > 0:
        rank = rank / total

    entity = df["entity"].to_numpy(dtype=bool)
    e_ranks = rank[entity & (rank > 0)]
    l_ranks = rank[~entity & (rank > 0)]
    if len(e_ranks) < 1 or len(l_ranks) < 1:
        return rank
    coef0, coef1 = solve_restack_coeffs(
        sum_e=float(e_ranks.sum()), sum_l=float(l_ranks.sum()),
        min_e=float(e_ranks.min()), max_l=float(l_ranks.max()))
    stacked = np.where(entity, rank * coef0, rank * coef1)
    stacked[rank == 0] = 0.0
    return stacked


def _rank_group(g: pd.DataFrame) -> pd.DataFrame:
    """One partition (cluster or document): local graph → ranked nodes.

    Expects rows of node/edge union: node rows (key, kind, count,
    sub_obj) and edge rows (src_key, dst_key).  Emits (key, weight,
    neighbors).
    """
    nodes = g[g["row_kind"] == "node"]
    edges = g[g["row_kind"] == "edge"]
    keys = nodes["key"].tolist()
    idx = {k: i for i, k in enumerate(keys)}
    n = len(keys)
    src = np.array([idx[s] for s in edges["src_key"] if s in idx
                    ], dtype=np.int64) if len(edges) else np.zeros(0, np.int64)
    # align dst with filtered src
    pairs = [(idx[s], idx[d]) for s, d in zip(edges["src_key"], edges["dst_key"])
             if s in idx and d in idx]
    if pairs:
        src = np.array([p[0] for p in pairs], dtype=np.int64)
        dst = np.array([p[1] for p in pairs], dtype=np.int64)
    else:
        src = np.zeros(0, np.int64)
        dst = np.zeros(0, np.int64)

    pr = pagerank_power(n, src, dst)

    # neighbor counts: distinct successors, matching
    # ``nx.neighbors`` on the reference's MultiDiGraph (doc.py:914-924)
    neigh = np.zeros(n, dtype=np.int64)
    if pairs:
        uniq = np.unique(np.array(pairs, dtype=np.int64), axis=0)
        neigh = np.bincount(uniq[:, 0], minlength=n)

    df = pd.DataFrame({
        "weight": pr,
        "count": nodes["count"].to_numpy(),
        "hood": neigh,
        "subobj": nodes["sub_obj"].to_numpy(dtype=float),
        "entity": (nodes["kind"] == "ent").to_numpy(),
    })
    stacked = restack_ranks(df)
    return pd.DataFrame({
        "key": keys,
        "part": nodes["part"].iloc[0] if n else "",
        "weight": stacked,
        "neighbors": neigh.astype(np.int32),
        # node attributes ride along so downstream phrase emission
        # needs NO attribute join (Ray's hash join drops the schema of
        # empty shuffle partitions; carrying columns through the one
        # existing sort costs a few bytes/row instead)
        "text": nodes["text"].to_numpy(),
        "pos": nodes["pos"].to_numpy(),
        "label": nodes["label"].to_numpy(),
        "kind": nodes["kind"].to_numpy(),
        "count": nodes["count"].to_numpy(),
    })


def rank_partitions(nodes_ds: "ray.data.Dataset",
                    edges_ds: "ray.data.Dataset",
                    *, part_col: str = "part") -> "ray.data.Dataset":
    """Per-partition TextRank post-pass.

    ``nodes_ds`` columns: (part, key, kind, count, sub_obj);
    ``edges_ds`` columns: (part, src_key, dst_key).  One shuffle keyed
    on the partition column; the graph never materializes globally.
    """
    import pyarrow as pa

    def tag_nodes(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "part": t.column(part_col),
            "row_kind": pa.array(["node"] * n),
            "key": t.column("key"),
            "kind": t.column("kind"),
            "count": t.column("count"),
            "sub_obj": t.column("sub_obj"),
            "text": t.column("text"),
            "pos": t.column("pos"),
            "label": t.column("label"),
            "src_key": pa.array([""] * n),
            "dst_key": pa.array([""] * n),
        })

    def tag_edges(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "part": t.column(part_col),
            "row_kind": pa.array(["edge"] * n),
            "key": pa.array([""] * n),
            "kind": pa.array([""] * n),
            "count": pa.array(np.zeros(n, np.int64)),
            "sub_obj": pa.array([False] * n),
            "text": pa.array([""] * n),
            "pos": pa.array([""] * n),
            "label": pa.array([""] * n),
            "src_key": t.column("src_key"),
            "dst_key": t.column("dst_key"),
        })

    union = (nodes_ds.map_batches(tag_nodes, batch_format="pyarrow")
             .union(edges_ds.map_batches(tag_edges, batch_format="pyarrow")))
    return union.groupby("part").map_groups(_rank_group, batch_format="pandas")


def pagerank_distributed(nodes_ds: "ray.data.Dataset",
                         edges_ds: "ray.data.Dataset", *,
                         alpha: float = PAGERANK_ALPHA, iters: int = 30,
                         num_partitions: int = 16,
                         driver_threshold: int = 2_000_000,
                         seeds: "set[str] | None" = None
                         ) -> "ray.data.Dataset":
    """GLOBAL PageRank over the whole graph → Dataset (key, rank).

    ``seeds`` switches to PERSONALIZED PageRank (networkx
    ``personalization`` semantics with the seed-uniform vector also
    used for dangling redistribution): per iteration
    ``v = α·in_mass + (α·d_mass + 1−α)·p`` with ``p = 1/|S|`` on seed
    keys and 0 elsewhere; the uniform path is untouched (bit-identical
    to before).  Every seed must be a node.  The seed set is a
    QUERY-sized input (the whole point of PPR), broadcast once.

    The reference (and A4/`rank_partitions`) runs PageRank per
    document graph — thousands of tiny independent problems.  The
    corpus-wide lemma graph is ONE graph with 10^9+ nodes; this is its
    scale path, mirroring ``cluster.propagate_labels``'s two-path
    design:

    - edge sets ≤ ``driver_threshold``: collect edges, run the
      vectorized :func:`pagerank_power` kernel (networkx semantics:
      dangling mass redistributed, parallel edges add weight),
      broadcast the result map, label nodes in one ``map_batches``.
      Isolated nodes (no edges at all) share one closed-form rank
      tracked as a scalar beside the vector — teleport plus their
      share of dangling mass.
    - above it: power iteration as Dataset passes — per round, one
      :func:`cluster._shuffle_join` ships ``rank/out_deg`` along
      edges, one groupby(dst) sums in-mass, and the dangling total is
      a scalar aggregate; ``repartition`` + ``materialize`` per round
      per the block-count invariant (CLAUDE.md).  Fixed ``iters``
      (no distributed tol check — an L1-diff join per round costs
      more than the iterations it saves at these depths).

    Both paths are exact for the same (alpha, iters) inputs; equality
    is pytest-asserted by forcing ``driver_threshold=0``.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray

    from .cluster import _shuffle_join

    # Pin both inputs once: they are consumed repeatedly below (nodes:
    # count + 1-2 label passes; edges: count + take_all on the driver
    # path, or the out-degree groupby + one contrib join PER ITERATION
    # on the distributed path).  Lazy inputs would re-execute their
    # upstream each time (the propagate_labels double-execution trap,
    # CLAUDE.md); both tables are keys(+rank) only and spill like any
    # blocks.
    nodes_ds = nodes_ds.materialize()
    edges_ds = edges_ds.materialize()
    n_total = nodes_ds.count()
    if n_total == 0:
        return nodes_ds.map_batches(
            lambda t: pa.table({"key": pa.array([], pa.string()),
                                "rank": pa.array([], pa.float64())}),
            batch_format="pyarrow")
    n_edges = edges_ds.count()

    if 2 * n_edges <= driver_threshold:
        edges = edges_ds.select_columns(["key_a", "key_b"]).take_all()
        src_k = [r["key_a"] for r in edges]
        dst_k = [r["key_b"] for r in edges]
        keys = sorted({*src_k, *dst_k})
        idx = {k: i for i, k in enumerate(keys)}
        m = len(keys)
        n_iso = n_total - m
        src = np.fromiter((idx[k] for k in src_k), np.int64, len(src_k))
        dst = np.fromiter((idx[k] for k in dst_k), np.int64, len(dst_k))
        # power iteration with the isolated-node class as a scalar:
        # every isolated node is dangling and receives no in-links, so
        # by symmetry all share one rank value
        v = np.full(m, 1.0 / n_total)
        r_iso = 1.0 / n_total
        out_deg = np.bincount(src, minlength=m).astype(np.float64)
        dangling = out_deg == 0
        if seeds is None:
            for _ in range(iters):
                contrib = np.where(dangling, 0.0,
                                   v / np.maximum(out_deg, 1.0))
                d_mass = v[dangling].sum() + n_iso * r_iso
                new = np.zeros(m)
                np.add.at(new, dst, contrib[src])
                v = (alpha * (new + d_mass / n_total)
                     + (1 - alpha) / n_total)
                r_iso = (alpha * d_mass / n_total
                         + (1 - alpha) / n_total)
            iso_rank = {None: r_iso}
        else:
            # isolated nodes split into seed / non-seed scalar classes
            # (seeds are required to be nodes, so isolated seeds are
            # exactly the seeds absent from the edge key set)
            n_iso_s = len([s for s in seeds if s not in idx])
            n_iso_n = n_iso - n_iso_s
            ns = len(seeds)
            pvec = np.zeros(m)
            for s in seeds:
                if s in idx:
                    pvec[idx[s]] = 1.0 / ns
            r_iso_s = r_iso_n = 1.0 / n_total
            for _ in range(iters):
                contrib = np.where(dangling, 0.0,
                                   v / np.maximum(out_deg, 1.0))
                d_mass = (v[dangling].sum() + n_iso_s * r_iso_s
                          + n_iso_n * r_iso_n)
                new = np.zeros(m)
                np.add.at(new, dst, contrib[src])
                tele = alpha * d_mass + (1 - alpha)
                v = alpha * new + tele * pvec
                r_iso_s = tele * (1.0 / ns)
                r_iso_n = 0.0
            iso_rank = {True: r_iso_s, False: r_iso_n}
        rank_map = dict(zip(keys, v.tolist()))
        map_ref = ray.put(rank_map)
        seed_ref = ray.put(seeds)

        def label(t: pa.Table) -> pa.Table:
            rm = ray.get(map_ref)
            sd = ray.get(seed_ref)
            ks = t.column("key").to_pylist()
            if sd is None:
                fallback = [iso_rank[None]] * len(ks)
            else:
                fallback = [iso_rank[k in sd] for k in ks]
            return pa.table({
                "key": t.column("key"),
                "rank": pa.array([rm.get(k, fb)
                                  for k, fb in zip(ks, fallback)],
                                 pa.float64()),
            })

        return nodes_ds.map_batches(label, batch_format="pyarrow")

    # ---- distributed path ----
    from ray.data.aggregate import Count, Sum

    out_deg = (edges_ds.map_batches(
        lambda t: pa.table({"key": t.column("key_a")}),
        batch_format="pyarrow")
        .groupby("key").aggregate(Count(alias_name="out_deg")))
    # state: (key, rank, out_deg) for every node; out_deg 0 = dangling
    # left-join emulation (key, rank=1/n, out_deg): the join side
    # carries out_deg with rank 0, the union side carries every node's
    # initial rank with out_deg 0; the groupby-sum below resolves both
    # (nodes without out-edges appear only on the union side)
    state = _shuffle_join(
        nodes_ds.map_batches(
            lambda t: pa.table({"key": t.column("key")}),
            batch_format="pyarrow"),
        out_deg, "key", "key", num_partitions,
        lambda df: pd.DataFrame({"key": df["key"],
                                 "rank": np.zeros(len(df)),
                                 "out_deg": df["out_deg"]})).union(
        nodes_ds.map_batches(
            lambda t: pa.table({
                "key": t.column("key"),
                "rank": pa.array(np.full(t.num_rows, 1.0 / n_total)),
                "out_deg": pa.array(np.zeros(t.num_rows, np.int64))}),
            batch_format="pyarrow"))
    state = (state.groupby("key")
             .aggregate(Sum("rank", alias_name="rank"),
                        Sum("out_deg", alias_name="out_deg"))
             .repartition(num_partitions).materialize())

    for _ in range(iters):
        d_row = state.map_batches(
            lambda t: pa.table({"d": pa.array([pc.sum(
                pc.if_else(pc.equal(t.column("out_deg"), 0),
                           t.column("rank"),
                           pa.scalar(0.0))).as_py() or 0.0])}),
            batch_format="pyarrow").take_all()
        d_mass = sum(r["d"] for r in d_row)

        contrib = _shuffle_join(
            edges_ds.select_columns(["key_a", "key_b"]),
            state.map_batches(
                lambda t: t.filter(pc.greater(t.column("out_deg"), 0)),
                batch_format="pyarrow"),
            "key_a", "key", num_partitions,
            lambda df: pd.DataFrame({
                "key": df["key_b"],
                "mass": df["rank"] / df["out_deg"]}))
        merged = (state.map_batches(
            lambda t: pa.table({"key": t.column("key"),
                                "mass": pa.array(
                                    np.zeros(t.num_rows)),
                                "out_deg": t.column("out_deg")}),
            batch_format="pyarrow")
            .union(contrib.map_batches(
                lambda t: t.append_column(
                    "out_deg", pa.array(np.zeros(t.num_rows, np.int64))),
                batch_format="pyarrow"))
            .groupby("key")
            .aggregate(Sum("mass", alias_name="mass"),
                       Sum("out_deg", alias_name="out_deg")))
        if seeds is None:
            base = (1 - alpha) / n_total + alpha * d_mass / n_total

            def apply_rank(t: pa.Table, base=base) -> pa.Table:
                mass = t.column("mass").to_numpy(zero_copy_only=False)
                return pa.table({
                    "key": t.column("key"),
                    "rank": pa.array(base + alpha * mass, pa.float64()),
                    "out_deg": t.column("out_deg"),
                })
        else:
            tele = alpha * d_mass + (1 - alpha)
            # tele * (1/ns), NOT tele/ns: bit-parity with the driver
            # kernel's tele * pvec (pvec holds 1.0/ns)
            p_seed = tele * (1.0 / len(seeds))
            seed_arr = pa.array(sorted(seeds), pa.string())

            def apply_rank(t: pa.Table, p_seed=p_seed,
                           seed_arr=seed_arr) -> pa.Table:
                mass = t.column("mass").to_numpy(zero_copy_only=False)
                is_seed = pc.is_in(t.column("key"),
                                   value_set=seed_arr).to_numpy(
                    zero_copy_only=False)
                return pa.table({
                    "key": t.column("key"),
                    "rank": pa.array(
                        alpha * mass + np.where(is_seed, p_seed, 0.0),
                        pa.float64()),
                    "out_deg": t.column("out_deg"),
                })

        state = (merged.map_batches(apply_rank, batch_format="pyarrow")
                 .repartition(num_partitions).materialize())

    return state.map_batches(
        lambda t: t.select(["key", "rank"]), batch_format="pyarrow")


def hits_distributed(nodes_ds: "ray.data.Dataset",
                     edges_ds: "ray.data.Dataset", *, iters: int = 10,
                     num_partitions: int = 16,
                     driver_threshold: int = 2_000_000
                     ) -> "ray.data.Dataset":
    """HITS hubs & authorities (Kleinberg 1999) → (key, hub, auth).

    Sum-normalized per half-step (both vectors always sum to 1), which
    converges to the same principal-eigenvector directions as any
    other per-iteration norm: per iteration
    ``a = Σ_in h;  a /= Σa;  h = Σ_out a;  h /= Σh``.  Nodes with no
    in-edges get auth 0, no out-edges hub 0 (isolated nodes both).

    Two output-identical physical plans, mirroring
    :func:`pagerank_distributed`: a driver ``np.add.at`` kernel below
    ``driver_threshold`` edge endpoints, else per-iteration Dataset
    passes — each half-step is one empty-partition-safe shuffle_join
    shipping the current score along the edge, one groupby sum on the
    far endpoint and one scalar-sum normalize; state re-materialized
    with pinned partition counts per round (block-count invariant).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray

    from .cluster import _shuffle_join

    nodes_ds = nodes_ds.materialize()
    edges_ds = edges_ds.materialize()
    if nodes_ds.count() == 0:
        return ray.data.from_arrow(pa.schema(
            [("key", pa.string()), ("hub", pa.float64()),
             ("auth", pa.float64())]).empty_table())
    n_edges = edges_ds.count()

    if 2 * n_edges <= driver_threshold:
        edges = edges_ds.select_columns(["key_a", "key_b"]).take_all()
        src_k = [r["key_a"] for r in edges]
        dst_k = [r["key_b"] for r in edges]
        keys = sorted({*src_k, *dst_k})
        idx = {k: i for i, k in enumerate(keys)}
        m = len(keys)
        src = np.fromiter((idx[k] for k in src_k), np.int64, len(src_k))
        dst = np.fromiter((idx[k] for k in dst_k), np.int64, len(dst_k))
        h = np.full(m, 1.0 / max(m, 1))
        a = np.zeros(m)
        for _ in range(iters):
            a = np.zeros(m)
            np.add.at(a, dst, h[src])
            sa = a.sum()
            if sa == 0:
                break
            a /= sa
            h = np.zeros(m)
            np.add.at(h, src, a[dst])
            sh = h.sum()
            if sh == 0:
                break
            h /= sh
        hub_map = dict(zip(keys, h.tolist()))
        auth_map = dict(zip(keys, a.tolist()))
        ref = ray.put((hub_map, auth_map))

        def label(t: pa.Table) -> pa.Table:
            hm, am = ray.get(ref)
            ks = t.column("key").to_pylist()
            return pa.table({
                "key": t.column("key"),
                "hub": pa.array([hm.get(k, 0.0) for k in ks],
                                pa.float64()),
                "auth": pa.array([am.get(k, 0.0) for k in ks],
                                 pa.float64())})

        return nodes_ds.map_batches(label, batch_format="pyarrow")

    # ---- distributed path ----
    # hub and auth live in SEPARATE (key, score) datasets so a
    # half-step needs NO carry join — one flow shuffle_join, one
    # groupby sum (union-padded with zero rows so in-degree-0 nodes
    # survive), one scalar total, one divide; the two vectors meet in
    # a single join after the loop.
    from ray.data.aggregate import Sum

    n_nodes = nodes_ds.count()
    node_keys = nodes_ds.map_batches(
        lambda t: pa.table({"key": t.column("key")}),
        batch_format="pyarrow").repartition(num_partitions).materialize()
    hub = node_keys.map_batches(
        lambda t: pa.table({
            "key": t.column("key"),
            "score": pa.array(np.full(t.num_rows, 1.0 / n_nodes))}),
        batch_format="pyarrow").repartition(num_partitions).materialize()
    auth = node_keys.map_batches(
        lambda t: pa.table({
            "key": t.column("key"),
            "score": pa.array(np.zeros(t.num_rows))}),
        batch_format="pyarrow").repartition(num_partitions).materialize()

    def half_step(score_ds, src_col: str, dst_col: str):
        """→ materialized (key, score): normalized Σ score over edges
        src→dst."""
        flowed = _shuffle_join(
            edges_ds.select_columns(["key_a", "key_b"]),
            score_ds, src_col, "key", num_partitions,
            lambda df: pd.DataFrame({"key": df[dst_col],
                                     "raw": df["score"]}))
        # pin before the double consumption (scalar sum + divide pass)
        # — a lazy `summed` would re-run the flow join twice (repo
        # invariant: the r2 minhash double-execution trap)
        summed = (node_keys.map_batches(
            lambda t: pa.table({"key": t.column("key"),
                                "raw": pa.array(np.zeros(t.num_rows))}),
            batch_format="pyarrow")
            .union(flowed)
            .groupby("key").aggregate(Sum("raw", alias_name="raw"))
            .repartition(num_partitions).materialize())
        tot = sum(r["s"] for r in summed.map_batches(
            lambda t: pa.table({"s": pa.array(
                [pc.sum(t.column("raw")).as_py() or 0.0])}),
            batch_format="pyarrow").take_all())

        def divide(t: pa.Table, tot=tot) -> pa.Table:
            raw = t.column("raw").to_numpy(zero_copy_only=False)
            # true division (not multiply-by-reciprocal): bit-parity
            # with the driver kernel's `a /= sa` and the SQL `a / s`
            scaled = raw / tot if tot > 0 else raw * 0.0
            return pa.table({"key": t.column("key"),
                             "score": pa.array(scaled, pa.float64())})

        return summed.map_batches(
            divide, batch_format="pyarrow").materialize()

    for _ in range(iters):
        auth = half_step(hub, "key_a", "key_b")
        hub = half_step(auth, "key_b", "key_a")

    return _shuffle_join(
        hub, auth, "key", "key", num_partitions,
        lambda df: pd.DataFrame({"key": df["key"],
                                 "hub": df["score_x"],
                                 "auth": df["score_y"]}))
