"""Weisfeiler–Lehman color refinement — the canonical graph
fingerprinting / structural-role primitive (Weisfeiler & Lehman 1968;
Shervashidze et al. JMLR 2011 for the kernel form; the expressiveness
ceiling of message-passing GNNs, Xu et al. ICLR 2019).

Each round every node's color becomes a hash of (its own color, the
SORTED multiset of its neighbors' colors); after k rounds two nodes
share a color only if their k-hop neighborhood trees are isomorphic.
Stable color classes = structural roles — duplicate subgraph
detection, symmetry finding, ER over graph-shaped records.

Distribution per round (no driver state, no adjacency broadcast):

1. neighbor colors: one hash-partitioned :func:`~.join.shuffle_join`
   of the symmetrized edge list against the color table on the
   NEIGHBOR key,
2. multiset strings: one coarse node-hash shuffle; a partition sorts
   (node, color) once and joins each node's colors in a single
   vectorized pass,
3. recolor: one more ``shuffle_join`` on the node key brings the
   node's own color in; ``md5(own ∥ '|' ∥ ','.join(sorted(nb)))``
   — byte-identical to the DuckDB oracle's
   ``md5(own || '|' || string_agg(nb, ',' ORDER BY nb))``.

Colors are opaque 32-hex strings, so every exchange is
constant-width; the color table is exactly |V| rows per round.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Count

from .join import shuffle_join


def _symmetrize(edges: "ray.data.Dataset", u: str, v: str
                ) -> "ray.data.Dataset":
    def sym(t: pa.Table) -> pa.Table:
        a = t.column(u).to_numpy(zero_copy_only=False)
        b = t.column(v).to_numpy(zero_copy_only=False)
        return pa.table({"a": pa.array(np.concatenate([a, b])),
                         "b": pa.array(np.concatenate([b, a]))})

    return edges.map_batches(sym, batch_format="pyarrow")


def wl_colors(edges: "ray.data.Dataset", *, rounds: int = 2,
              u: str = "u", v: str = "v",
              num_partitions: int = 32) -> "ray.data.Dataset":
    """→ (node, color) after ``rounds`` WL refinements over the
    undirected graph ``edges`` (distinct rows, u < v).  Initial color
    is the node's degree as a decimal string; isolated nodes don't
    appear (they have no edge rows — match the oracle's universe)."""
    sym = _symmetrize(edges, u, v).materialize()  # reused every round

    colors = (sym.groupby("a").aggregate(Count(alias_name="_d"))
              .map_batches(
                  lambda t: pa.table({
                      "node": t.column("a"),
                      "color": pa.array(
                          [str(d) for d in
                           t.column("_d").to_pylist()], pa.string())}),
                  batch_format="pyarrow"))

    for _ in range(rounds):
        colors = colors.materialize()   # consumed twice below
        nb = shuffle_join(
            sym, colors, "b", "node", num_partitions,
            project=lambda m: pd.DataFrame({
                "node": m["a"], "nbcolor": m["color"]}))

        def add_part(t: pa.Table) -> pa.Table:
            n = t.column("node").to_numpy(zero_copy_only=False)
            part = (n.astype(np.uint64)
                    * np.uint64(0x9E3779B97F4A7C15)
                    >> np.uint64(58)).astype(np.int32)
            return t.append_column("_np", pa.array(part))

        def multiset(g: pd.DataFrame) -> pa.Table:
            g = g.sort_values(["node", "nbcolor"], kind="stable")
            joined = (g.groupby("node", sort=False)["nbcolor"]
                      .agg(",".join))
            return pa.table({
                "node": pa.array(joined.index.to_numpy()),
                "nbstr": pa.array(joined.to_numpy(), pa.string())})

        nbstr = (nb.map_batches(add_part, batch_format="pyarrow")
                 .groupby("_np")
                 .map_groups(multiset, batch_format="pandas"))

        def recolor(m: pd.DataFrame) -> pd.DataFrame:
            new = [hashlib.md5(f"{own}|{ns}".encode()).hexdigest()
                   for own, ns in zip(m["color"], m["nbstr"])]
            return pd.DataFrame({"node": m["node"], "color": new})

        colors = shuffle_join(nbstr, colors, "node", "node",
                              num_partitions, project=recolor)

    return colors


def wl_class_census(colors: "ray.data.Dataset") -> "ray.data.Dataset":
    """(node, color) → (class_size, n_classes): how many color classes
    have each size — the stable, hash-free summary of a refinement
    (the classes themselves are opaque md5 strings)."""
    sizes = colors.groupby("color").aggregate(Count(alias_name="n"))
    return (sizes.map_batches(
        lambda t: pa.table({"class_size": t.column("n")}),
        batch_format="pyarrow")
        .groupby("class_size").aggregate(Count(alias_name="n_classes")))
