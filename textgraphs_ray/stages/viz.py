"""Visualization-support aggregates (SURVEY.md A14/A15 — the data
halves of the reference's ``vis.py``; actual rendering is out of scope
in a headless engine).

- :func:`wordcloud_weights` — per-phrase ``weight / max(weight) * 1000``
  (reference ``vis.py:253-265``): a global max aggregate broadcast into
  a vectorized map — no driver loop.
- :func:`cluster_communities` — community detection per partition
  (reference ``vis.py:188-204`` runs Girvan–Newman on the whole graph;
  here it is a bounded ``groupby(part).map_groups`` using networkx when
  importable, else a connected-components fallback — gated import, no
  hard dependency).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def wordcloud_weights(phrases_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """phrases(text, weight) → (text, freq) with freq scaled to 0-1000."""
    max_w = phrases_ds.max("weight")
    scale = 1000.0 / max_w if max_w else 0.0

    def scale_batch(t: pa.Table) -> pa.Table:
        return pa.table({
            "text": t.column("text"),
            "freq": pc.round(pc.multiply(t.column("weight"),
                                         pa.scalar(scale)), ndigits=2),
        })

    return phrases_ds.map_batches(scale_batch, batch_format="pyarrow")


def _communities_for_part(g: pd.DataFrame) -> pd.DataFrame:
    part = g["part"].iloc[0]
    edges = list(zip(g["src_key"], g["dst_key"]))
    try:
        import networkx as nx

        graph = nx.Graph()
        graph.add_edges_from(edges)
        comp_iter = nx.community.girvan_newman(graph)
        try:
            first_level = next(comp_iter)
            second_level = next(comp_iter)  # reference takes 2nd level
            communities = second_level
        except StopIteration:
            communities = [set(graph.nodes)]
        _ = first_level
    except ImportError:  # fallback: connected components
        parent: dict = {}

        def find(x):
            while parent.get(x, x) != x:
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        comp: dict = {}
        for a, b in edges:
            comp.setdefault(find(a), set()).update((a, b))
        communities = list(comp.values()) or [set()]

    rows = []
    for ci, members in enumerate(sorted(communities, key=sorted)):
        for m in sorted(members):
            rows.append({"part": part, "community": ci, "key": m})
    return pd.DataFrame(rows, columns=["part", "community", "key"])


def cluster_communities(edges_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """edges(part, src_key, dst_key) → (part, community, key): bounded
    per-partition community detection (one shuffle on part)."""
    return edges_ds.groupby("part").map_groups(
        _communities_for_part, batch_format="pandas")
