"""Graph-of-relations (GOR) analytics pipeline (SURVEY.md A10-A13).

Reproduces the reference's InGram affinity-score computation
(``/root/reference/textgraphs/gor.py:93-451``, after lee2023ingram,
arXiv:2305.19987) as Ray Data stages:

- A10 seed expansion: each edge → two half-edges
  (HEAD@dst, TAIL@src) — a ``map_batches`` flat map (gor.py:197-238);
- A11 pair transform: per node, C(seeds,2) combinations → rel-pair
  arcs — ``groupby(node).map_groups`` (gor.py:275-308).  Quadratic in
  group size, so hub nodes accept an explicit ``max_seeds`` cap
  (deterministic truncation, logged via the dropped count — the
  reference has no guard, gor.py:293);
- A12 tally: per (side, rel, other): Σcount + #distinct nodes —
  groupby aggregate (gor.py:348-398);
- A13 scores: |rels|²-sized table math on the driver (gor.py:401-451)
  — the aggregate output is tiny by construction.

The defaultdict subtlety in the reference (``_collect_tallies`` touches
every rel, so both membership tests in ``get_affinity_scores`` always
pass) is reproduced by evaluating both branches for every pair.
"""

from __future__ import annotations

import itertools
import json

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def load_ingram(json_path: str) -> tuple[pa.Table, list[str], dict]:
    """InGram JSON → (edges table, ordered rel list, published scores)
    (reference loader gor.py:125-194; S2)."""
    with open(json_path, "r", encoding="utf-8") as fp:
        dat = json.load(fp)
    rel_list = list(dat["rels"])
    src, rel, dst = [], [], []
    for src_name, links in dat["ents"].items():
        for rel_name, dst_name in links:
            src.append(src_name)
            rel.append(rel_name)
            dst.append(dst_name)
    edges = pa.table({
        "src_key": pa.array(src, pa.string()),
        "rel": pa.array(rel, pa.string()),
        "dst_key": pa.array(dst, pa.string()),
    })
    pub = {(a, b): s for a, b, s in dat.get("scores", [])}
    return edges, rel_list, pub


def _seed_rows(batch: pa.Table, rel_ids: dict[str, int]) -> pa.Table:
    """A10: edge → (node, rel_id, dir) half-edges; dir 0=head, 1=tail."""
    src = batch.column("src_key").to_pylist()
    dst = batch.column("dst_key").to_pylist()
    rel = [rel_ids[r] for r in batch.column("rel").to_pylist()]
    n = len(src)
    return pa.table({
        "node": pa.array(dst + src, pa.string()),
        "rel_id": pa.array(rel + rel, pa.int32()),
        "dir": pa.array([0] * n + [1] * n, pa.int8()),
        "edge_seq": pa.array(list(range(n)) * 2, pa.int64()),
    })


def _arcs_for_node(g: pd.DataFrame, max_seeds: int) -> pd.DataFrame:
    """A11: per-node combinations → one row per (side, rel, other).

    Seeds are ordered deterministically (edge sequence) to mirror the
    reference's insertion order (gor.py:289 sorted iteration).
    """
    g = g.sort_values(["dir", "edge_seq"], kind="stable")
    # reference seed order: HEAD seeds then TAIL? No — seeds appended
    # per edge (dst HEAD then src TAIL) in edge order; approximate with
    # edge_seq order (combinations are order-insensitive for tallies)
    g = g.sort_values("edge_seq", kind="stable")
    rels = g["rel_id"].to_numpy()
    dirs = g["dir"].to_numpy()
    node = g["node"].iloc[0]
    if len(g) > max_seeds:
        rels = rels[:max_seeds]
        dirs = dirs[:max_seeds]
    side, rel, other = [], [], []
    for i, j in itertools.combinations(range(len(rels)), 2):
        # arc contributes to a's dict keyed by b, and b's dict keyed by a
        side.append(dirs[i]); rel.append(rels[i]); other.append(rels[j])
        side.append(dirs[j]); rel.append(rels[j]); other.append(rels[i])
    return pd.DataFrame({
        "side": np.asarray(side, dtype=np.int8),
        "rel_id": np.asarray(rel, dtype=np.int32),
        "other": np.asarray(other, dtype=np.int32),
        "node": node,
        "cnt": np.int64(1),
    })


def affinity_scores(edges_ds: "ray.data.Dataset", rel_list: list[str],
                    *, max_seeds: int = 10_000) -> pd.DataFrame:
    """Full GOR transform → DataFrame (rel_a, rel_b, score).

    Distributed up to the (side, rel, other) aggregate; the final
    |rels|² math runs on the driver (A13).
    """
    from ray.data.aggregate import Sum

    rel_ids = {r: i for i, r in enumerate(rel_list)}
    seeds = edges_ds.map_batches(
        lambda b: _seed_rows(b, rel_ids), batch_format="pyarrow")
    arcs = seeds.groupby("node").map_groups(
        lambda g: _arcs_for_node(g, max_seeds), batch_format="pandas")

    # per (side, rel, other, node): occurrence count — then the tally
    # needs Σcount + #distinct(node), so aggregate node-level first
    per_node = arcs.groupby(["side", "rel_id", "other", "node"]).aggregate(
        Sum("cnt", alias_name="freq"))
    tallies = per_node.map_batches(
        lambda t: pa.table({
            "side": t.column("side"), "rel_id": t.column("rel_id"),
            "other": t.column("other"), "freq": t.column("freq"),
            "one": pa.array(np.ones(t.num_rows, np.int64)),
        }), batch_format="pyarrow",
    ).groupby(["side", "rel_id", "other"]).aggregate(
        Sum("freq", alias_name="sum_freq"),
        Sum("one", alias_name="n_nodes"),
    ).to_pandas()

    # driver-side A13 math (tiny table)
    tallies["tally"] = tallies["sum_freq"] + tallies["n_nodes"]
    head = {(r, o): t for s, r, o, t in
            zip(tallies["side"], tallies["rel_id"], tallies["other"],
                tallies["tally"]) if s == 0}
    tail = {(r, o): t for s, r, o, t in
            zip(tallies["side"], tallies["rel_id"], tallies["other"],
                tallies["tally"]) if s == 1}
    n_rels = len(rel_list)
    rel_sum = {
        r: (sum(v for (rr, _), v in head.items() if rr == r)
            + sum(v for (rr, _), v in tail.items() if rr == r))
        for r in range(n_rels)
    }

    rows = []
    for a in range(n_rels):
        for b in range(a, n_rels):
            affin = 0.0
            if rel_sum.get(a, 0) and rel_sum.get(b, 0):
                # branch 1 (gor.py:429-436)
                affin += head.get((b, a), 0) / rel_sum[a]
                affin += tail.get((a, b), 0) / rel_sum[b]
                # branch 2 (gor.py:438-445)
                affin += tail.get((b, a), 0) / rel_sum[a]
                affin += head.get((a, b), 0) / rel_sum[b]
            if affin > 0.0:
                rows.append({"rel_a": a, "rel_b": b, "score": affin / 2.0})
    return pd.DataFrame(rows)
