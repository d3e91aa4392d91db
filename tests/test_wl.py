"""Weisfeiler–Lehman refinement (stages/wl.py) vs a brute-force
single-process reference."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest
import ray.data

from textgraphs_ray.stages.wl import wl_class_census, wl_colors


def _brute_wl(edges: list[tuple[int, int]], rounds: int) -> dict[int, str]:
    adj: dict[int, list[int]] = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    color = {n: str(len(ns)) for n, ns in adj.items()}
    for _ in range(rounds):
        color = {
            n: hashlib.md5(
                (color[n] + "|"
                 + ",".join(sorted(color[m] for m in ns))).encode()
            ).hexdigest()
            for n, ns in adj.items()}
    return color


def _edges_ds(edges: list[tuple[int, int]]):
    return ray.data.from_pandas(pd.DataFrame({
        "u": np.array([a for a, _ in edges], np.int64),
        "v": np.array([b for _, b in edges], np.int64)}))


@pytest.mark.parametrize("rounds", [1, 2, 3])
def test_wl_matches_brute_on_random_graph(rounds):
    rng = np.random.default_rng(11)
    edges = sorted({(int(a), int(b)) for a, b in
                    rng.integers(0, 30, (80, 2)) if a < b})
    got = {r["node"]: r["color"]
           for r in wl_colors(_edges_ds(edges), rounds=rounds).take_all()}
    assert got == _brute_wl(edges, rounds)


def test_wl_distinguishes_path_positions():
    # path 0-1-2-3-4: round-1 colors separate endpoints from the
    # middle; round-2 separates position 1/3 from position 2
    edges = [(0, 1), (1, 2), (2, 3), (3, 4)]
    c = {r["node"]: r["color"]
         for r in wl_colors(_edges_ds(edges), rounds=2).take_all()}
    assert c[0] == c[4] and c[1] == c[3]
    assert len({c[0], c[1], c[2]}) == 3


def test_wl_census_counts_class_sizes():
    # two disjoint triangles: all six nodes one class of size 6
    edges = [(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5)]
    census = wl_class_census(
        wl_colors(_edges_ds(edges), rounds=2)).take_all()
    assert [(r["class_size"], r["n_classes"]) for r in census] == [(6, 1)]
