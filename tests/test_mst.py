"""Borůvka MSF (stages/mst.py) vs Kruskal under the (w, u, v) order."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from textgraphs_ray.stages.mst import boruvka_msf


def _edges_ds(rows):
    return rd.from_arrow(pa.table({
        "u": pa.array([r[0] for r in rows], pa.int64()),
        "v": pa.array([r[1] for r in rows], pa.int64()),
        "w": pa.array([r[2] for r in rows], pa.int64())}))


def _kruskal(rows):
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = []
    for w, u, v in sorted((w, u, v) for u, v, w in rows):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            out.append((u, v, w))
    return sorted(out)


def _msf(rows, **kw):
    got = boruvka_msf(_edges_ds(rows), **kw).take_all()
    return sorted((r["u"], r["v"], r["w"]) for r in got)


def test_msf_simple_triangle():
    rows = [(1, 2, 5), (2, 3, 3), (1, 3, 4)]
    assert _msf(rows) == [(1, 3, 4), (2, 3, 3)]


def test_msf_two_components():
    rows = [(1, 2, 1), (2, 3, 2), (1, 3, 9),
            (10, 11, 4), (11, 12, 4), (10, 12, 4)]
    # ties in the second triangle: (w,u,v) order keeps (10,11) and
    # (10,12) — Kruskal picks 4,10,11 then 4,10,12, rejects 4,11,12
    assert _msf(rows) == _kruskal(rows)
    assert (11, 12, 4) not in _msf(rows)


@pytest.mark.parametrize("seed", [3, 14, 40])
def test_msf_matches_kruskal_random(seed):
    rng = np.random.default_rng(seed)
    rows = sorted({(int(a), int(b)) for a, b in
                   rng.integers(0, 25, (90, 2)) if a < b})
    rows = [(u, v, int(rng.integers(1, 12))) for u, v in rows]
    assert _msf(rows, num_partitions=4) == _kruskal(rows)


def test_msf_matches_networkx_weight():
    nx = pytest.importorskip("networkx")
    rng = np.random.default_rng(7)
    rows = sorted({(int(a), int(b)) for a, b in
                   rng.integers(0, 20, (60, 2)) if a < b})
    rows = [(u, v, int(rng.integers(1, 100))) for u, v in rows]
    got = _msf(rows)
    g = nx.Graph()
    for u, v, w in rows:
        g.add_edge(u, v, weight=w)
    want = sum(d["weight"] for _, _, d in
               nx.minimum_spanning_edges(g, data=True))
    assert sum(w for _, _, w in got) == want
    assert len(got) == len(g.nodes) - nx.number_connected_components(g)


def test_msf_empty_input():
    assert boruvka_msf(_edges_ds([])).take_all() == []
