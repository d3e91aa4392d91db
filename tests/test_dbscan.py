"""stages/dbscan.py: grid DBSCAN — brute-force parity on random
integer points, planted dense clusters, and degenerate inputs."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from textgraphs_ray.stages.dbscan import grid_dbscan


def _brute(pts, eps, min_pts):
    """→ {id: (cluster_id, role)} with the same deterministic
    min-label semantics."""
    ids = sorted(pts)
    e2 = eps * eps

    def near(a, b):
        (x1, y1), (x2, y2) = pts[a], pts[b]
        return (x1 - x2) ** 2 + (y1 - y2) ** 2 <= e2

    nbs = {i: [j for j in ids if near(i, j)] for i in ids}
    core = {i for i in ids if len(nbs[i]) >= min_pts}
    # components over core-core eps edges (union-find, min root)
    par = {i: i for i in core}

    def find(a):
        while par[a] != a:
            par[a] = par[par[a]]
            a = par[a]
        return a

    for i in core:
        for j in nbs[i]:
            if j in core and j != i:
                ri, rj = find(i), find(j)
                if ri != rj:
                    par[max(ri, rj)] = min(ri, rj)
    out = {i: (find(i), "core") for i in core}
    for i in ids:
        if i in core:
            continue
        cl = [find(j) for j in nbs[i] if j in core]
        if cl:
            out[i] = (min(cl), "border")
    return out


def _run(pts, eps, min_pts):
    t = pa.table({
        "id": pa.array(sorted(pts), pa.int64()),
        "x": pa.array([pts[i][0] for i in sorted(pts)], pa.int64()),
        "y": pa.array([pts[i][1] for i in sorted(pts)], pa.int64())})
    out = grid_dbscan(rd.from_arrow(t), id_col="id", x_col="x",
                      y_col="y", eps=eps, min_pts=min_pts)
    return {r["id"]: (r["cluster_id"], r["role"])
            for r in out.take_all()}


def test_matches_brute_random(ray_session):
    rng = np.random.RandomState(7)
    pts = {i: (int(rng.randint(0, 25)), int(rng.randint(0, 25)))
           for i in range(250)}
    for eps, mp in ((1, 3), (2, 5)):
        assert _run(pts, eps, mp) == _brute(pts, eps, mp), (eps, mp)


def test_planted_clusters_and_noise(ray_session):
    # two tight 3x3 blocks far apart + isolated noise points
    pts = {}
    k = 0
    for bx in (0, 100):
        for dx in range(3):
            for dy in range(3):
                pts[k] = (bx + dx, dy)
                k += 1
    pts[k] = (50, 50)        # noise
    pts[k + 1] = (60, 60)    # noise
    got = _run(pts, 1, 4)
    want = _brute(pts, 1, 4)
    assert got == want
    assert k not in got and (k + 1) not in got          # noise omitted
    assert len({cl for cl, _ in got.values()}) == 2      # two clusters


def test_negative_coordinates(ray_session):
    # floor-division cells must stay consistent across zero
    pts = {0: (-1, -1), 1: (-1, 0), 2: (0, -1), 3: (0, 0), 4: (1, 0),
           5: (9, 9)}
    assert _run(pts, 1, 3) == _brute(pts, 1, 3)


def test_empty_input_typed(ray_session):
    t = pa.table({"id": pa.array([], pa.int64()),
                  "x": pa.array([], pa.int64()),
                  "y": pa.array([], pa.int64())})
    out = grid_dbscan(rd.from_arrow(t), id_col="id", x_col="x",
                      y_col="y")
    assert out.count() == 0
    assert sorted(out.schema().names) == ["cluster_id", "id", "role"]
